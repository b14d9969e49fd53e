"""Batched Blake2s on device: uint32 vector lanes, one compression per block.

TPU-native replacement for the reference's `blake2` crate usage
(reference: /root/reference/src/merkle_tree.rs:127-163, src/main.rs:131-146,
src/utils.rs:54-78).  Every hash in the protocol is unkeyed, 32-byte-digest
Blake2s over one of four fixed input sizes:

  * 32 bytes  -- Fiat-Shamir chain links (utils.rs:70)
  * 33 bytes  -- k1..k4 coefficient derivation (main.rs:133-144)
  * 64 bytes  -- Merkle node hashes (merkle_tree.rs:131-160)
  * 192 bytes -- main-trace leaf hashes (96-byte P||D||B values, main.rs:171)

All are implemented over [..., W] uint32 little-endian word arrays so thousands
of messages hash in lockstep on the VPU; message sizes are static so padding
and finalization flags fold into the compiled graph.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
], dtype=np.uint32)

# Parameter block word 0 for digest_length=32, key=0, fanout=1, depth=1
_PARAM0 = np.uint32(0x01010020)
H0 = IV.copy()
H0[0] ^= _PARAM0

SIGMA = np.array([
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
], dtype=np.int32)


def _rotr(x, r: int):
    return (x >> r) | (x << (32 - r))


def compress(h, m, t: int, last: bool):
    """One Blake2s compression.

    h: list of 8 [...] uint32 arrays (chaining value)
    m: list of 16 [...] uint32 arrays (message words, LE)
    t: static byte counter after this block; last: static final-block flag.
    Returns new h as a list of 8 arrays.
    """
    v = list(h) + [jnp.uint32(IV[i]) + jnp.zeros_like(h[0]) for i in range(8)]
    v[12] = v[12] ^ jnp.uint32(t & 0xFFFFFFFF)
    if t >> 32:
        v[13] = v[13] ^ jnp.uint32(t >> 32)
    if last:
        v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)

    def G(a, b, c, d, x, y):
        v[a] = v[a] + v[b] + x
        v[d] = _rotr(v[d] ^ v[a], 16)
        v[c] = v[c] + v[d]
        v[b] = _rotr(v[b] ^ v[c], 12)
        v[a] = v[a] + v[b] + y
        v[d] = _rotr(v[d] ^ v[a], 8)
        v[c] = v[c] + v[d]
        v[b] = _rotr(v[b] ^ v[c], 7)

    for r in range(10):
        s = SIGMA[r]
        G(0, 4, 8, 12, m[s[0]], m[s[1]])
        G(1, 5, 9, 13, m[s[2]], m[s[3]])
        G(2, 6, 10, 14, m[s[4]], m[s[5]])
        G(3, 7, 11, 15, m[s[6]], m[s[7]])
        G(0, 5, 10, 15, m[s[8]], m[s[9]])
        G(1, 6, 11, 12, m[s[10]], m[s[11]])
        G(2, 7, 8, 13, m[s[12]], m[s[13]])
        G(3, 4, 9, 14, m[s[14]], m[s[15]])

    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


def hash_words(words: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """Blake2s-256 digest of a message given as [..., W] uint32 LE words.

    nbytes is the true (static) message length; words beyond it must be
    zero-padded by the caller (W = ceil(nbytes/4) or more).  Returns [..., 8].
    """
    W = words.shape[-1]
    assert W * 4 >= nbytes
    nblocks = max(1, -(-nbytes // 64))
    h = [jnp.uint32(H0[i]) + jnp.zeros(words.shape[:-1], jnp.uint32)
         for i in range(8)]
    for blk in range(nblocks):
        m = []
        for w in range(16):
            gidx = blk * 16 + w
            if gidx < W:
                m.append(words[..., gidx])
            else:
                m.append(jnp.zeros(words.shape[:-1], jnp.uint32))
        last = blk == nblocks - 1
        t = nbytes if last else (blk + 1) * 64
        h = compress(h, m, t, last)
    return jnp.stack(h, axis=-1)


def hash_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """H(a || b) for two [..., 8]-word (32-byte) inputs -> [..., 8].
    The Merkle node hash (reference: src/merkle_tree.rs:131-141)."""
    return hash_words(jnp.concatenate([a, b], axis=-1), 64)


def hash_leaf_pair(value: jnp.ndarray, sibling: jnp.ndarray) -> jnp.ndarray:
    """H(value || sibling) for equal-width word inputs of any static size."""
    vw = value.shape[-1]
    return hash_words(jnp.concatenate([value, sibling], axis=-1), 8 * vw)


def hash_chain(h32: jnp.ndarray) -> jnp.ndarray:
    """H(x) of a 32-byte input -- the Fiat-Shamir PRG link
    (reference: src/utils.rs:70)."""
    return hash_words(h32, 32)


def hash_root_byte(root: jnp.ndarray, byte_val: int) -> jnp.ndarray:
    """H(root || [b]) of 33 bytes -- k-coefficient derivation
    (reference: src/main.rs:131-146)."""
    tail = jnp.full(root.shape[:-1] + (1,), np.uint32(byte_val), jnp.uint32)
    return hash_words(jnp.concatenate([root, tail], axis=-1), 33)
