"""Batched Blake2s on device: uint32 vector lanes, one compression per block.

TPU-native replacement for the reference's `blake2` crate usage
(reference: /root/reference/src/merkle_tree.rs:127-163, src/main.rs:131-146,
src/utils.rs:54-78).  Every hash in the protocol is unkeyed, 32-byte-digest
Blake2s over one of four fixed input sizes:

  * 32 bytes  -- Fiat-Shamir chain links (utils.rs:70)
  * 33 bytes  -- k1..k4 coefficient derivation (main.rs:133-144)
  * 64 bytes  -- Merkle node hashes (merkle_tree.rs:131-160)
  * 192 bytes -- main-trace leaf hashes (96-byte P||D||B values, main.rs:171)

Implementation notes (TPU-first):
  * the working state is a [..., 4, 4] uint32 matrix; the column and diagonal
    half-rounds are G-functions applied to whole rows (the classic 4-lane
    SIMD formulation), so one round is ~30 vector ops instead of 8 scalar
    G-functions;
  * the 10 rounds run under lax.scan with the sigma-permuted message schedule
    pre-gathered into [10, ..., 4] arrays -- the compiled graph stays ~50 ops
    per compression, which keeps whole-verifier graphs (hundreds of
    compressions) cheap to compile;
  * message sizes are static, so padding and finalization flags fold into the
    graph; thousands of messages hash in lockstep on the VPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

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

# Unroll the 10 rounds into the graph (better fusion) vs scan them (smaller
# graph).  Unrolled wins on TPU; scan kept for compile-time-sensitive debug.
UNROLL_ROUNDS = True

# Scalar-word decomposition: carry the 16 state words as 16 SEPARATE [...]
# arrays (all axes batch axes -- full 128-lane registers, no minor `4` axis
# to pad) and make the diagonalization pure operand renaming (zero rolls).
# ~7x more HLO instructions, which explodes CPU XLA compile times, so it is
# enabled only where measured to win; see _use_scalar_words().
import os as _os


def _use_scalar_words() -> bool:
    v = _os.environ.get("STARK_HASH_SCALAR")
    if v is not None:
        return v == "1"
    import jax as _jax
    return _jax.default_backend() == "tpu"


# Per-round message-schedule gather indices for the 4-lane formulation:
# column step x/y words, then diagonal step x/y words, each [10, 4].
_CX = SIGMA[:, 0:8:2]
_CY = SIGMA[:, 1:8:2]
_DX = SIGMA[:, 8:16:2]
_DY = SIGMA[:, 9:16:2]

# Diagonal-step state indices (a, b, c, d) per column k, scalar-word form
_DIAG = ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))


def _rotr(x, r: int):
    return (x >> r) | (x << (32 - r))


def _g(a, b, c, d, x, y):
    a = a + b + x
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + y
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


def _compress_scalar(h: jnp.ndarray, m: jnp.ndarray, t: int, last: bool) -> jnp.ndarray:
    """Scalar-word compression: every state word is its own [...] array."""
    lead = jnp.broadcast_shapes(h.shape[:-1], m.shape[:-1])
    h = jnp.broadcast_to(h, lead + (8,))
    m = jnp.broadcast_to(m, lead + (16,))
    mw = [m[..., i] for i in range(16)]
    consts = [int(IV[0]), int(IV[1]), int(IV[2]), int(IV[3]),
              int(IV[4]) ^ (t & 0xFFFFFFFF), int(IV[5]) ^ (t >> 32),
              int(IV[6]) ^ (0xFFFFFFFF if last else 0), int(IV[7])]
    v = ([h[..., i] for i in range(8)]
         + [jnp.broadcast_to(jnp.uint32(cv), lead) for cv in consts])

    for r in range(10):
        s = [mw[j] for j in SIGMA[r]]
        for k in range(4):
            v[k], v[4 + k], v[8 + k], v[12 + k] = _g(
                v[k], v[4 + k], v[8 + k], v[12 + k], s[2 * k], s[2 * k + 1])
        for k, (ia, ib, ic, id_) in enumerate(_DIAG):
            v[ia], v[ib], v[ic], v[id_] = _g(
                v[ia], v[ib], v[ic], v[id_], s[8 + 2 * k], s[9 + 2 * k])

    return jnp.stack([h[..., i] ^ v[i] ^ v[8 + i] for i in range(8)], axis=-1)


def compress(h: jnp.ndarray, m: jnp.ndarray, t: int, last: bool) -> jnp.ndarray:
    """One Blake2s compression: h [..., 8], m [..., 16] -> new h [..., 8].

    t: static byte counter after this block; last: static final-block flag.
    """
    if _use_scalar_words():
        return _compress_scalar(h, m, t, last)
    lead = m.shape[:-1]
    h = jnp.broadcast_to(h, lead + (8,))
    a = h[..., 0:4]
    b = h[..., 4:8]
    c = jnp.broadcast_to(jnp.asarray(IV[0:4]), lead + (4,))
    dvec = IV[4:8].copy()
    dvec[0] ^= np.uint32(t & 0xFFFFFFFF)
    dvec[1] ^= np.uint32(t >> 32)
    if last:
        dvec[2] ^= np.uint32(0xFFFFFFFF)
    d = jnp.broadcast_to(jnp.asarray(dvec), lead + (4,))

    def one_round(a, b, c, d, r):
        cx = m[..., _CX[r]]
        cy = m[..., _CY[r]]
        dx = m[..., _DX[r]]
        dy = m[..., _DY[r]]
        a, b, c, d = _g(a, b, c, d, cx, cy)
        # diagonalize: rotate rows so diagonals align as columns
        b = jnp.roll(b, -1, axis=-1)
        c = jnp.roll(c, -2, axis=-1)
        d = jnp.roll(d, -3, axis=-1)
        a, b, c, d = _g(a, b, c, d, dx, dy)
        b = jnp.roll(b, 1, axis=-1)
        c = jnp.roll(c, 2, axis=-1)
        d = jnp.roll(d, 3, axis=-1)
        return a, b, c, d

    if UNROLL_ROUNDS:
        # unrolled: XLA fuses across all 10 rounds (one kernel per
        # compression instead of 10 scan-step launches)
        for r in range(10):
            a, b, c, d = one_round(a, b, c, d, r)
    else:
        def sched(idx):
            g = jnp.take(m, jnp.asarray(idx), axis=-1)   # [..., 10, 4]
            return jnp.moveaxis(g, -2, 0)                # [10, ..., 4]

        xs = (sched(_CX), sched(_CY), sched(_DX), sched(_DY))

        def round_(carry, ms):
            a, b, c, d = carry
            cx, cy, dx, dy = ms
            a, b, c, d = _g(a, b, c, d, cx, cy)
            b = jnp.roll(b, -1, axis=-1)
            c = jnp.roll(c, -2, axis=-1)
            d = jnp.roll(d, -3, axis=-1)
            a, b, c, d = _g(a, b, c, d, dx, dy)
            b = jnp.roll(b, 1, axis=-1)
            c = jnp.roll(c, 2, axis=-1)
            d = jnp.roll(d, 3, axis=-1)
            return (a, b, c, d), None

        (a, b, c, d), _ = lax.scan(round_, (a, b, c, d), xs)

    lo = jnp.concatenate([a, b], axis=-1)     # v0..v7
    hi = jnp.concatenate([c, d], axis=-1)     # v8..v15
    return h ^ lo ^ hi


def hash_words(words: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """Blake2s-256 digest of a message given as [..., W] uint32 LE words.

    nbytes is the true (static) message length; words beyond it must be
    zero-padded by the caller (W >= ceil(nbytes/4)).  Returns [..., 8].
    """
    W = words.shape[-1]
    if W * 4 < nbytes:
        raise ValueError(f"hash_words: {W} words cannot hold {nbytes} bytes")
    nblocks = max(1, -(-nbytes // 64))
    lead = words.shape[:-1]
    h = jnp.broadcast_to(jnp.asarray(H0), lead + (8,))
    for blk in range(nblocks):
        lo = blk * 16
        hi = min(lo + 16, W)
        m = words[..., lo:hi]
        if hi - lo < 16:
            m = jnp.concatenate(
                [m, jnp.zeros(lead + (16 - (hi - lo),), jnp.uint32)], axis=-1)
        is_last = blk == nblocks - 1
        t = nbytes if is_last else (blk + 1) * 64
        h = compress(h, m, t, is_last)
    return h


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
