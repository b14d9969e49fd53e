"""Batched Merkle multiproof verification on device.

TPU-native equivalent of the reference's sequential branch walker
(reference: /root/reference/src/merkle_tree.rs:25-44,101-172): all branches of
a group verify in lockstep -- one batched Blake2s compression per tree level
via lax.scan -- instead of one hash at a time.

Bit-exactness quirks replicated (SURVEY.md section 2.2.1):
  * leaf shuffle: with w witnesses, ld4 = 2^(w+1)/4 and the permuted index is
    (x / ld4) + 4*(x mod ld4)                        (merkle_tree.rs:112-116)
  * the start tree index is 2^(w+2) + permuted (NOT the textbook 2^(w+1)), so
    the value/sibling pairing order uses the *index* parity
                                                     (merkle_tree.rs:120-141)
  * each witness level pairs by the halved tree index's parity
                                                     (merkle_tree.rs:145-163)

The witness depth may be a static int or a traced uint32 scalar/array: witness
arrays are padded to their last-axis size and steps beyond `depth` are masked
out (needed so all FRI levels -- depths 15 down to 5 -- share one scanned
level body).  Instead of asserting on mismatch (merkle_tree.rs:165), returns
a per-branch boolean verdict so batched verification can reject without
aborting.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import blake2s


def verify_branches(root_words: jnp.ndarray,
                    indices: jnp.ndarray,
                    value_words: jnp.ndarray,
                    sibling_words: jnp.ndarray,
                    witness_words: jnp.ndarray,
                    depth,
                    vsizes=None,
                    vsize_classes=None):
    """Verify a group of Merkle branches against a root.

    root_words:    [..., 8] uint32 (broadcast over the branch axis) -- the
                   expected root, or [..., n, 8] for per-branch roots.
    indices:       [..., n] uint32 leaf indices (pre-permutation).
    value_words:   [..., n, vw] uint32 (vw = 8 for 32-byte leaves, 24 for the
                   96-byte main-trace leaves; ragged groups zero-padded).
    sibling_words: [..., n, vw] uint32.
    witness_words: [..., n, max_depth, 8] uint32 (zero-padded past `depth`).
    depth:         actual witness count -- python int, or a traced uint32
                   scalar/array broadcastable against the branch axis (the
                   reference walks per-branch depth, merkle_tree.rs:119-163).
    vsizes:        optional [..., n] per-branch value BYTES for ragged value
                   sizes (deserializer.rs:104-119); requires vsize_classes,
                   the static tuple of distinct sizes.  The leaf hash is
                   computed per class and selected per lane.

    Returns (ok [..., n] bool, value_words passthrough) -- mirroring
    MultiProof::verify returning the leaf values (merkle_tree.rs:25-44).
    """
    max_depth = witness_words.shape[-2]
    d = jnp.asarray(depth, dtype=jnp.uint32)
    if d.ndim and d.ndim < indices.ndim:
        # batched group-level depth [..] -> broadcast over the branch axis
        d = d[..., None]

    ld4 = (jnp.uint32(1) << (d - 1))            # 2^(w+1) / 4
    idx = (indices // ld4) + 4 * (indices % ld4)
    tree_index = (jnp.uint32(1) << (d + 2)) + idx

    odd = (tree_index & 1).astype(bool)[..., None]
    first_a = jnp.where(odd, sibling_words, value_words)
    first_b = jnp.where(odd, value_words, sibling_words)
    if vsizes is None:
        res = blake2s.hash_leaf_pair(first_a, first_b)  # [..., n, 8]
    else:
        res = None
        for cls in vsize_classes:                       # static byte sizes
            h = blake2s.hash_leaf_pair(first_a[..., :cls // 4],
                                       first_b[..., :cls // 4])
            sel = (jnp.asarray(vsizes) == jnp.uint32(cls))[..., None]
            res = h if res is None else jnp.where(sel, h, res)
    tree_index = tree_index >> 1

    if max_depth > 0:
        # scan over tree levels: witnesses to leading axis [max_depth, ..., n, 8]
        wit = jnp.moveaxis(witness_words, -2, 0)
        steps = jnp.arange(max_depth, dtype=jnp.uint32)

        def step(carry, xs):
            res, ti = carry
            w_t, t = xs
            odd = (ti & 1).astype(bool)[..., None]
            a = jnp.where(odd, w_t, res)
            b = jnp.where(odd, res, w_t)
            nres = blake2s.hash_pair(a, b)
            active = (t < d)
            res = jnp.where(jnp.broadcast_to(active, res.shape[:-1])[..., None],
                            nres, res)
            ti = jnp.where(active, ti >> 1, ti)
            return (res, ti), None

        (res, _), _ = lax.scan(step, (res, tree_index), (wit, steps))

    if root_words.ndim < res.ndim:
        root_words = root_words[..., None, :]
    ok = jnp.all(res == root_words, axis=-1)
    return ok, value_words


verify_branches_jit = jax.jit(verify_branches, static_argnames=("depth",))


def merkle_root_permuted(leaves: jnp.ndarray) -> jnp.ndarray:
    """Root of the full tree the prover builds over a committed value list.

    leaves: [..., n, 8] uint32 word leaves (n a power of 4-compatible size).
    The prover lays leaves out in the permute-4 shuffled order that
    ProofBranch::verify walks back (reference: src/merkle_tree.rs:112-116):
    query index x lives at tree position (x / (n/4)) + 4*(x mod (n/4)).
    Parents are Blake2s(left || right) all the way up.

    Used by strict mode to bind the FRI POINTS element to the last committed
    root -- the check the reference parses for but never performs
    (deserializer.rs:47-59, main.rs:94; SURVEY.md 2.2.10).
    """
    n = leaves.shape[-2]
    ld4 = n // 4
    x = np.arange(n)
    pos = (x // ld4) + 4 * (x % ld4)
    inv = np.zeros(n, dtype=np.int64)
    inv[pos] = x                    # tree position -> query index
    nodes = jnp.take(leaves, jnp.asarray(inv), axis=-2)
    while nodes.shape[-2] > 1:
        k = nodes.shape[-2]
        left = nodes[..., 0:k:2, :]
        right = nodes[..., 1:k:2, :]
        nodes = blake2s.hash_pair(left, right)
    return nodes[..., 0, :]
