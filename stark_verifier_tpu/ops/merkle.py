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


# ---------------------------------------------------------------------------
# Shared-path walks: dedup the converging upper-tree levels
# ---------------------------------------------------------------------------
#
# The reference verifies every branch independently all the way to the root
# (merkle_tree.rs:25-44), so with n branches the top levels of the tree are
# re-hashed up to n times: at the level with 2^j nodes there are at most
# min(n, 2^j) DISTINCT nodes, yet the lockstep walk above pays n compressions
# per level.  For proof.bin's groups (n = 40..160 over trees of 64..65536
# leaves) the structural bound alone removes ~45% of all Blake2s compressions.
#
# verify_groups_shared() walks each group bottom-up at full width only while
# the level can still hold n distinct nodes, then switches to a compacted
# "slot" representation -- one lane per distinct node -- whose width halves
# every level.  Accept/reject equivalence with the independent walks is kept
# by explicit equality checks wherever a branch's own data stops being used:
#
#   * two branches that reached the same node by the switchover must agree on
#     the running hash (state-equality check at tail entry);
#   * a branch that shares a node with an earlier branch must supply the same
#     witness at every remaining level (per-level witness-equality checks);
#   * when two slots merge as siblings, each side's claimed witness must equal
#     the other side's computed state (cross-checks) -- then the single
#     H(left || right) equals both branches' next hashes.
#
# If every check passes, each branch's independent walk would compute exactly
# the slot states, so "final slot == root" decides all of them at once; any
# failed check rejects, exactly where the independent walk could only have
# reached the root through a Blake2s collision.  The walk requires a
# RECTANGULAR group (every branch at the group's full static depth) -- ragged
# groups (deserializer.rs:104-119) take the masked lockstep path above; the
# in-graph depth guard makes a misrouted ragged proof reject, never
# misverify.  Slot tails of all groups are stacked per tree level into one
# compression call, so the whole verifier adds only max-depth extra Blake2s
# instantiations.

_SENT = np.uint32(0xFFFFFFFF)


def _flog2(n: int) -> int:
    return n.bit_length() - 1


def _seg_heads(keys: jnp.ndarray) -> jnp.ndarray:
    """Per-lane flag: first lane of a run of equal (sorted) keys."""
    first = jnp.ones(keys.shape[:-1] + (1,), bool)
    return jnp.concatenate([first, keys[..., 1:] != keys[..., :-1]], axis=-1)


def _seg_rep(heads: jnp.ndarray) -> jnp.ndarray:
    """Position of each lane's segment head (running max of head positions)."""
    n = heads.shape[-1]
    pos = jnp.where(heads, jnp.arange(n, dtype=jnp.int32), jnp.int32(0))
    return lax.associative_scan(jnp.maximum, pos, axis=pos.ndim - 1)


def _rows(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows: a [..., n, k] by idx [..., m] -> [..., m, k]."""
    return jnp.take_along_axis(a, idx[..., None].astype(jnp.int32), axis=-2)


def _eq8(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def _shared_bottom(group: dict) -> dict:
    """Leaf hash + full-width lower levels + switchover to slot form."""
    indices = group["indices"]
    witness = group["witness"]                  # [..., n, w, 8]
    w = witness.shape[-2]
    n = indices.shape[-1]
    # uniform-depth guard: a ragged group routed here rejects (never accepts)
    ok = jnp.all(jnp.asarray(group["depth"], jnp.uint32) == jnp.uint32(w),
                 axis=-1)

    ld4 = jnp.uint32(1 << (w - 1))
    idx = (indices // ld4) + 4 * (indices % ld4)
    ti0 = jnp.uint32(1 << (w + 2)) + idx

    # one sort by start index orders every level: >> preserves uint order
    perm = jnp.argsort(ti0, axis=-1)
    ti = jnp.take_along_axis(ti0, perm, axis=-1)
    val = _rows(group["value"], perm)
    sib = _rows(group["sibling"], perm)
    wit = jnp.take_along_axis(
        witness, perm[..., None, None].astype(jnp.int32), axis=-3)

    odd = (ti & 1).astype(bool)[..., None]
    res = blake2s.hash_leaf_pair(jnp.where(odd, sib, val),
                                 jnp.where(odd, val, sib))
    ti = ti >> 1

    t0 = max(1, w - _flog2(max(1, n - 1)))      # first compacted level
    if t0 > 1:
        wit_b = jnp.moveaxis(wit[..., :t0 - 1, :], -2, 0)

        def step(carry, w_t):
            res, ti = carry
            odd = (ti & 1).astype(bool)[..., None]
            res = blake2s.hash_pair(jnp.where(odd, w_t, res),
                                    jnp.where(odd, res, w_t))
            return (res, ti >> 1), None

        (res, ti), _ = lax.scan(step, (res, ti), wit_b)

    # switchover: branches sharing a node must agree on the running hash
    heads = _seg_heads(ti)
    rep = _seg_rep(heads)
    ok = jnp.logical_and(
        ok, jnp.all(heads | _eq8(res, _rows(res, rep)), axis=-1))

    # compact segment heads to a prefix (slot form, width n)
    pos = jnp.where(heads, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    src = jnp.sort(pos, axis=-1)
    nheads = jnp.sum(heads, axis=-1).astype(jnp.int32)
    valid = jnp.arange(n, dtype=jnp.int32) < nheads[..., None]
    src = jnp.minimum(src, n - 1)
    return {
        "n": n, "w": w, "t0": t0, "tail_len": w - t0 + 1, "ok": ok,
        "root": group["root"], "wit": wit, "bk": ti,
        "keys": jnp.where(valid, jnp.take_along_axis(ti, src, axis=-1), _SENT),
        "state": _rows(res, src),
        "rep": src,
    }


def _tail_inputs(st: dict, j: int):
    """Build this level's (left, right) hash inputs for one group.

    j = levels remaining after this one; output width = min(n, 2^j)."""
    t = st["w"] - j                              # witness level consumed
    w_out = min(st["n"], 1 << j)
    k, s, rep = st["keys"], st["state"], st["rep"]
    w_in = k.shape[-1]
    wt = st["wit"][..., t - 1, :]                # [..., n, 8] (branch space)

    # branch-level: every non-head branch must supply its head's witness
    bheads = _seg_heads(st["bk"])
    st["ok"] = jnp.logical_and(
        st["ok"],
        jnp.all(bheads | _eq8(wt, _rows(wt, _seg_rep(bheads))), axis=-1))
    st["bk"] = st["bk"] >> 1

    # slot-level: group input slots by parent node, compact to the out width
    valid = k != _SENT
    nk = jnp.where(valid, k >> 1, _SENT)
    oh = jnp.logical_and(_seg_heads(nk), valid)
    pos = jnp.where(oh, jnp.arange(w_in, dtype=jnp.int32), jnp.int32(w_in))
    src = jnp.minimum(jnp.sort(pos, axis=-1)[..., :w_out], w_in - 1)
    nheads = jnp.sum(oh, axis=-1).astype(jnp.int32)
    out_valid = jnp.arange(w_out, dtype=jnp.int32) < nheads[..., None]

    src2 = jnp.minimum(src + 1, w_in - 1)
    kl = jnp.take_along_axis(k, src, axis=-1)
    kn = jnp.take_along_axis(k, src2, axis=-1)
    sl, sr = _rows(s, src), _rows(s, src2)
    repl, repn = (jnp.take_along_axis(rep, src, axis=-1),
                  jnp.take_along_axis(rep, src2, axis=-1))
    # kn != kl guards the clamped gather at the last lane (src2 == src)
    paired = jnp.logical_and(out_valid,
                             jnp.logical_and((kn >> 1) == (kl >> 1), kn != kl))
    wl, wr = _rows(wt, repl), _rows(wt, repn)

    # sibling merge: both sides' claimed witnesses must equal the other's
    # computed state -- then one H(left || right) serves both walks
    cross = jnp.logical_and(_eq8(wl, sr), _eq8(wr, sl))
    st["ok"] = jnp.logical_and(st["ok"],
                               jnp.all((~paired) | cross, axis=-1))

    oddl = ((kl & 1) == 1)[..., None]
    pairedl = paired[..., None]
    a = jnp.where(pairedl | ~oddl, sl, wl)
    b = jnp.where(pairedl, sr, jnp.where(oddl, sl, wl))
    pend = {"keys": jnp.where(out_valid, kl >> 1, _SENT), "rep": repl}
    return a, b, pend


def verify_groups_shared(groups: list) -> list:
    """Verify rectangular branch groups with shared-path walks.

    groups: dicts with root [..., 8], indices [..., n], value/sibling
    [..., n, vw], witness [..., n, w, 8] (w = the group's uniform depth),
    depth [..., n].  Returns one [...] bool verdict per group (the AND over
    its branches).  All groups' compacted tails stack into one Blake2s call
    per tree level.
    """
    sts = [_shared_bottom(g) for g in groups]
    for j in range(max(st["tail_len"] for st in sts) - 1, -1, -1):
        parts = [st for st in sts if st["tail_len"] > j]
        ins = [_tail_inputs(st, j) for st in parts]
        h = blake2s.hash_pair(
            jnp.concatenate([a for a, _, _ in ins], axis=-2),
            jnp.concatenate([b for _, b, _ in ins], axis=-2))
        off = 0
        for st, (a, _, pend) in zip(parts, ins):
            w_out = a.shape[-2]
            st["keys"], st["rep"] = pend["keys"], pend["rep"]
            st["state"] = h[..., off:off + w_out, :]
            off += w_out
    return [jnp.logical_and(st["ok"], _eq8(st["state"][..., 0, :], st["root"]))
            for st in sts]


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
