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

import os as _os

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
# the level can still hold n distinct nodes, then switches to a DENSE node
# representation: the start indices 2^(w+2)+i occupy one aligned power-of-two
# interval, so after t halvings the live keys span exactly
# [2^(w+2-t), 2^(w+2-t) + 2^(w+1-t)) -- a node's slot is (key - base), pure
# arithmetic, and the children of dense slot o are slots 2o and 2o+1 of the
# level below.  No sorting, compaction, scatter, or gather anywhere: TPU
# sorts cost more than all the hashing they save (measured 4.6x end-to-end
# in the first cut), and even data-dependent row gathers for a per-slot
# winner election cost ~4x the saved compressions (270 ms vs the 75 ms
# independent walk at batch 1024).  Every data-dependent placement is
# instead a masked broadcast-compare-reduce -- dense per-slot values are
# masked MINs over branches, and "all branches at a slot agree" is
# min == max per word -- which XLA fuses into streaming reductions.
# Accept/reject equivalence with the independent walks is kept by explicit
# equality checks wherever a branch's own data stops being used:
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

def _flog2(n: int) -> int:
    return n.bit_length() - 1


def _pallas_walk_mode() -> str:
    """Fused Pallas whole-walk kernels for the shared-bottom full-width
    levels (ops/merkle_pallas.walk_leaf_levels / chain_levels): measured
    1.45x faster in-graph than the XLA lockstep scan at the main-walk shapes
    (tools/microbench_walk.py; docs/PERF.md round-4).

    STARK_PALLAS_WALK: "1" = Mosaic kernels (TPU), "interpret" = interpreter
    mode (CPU equivalence tests), anything else = XLA scan path."""
    return _os.environ.get("STARK_PALLAS_WALK", "0")


def _tail_cap() -> int:
    """Dedup the top (_tail_cap() + 1) tree levels; see the t0 comment in
    _shared_bottom for the cost model (STARK_SHARED_TAIL overrides for
    re-sweeps on new hardware).  The optimum is conditional on the walk
    mode: with the Pallas whole-walk kernels the full-width levels are
    cheap, so shallower dense tails win (tail 2: 26,254 proofs/s vs tail
    4: 22,886 at batch 8192, docs/PERF.md round 4); on the XLA scan path
    the round-2/3 sweeps measured tail 4 as optimal -- the library default
    without the kernels must not regress (round-4 advisor item 4)."""
    env = _os.environ.get("STARK_SHARED_TAIL")
    if env is not None:
        return int(env)
    return 2 if _pallas_walk_mode() in ("1", "interpret") else 4


def _rows(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows: a [..., n, k] by idx [..., m] -> [..., m, k]."""
    return jnp.take_along_axis(a, idx[..., None].astype(jnp.int32), axis=-2)


def _eq8(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def _dense_agree_minmax(vals: jnp.ndarray, o: jnp.ndarray, width: int):
    """Masked min/max agreement (VPU broadcast-compare-reduce form).

    vals [..., n, 8], o [..., n] slot of each branch (in [0, width)).
    Returns (dense [..., width, 8] = masked min over the branches at each
    slot, occupied [..., width], agree [...] = every occupied slot's
    branches are word-identical, i.e. masked min == masked max).  Pure
    broadcast-compare-reduce: no scatter/gather (see module comment).
    """
    slots = jnp.arange(width, dtype=jnp.int32)
    m = (o[..., None] == slots)[..., None]          # [..., n, width, 1]
    v = vals[..., None, :]                          # [..., n, 1, 8]
    lo = jnp.min(jnp.where(m, v, jnp.uint32(0xFFFFFFFF)), axis=-3)
    hi = jnp.max(jnp.where(m, v, jnp.uint32(0)), axis=-3)
    occupied = jnp.any(m[..., 0], axis=-2)          # [..., width]
    agree = jnp.all(jnp.logical_or(~occupied, _eq8(lo, hi)), axis=-1)
    return lo, occupied, agree


def _dense_agree_mxu(vals: jnp.ndarray, o: jnp.ndarray, width: int):
    """MXU agreement: one-hot slot-membership matmuls on 4-bit nibbles.

    Same contract as _dense_agree_minmax, but the per-slot reductions run as
    matmuls on the systolic array instead of VPU min/max sweeps, so the
    machinery cost stops scaling with n*width elementwise ops -- which is
    what caps the shared-tail depth (docs/PERF.md "next levers").

    Exactness argument (everything below is integer-exact):
      * digests split into 4-bit nibbles v <= 15 and squares v^2 <= 225 --
        both exact in bf16 (8-bit significand), so a DEFAULT-precision MXU
        pass computes the dots exactly; f32 accumulation is exact since
        every sum is < 2^24 (count <= n, S <= 15n, Q <= 225n, n <= a few
        hundred branches);
      * "all branches at a slot carry the same value" per nibble chunk is
        the Cauchy-Schwarz equality condition  count * sum(v^2) == sum(v)^2
        (products <= 225 n^2 < 2^24 for n <= 272, still exact f32);
      * the dense representative is S / count: when agreement holds the true
        quotient is the common integer nibble, and f32 division of exact
        integers is correctly rounded, hence exact.  When a slot disagrees
        the representative is garbage, but `agree` is already False and the
        group verdict rejects regardless of what gets hashed above it.
    """
    n = vals.shape[-2]
    if n > 272:    # 225*n^2 < 2^24 needed for exact f32 products
        raise ValueError(
            f"_dense_agree_mxu: group width {n} > 272 breaks the exact-f32 "
            "Cauchy-Schwarz argument; use _dense_agree_minmax")
    slots = jnp.arange(width, dtype=jnp.int32)
    m = (o[..., None] == slots).astype(jnp.float32)     # [..., n, width]
    # [..., n, 32] nibbles: word w bits [4c, 4c+4) -> chunk 8c + ... keep a
    # fixed (word-major, nibble-minor) order; only consistency matters.
    nib = jnp.stack([(vals >> (4 * c)) & jnp.uint32(0xF) for c in range(8)],
                    axis=-1)                            # [..., n, 8, 8]
    nib = nib.reshape(nib.shape[:-2] + (64,)).astype(jnp.float32)

    def dotT(x):    # [..., n, k] -> [..., width, k], contracting n
        return jax.lax.dot_general(
            m, x, (((m.ndim - 2,), (x.ndim - 2,)),
                   (tuple(range(m.ndim - 2)), tuple(range(x.ndim - 2)))),
            preferred_element_type=jnp.float32)

    sq = dotT(jnp.concatenate([nib, nib * nib], axis=-1))  # [..., width, 128]
    s, q = sq[..., :64], sq[..., 64:]
    count = jnp.sum(m, axis=-2)                         # [..., width]
    occupied = count > 0
    agree = jnp.all(count[..., None] * q == s * s, axis=(-1, -2))
    rep = s / jnp.maximum(count, 1.0)[..., None]        # exact nibble when ok
    rep = rep.astype(jnp.uint32).reshape(rep.shape[:-1] + (8, 8))
    shifts = jnp.asarray([jnp.uint32(4 * c) for c in range(8)], jnp.uint32)
    dense = jnp.sum(rep << shifts, axis=-1, dtype=jnp.uint32)  # [..., width, 8]
    return dense, occupied, agree


_AGREE_MXU = _os.environ.get("STARK_AGREE_MXU")


def _dense_agree(vals, o, width):
    use_mxu = _AGREE_MXU
    if use_mxu is None:
        use_mxu = "1" if jax.default_backend() == "tpu" else "0"
    elif use_mxu == "1" and vals.shape[-2] > 272:
        # explicitly forced MXU must not silently run a different path --
        # parity sweeps need to know which formulation actually executed
        raise ValueError(
            f"STARK_AGREE_MXU=1 forced, but group width {vals.shape[-2]} > "
            "272 breaks the exact-f32 Cauchy-Schwarz bound "
            "(_dense_agree_mxu); unset the env var to auto-fall-back")
    if use_mxu == "1" and vals.shape[-2] <= 272:
        return _dense_agree_mxu(vals, o, width)
    return _dense_agree_minmax(vals, o, width)


def _shared_bottom(group: dict) -> dict:
    """Leaf hash + full-width lower levels + switchover to dense node form."""
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

    val, sib = group["value"], group["sibling"]
    walk_mode = _pallas_walk_mode()
    pallas_walk = walk_mode in ("1", "interpret")
    interp = walk_mode == "interpret"
    if pallas_walk and not group.get("quad"):
        # fused leaf + full-width levels in one Pallas kernel (digests stay
        # in vector registers between levels); the dense-tail dedup below is
        # unchanged.  t0 must be computed first -- duplicate the formula.
        t0_p = max(1, w - min(_flog2(max(1, n - 1)), _tail_cap()))
        from . import merkle_pallas
        res = merkle_pallas.walk_leaf_levels(
            val, sib, witness, ti0, levels=t0_p - 1, interpret=interp)
        ti = ti0 >> jnp.uint32(t0_p)
        we = 1 << (w + 1 - t0_p)
        o = (ti - jnp.uint32(1 << (w + 2 - t0_p))).astype(jnp.int32)
        state, valid, agree = _dense_agree(res, o, we)
        return {
            "n": n, "w": w, "t0": t0_p, "tail_len": w - t0_p + 1,
            "ok": jnp.logical_and(ok, agree),
            "root": group["root"], "wit": witness, "ti0": ti0,
            "state": state, "valid": valid,
        }
    if group.get("quad"):
        # Sibling-quad form (FRI poly groups): branch 4k+i queries position
        # y_k + (rou_deg/4)*i, whose PERMUTED index is 4*y_k + i
        # (main.rs:62-66 + merkle_tree.rs:112-116) -- the four branches of a
        # query are the four leaves of one level-2 subtree node and share
        # every witness above it.  Walk the subtree once per query: two leaf
        # pair-hashes + one combine instead of four full walks, with
        # equality checks wherever a dropped branch's own data would have
        # been used by its independent walk (same safety argument as the
        # dense tails: all checks passing implies the independent walks
        # compute exactly these states, so the final root equality decides
        # all four at once; any mismatch rejects).
        q4 = n // 4
        lead4 = idx.shape[:-1] + (q4, 4)
        idx4 = idx.reshape(lead4)
        # in-graph structure guard (the caller constructs indices this way;
        # a misrouted group must reject, never misverify).  Requires the
        # quad to be 4-ALIGNED, not just consecutive: indices 4y+2..4y+5
        # would pass a consecutiveness-only check yet straddle two subtree
        # nodes, making the H(n01||n23) combine order diverge from the
        # independent walks.
        ok = jnp.logical_and(ok, jnp.all(
            jnp.logical_and(
                idx4 == idx4[..., 0:1] + jnp.arange(4, dtype=jnp.uint32),
                (idx4[..., 0:1] & jnp.uint32(3)) == 0),
            axis=(-1, -2)))
        val4 = val.reshape(lead4 + val.shape[-1:])
        sib4 = sib.reshape(lead4 + sib.shape[-1:])
        # within each sibling pair, each branch's claimed sibling must be
        # the other's value; then H(v0 || s0) serves both walks (b0's tree
        # index 4y is even, b1's odd -> both hash the same ordered pair)
        pair_ok = jnp.concatenate([
            val4[..., 0::2, :] == sib4[..., 1::2, :],
            sib4[..., 0::2, :] == val4[..., 1::2, :]], axis=-1)
        ok = jnp.logical_and(ok, jnp.all(pair_ok, axis=(-1, -2, -3)))
        n01 = blake2s.hash_leaf_pair(val4[..., 0, :], sib4[..., 0, :])
        n23 = blake2s.hash_leaf_pair(val4[..., 2, :], sib4[..., 2, :])
        wit4 = witness.reshape(lead4 + witness.shape[-2:])
        # level-1: each branch's own first witness must equal the computed
        # state of the OTHER pair (what its independent walk hashes against)
        w0 = wit4[..., 0, :]                    # [..., q4, 4, 8]
        ok = jnp.logical_and(ok, jnp.all(jnp.concatenate([
            w0[..., 0:2, :] == n23[..., None, :],
            w0[..., 2:4, :] == n01[..., None, :]], axis=-2),
            axis=(-1, -2, -3)))
        res = blake2s.hash_pair(n01, n23)       # [..., q4, 8]
        # all four branches must present identical witnesses at every
        # remaining level (each independent walk consumes its own copy)
        if w > 1:
            ok = jnp.logical_and(ok, jnp.all(
                wit4[..., 1:, 1:, :] == wit4[..., 0:1, 1:, :],
                axis=(-1, -2, -3, -4)))
        ti0 = ti0.reshape(lead4)[..., 0]        # b0's start index, [..., q4]
        ti = ti0 >> 2
        witness = wit4[..., 0, :, :]            # [..., q4, w, 8]
        n_eff, consumed = q4, 2
    else:
        odd = (ti0 & 1).astype(bool)[..., None]
        res = blake2s.hash_leaf_pair(jnp.where(odd, sib, val),
                                     jnp.where(odd, val, sib))
        ti = ti0 >> 1
        n_eff, consumed = n, 1

    # First dense level.  The agreement machinery costs ~n * width elementwise
    # ops per level while dedup saves (n - width/2) compressions, so wide
    # levels are a net loss -- only the top _tail_cap() levels (where ~75% of
    # the structural sharing lives) leave the full-width scan.
    t0 = max(consumed, w - min(_flog2(max(1, n_eff - 1)), _tail_cap()))
    if t0 > consumed:
        if pallas_walk:
            # quad groups: XLA pair+combine above, fused chain kernel here
            from . import merkle_pallas
            res = merkle_pallas.chain_levels(
                res, witness[..., consumed - 1:t0 - 1, :], ti,
                levels=t0 - consumed, interpret=interp)
            ti = ti >> jnp.uint32(t0 - consumed)
        else:
            wit_b = jnp.moveaxis(witness[..., consumed - 1:t0 - 1, :], -2, 0)

            def step(carry, w_t):
                res, ti = carry
                odd = (ti & 1).astype(bool)[..., None]
                res = blake2s.hash_pair(jnp.where(odd, w_t, res),
                                        jnp.where(odd, res, w_t))
                return (res, ti >> 1), None

            (res, ti), _ = lax.scan(step, (res, ti), wit_b)

    # dense switchover: live keys ti = ti0 >> t0 span one aligned interval,
    # so (key - base) is the node's slot.  Branches sharing a node must agree
    # on the running hash; the agreed value becomes the slot state.
    we = 1 << (w + 1 - t0)
    o = (ti - jnp.uint32(1 << (w + 2 - t0))).astype(jnp.int32)   # [..., n_eff]
    state, valid, agree = _dense_agree(res, o, we)
    return {
        "n": n_eff, "w": w, "t0": t0, "tail_len": w - t0 + 1,
        "ok": jnp.logical_and(ok, agree),
        "root": group["root"], "wit": witness, "ti0": ti0,
        "state": state, "valid": valid,
    }


def _tail_inputs(st: dict, j: int):
    """Build this level's (left, right) hash inputs for one group.

    j = levels remaining after this one; output width = 2^j; input slots
    2o / 2o+1 are the children of output slot o."""
    n, w = st["n"], st["w"]
    t = w - j                                    # witness level consumed
    wt = st["wit"][..., t - 1, :]                # [..., n, 8] (branch order)
    valid = st["valid"]
    w_in = valid.shape[-1]

    # all branches at a node must supply the same witness; the agreed value
    # is the node's dense witness
    o_in = ((st["ti0"] >> t) - jnp.uint32(1 << (w + 2 - t))).astype(jnp.int32)
    wd, _, agree = _dense_agree(wt, o_in, w_in)
    st["ok"] = jnp.logical_and(st["ok"], agree)

    # dense pair step: children of output slot o are input slots 2o, 2o+1
    d = st["state"]
    dl, dr = d[..., 0::2, :], d[..., 1::2, :]
    wl, wr = wd[..., 0::2, :], wd[..., 1::2, :]
    vl, vr = valid[..., 0::2], valid[..., 1::2]
    # even-key child hashes H(state || wit), odd H(wit || state); when both
    # children are present one H(left || right) serves both walks provided
    # each side's claimed witness equals the other's computed state
    a = jnp.where(vl[..., None], dl, wr)
    b = jnp.where(vr[..., None], dr, wl)
    both = jnp.logical_and(vl, vr)
    cross = jnp.logical_and(_eq8(wl, dr), _eq8(wr, dl))
    st["ok"] = jnp.logical_and(st["ok"], jnp.all((~both) | cross, axis=-1))

    st["valid"] = jnp.logical_or(vl, vr)
    return a, b


def verify_groups_shared(groups: list) -> list:
    """Verify rectangular branch groups with shared-path walks.

    groups: dicts with root [..., 8], indices [..., n], value/sibling
    [..., n, vw], witness [..., n, w, 8] (w = the group's uniform depth),
    depth [..., n].  Returns one [...] bool verdict per group (the AND over
    its branches).  All groups' dense tails stack into one Blake2s call per
    tree level.
    """
    sts = [_shared_bottom(g) for g in groups]
    for j in range(max(st["tail_len"] for st in sts) - 1, -1, -1):
        parts = [st for st in sts if st["tail_len"] > j]
        ins = [_tail_inputs(st, j) for st in parts]
        h = blake2s.hash_pair(
            jnp.concatenate([a for a, _ in ins], axis=-2),
            jnp.concatenate([b for _, b in ins], axis=-2))
        off = 0
        for st, (a, _) in zip(parts, ins):
            w_out = a.shape[-2]
            st["state"] = h[..., off:off + w_out, :]
            off += w_out
    return [jnp.logical_and(
                st["ok"],
                jnp.logical_and(st["valid"][..., 0],
                                _eq8(st["state"][..., 0, :], st["root"])))
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
