"""Shared-path Merkle walks (ops/merkle.verify_groups_shared) vs the
independent-branch walk and the Python oracle.

The shared walk dedups the converging upper-tree levels; these tests pin the
accept/reject equivalence the design argues for (see ops/merkle.py): golden
data accepts, and corruption anywhere -- including witness levels whose
compressions were deduplicated away and duplicate-index branches whose walks
were dropped after the state-equality check -- still rejects.
"""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from stark_verifier_tpu.proofio import wire
from stark_verifier_tpu.ops import merkle, prg


shared_jit = jax.jit(merkle.verify_groups_shared)


def _group(root, indices, g):
    n = len(indices)
    return {
        "root": jnp.asarray(root),
        "indices": jnp.asarray(np.asarray(indices, np.uint32)),
        "value": jnp.asarray(g["value"]),
        "sibling": jnp.asarray(g["sibling"]),
        "witness": jnp.asarray(g["witness"]),
        "depth": jnp.asarray(np.full(n, g["witness"].shape[-2], np.uint32)),
    }


def _proof_groups(proof_bytes):
    """All 12 branch groups of proof.bin with their verify-time indices."""
    p = wire.parse_proof(proof_bytes)
    op, _ = oracle.parse_proof(proof_bytes)
    positions = oracle.get_pseudorandom_indices(op.l_merkle_root, 80, 65536, 8)
    augmented = []
    for q in positions:
        augmented += [q, (q + 8) % 65536]

    def arrs(g):
        return {"value": np.asarray(g.value_words),
                "sibling": np.asarray(g.sibling_words),
                "witness": np.asarray(g.witness_words)}

    groups = [
        (np.asarray(p.merkle_root_words), augmented, arrs(p.main)),
        (np.asarray(p.l_merkle_root_words), positions, arrs(p.lincomb)),
    ]
    rou_deg = 65536
    prev_root = p.l_merkle_root_words
    for lvl in p.fri_levels:
        ys = oracle.get_pseudorandom_indices(
            bytes(np.asarray(lvl.root2_words).view(np.uint8)),
            40, rou_deg // 4, 8)
        poly_pos = [y + (rou_deg // 4) * i for y in ys for i in range(4)]
        # NB: reference order is i-major per y? main.rs:62-66 builds
        # poly positions y + (rou_deg/4)*i grouped per y -- match verify.py
        poly_pos = []
        for y in ys:
            poly_pos += [y + (rou_deg // 4) * i for i in range(4)]
        groups.append((np.asarray(lvl.root2_words), ys, arrs(lvl.column)))
        groups.append((np.asarray(prev_root), poly_pos, arrs(lvl.poly)))
        rou_deg //= 4
        prev_root = lvl.root2_words
    return groups


def test_shared_accepts_all_proof_groups(proof_bytes):
    groups = [_group(r, i, g) for r, i, g in _proof_groups(proof_bytes)]
    oks = [bool(np.asarray(o)) for o in shared_jit(groups)]
    assert oks == [True] * 12


def test_shared_rejects_flips_everywhere(proof_bytes):
    """Flip one word per corruption site, including the deduplicated upper
    witness levels of non-representative branches, across several groups."""
    raw = _proof_groups(proof_bytes)
    for gi in (0, 1, 2, 3, 10, 11):
        root, idx, g = raw[gi]
        w = g["witness"].shape[-2]
        for site in ("wit_top", "wit_top_b2", "wit_mid", "wit_bot",
                     "value", "sibling", "root"):
            root2, g2 = np.array(root), {k: np.array(v) for k, v in g.items()}
            if site == "wit_top":
                g2["witness"][0, w - 1, 0] ^= 1
            elif site == "wit_top_b2":
                # a LATER branch (likely non-representative near the root)
                g2["witness"][len(idx) - 1, w - 1, 3] ^= 0x80000000
            elif site == "wit_mid":
                g2["witness"][len(idx) // 2, w // 2, 7] ^= 2
            elif site == "wit_bot":
                g2["witness"][1, 0, 0] ^= 1
            elif site == "value":
                g2["value"][2, 0] ^= 1
            elif site == "sibling":
                g2["sibling"][3, -1] ^= 4
            else:
                root2[0] ^= 1
            ok = bool(np.asarray(shared_jit([_group(root2, idx, g2)])[0]))
            assert not ok, (gi, site)
            okf, _ = merkle.verify_branches(
                jnp.asarray(root2), jnp.asarray(np.asarray(idx, np.uint32)),
                jnp.asarray(g2["value"]), jnp.asarray(g2["sibling"]),
                jnp.asarray(g2["witness"]), w)
            assert not bool(np.asarray(okf).all()), (gi, site)


# ---------------------------------------------------------------------------
# synthetic tree: duplicate indices, batching
# ---------------------------------------------------------------------------

def _h(b: bytes) -> bytes:
    return hashlib.blake2s(b).digest()


def _build_tree(leaves):
    """Full permuted-layout tree; returns levels[0]=leaves .. levels[-1]=[root]."""
    levels = [list(leaves)]
    while len(levels[-1]) > 1:
        prev = levels[-1]
        levels.append([_h(prev[2 * m] + prev[2 * m + 1])
                       for m in range(len(prev) // 2)])
    return levels


def _branch_for(levels, x):
    """(value, sibling, witnesses) for query index x (permute-4 layout)."""
    n = len(levels[0])
    ld4 = n // 4
    i = (x // ld4) + 4 * (x % ld4)
    value = levels[0][i]
    sibling = levels[0][i ^ 1]
    wit = [levels[t][(i >> t) ^ 1] for t in range(1, len(levels) - 1)]
    return value, sibling, wit


def _words(b: bytes) -> np.ndarray:
    return np.frombuffer(b, np.uint8).view(np.uint32).reshape(-1)


def _synth_group(indices, seed=0):
    w = 6                              # 128-leaf tree, witness depth 6
    rng = np.random.default_rng(seed)
    leaves = [rng.integers(0, 256, 32, np.uint8).tobytes() for _ in range(128)]
    levels = _build_tree(leaves)
    root = _words(levels[-1][0])
    vals, sibs, wits = [], [], []
    for x in indices:
        v, s, wl = _branch_for(levels, x)
        # cross-check the constructed branch against the oracle walker
        assert oracle.verify_branch(
            levels[-1][0], x, oracle.Branch(v, s, wl)) == v
        vals.append(_words(v))
        sibs.append(_words(s))
        wits.append([_words(x_) for x_ in wl])
    g = {"value": np.array(vals), "sibling": np.array(sibs),
         "witness": np.array(wits)}
    assert g["witness"].shape == (len(indices), w, 8)
    return root, g


def test_synthetic_duplicates_and_batch():
    idx = [5, 99, 31, 31, 77, 12, 64, 5]        # two duplicate pairs
    root, g = _synth_group(idx, seed=1)
    ok = bool(np.asarray(shared_jit([_group(root, idx, g)])[0]))
    assert ok

    # corrupt the SECOND copy of a duplicated index: its independent walk is
    # replaced by the state-equality check at the switchover -- must reject
    g2 = {k: np.array(v) for k, v in g.items()}
    g2["value"][3, 0] ^= 1
    assert not bool(np.asarray(shared_jit([_group(root, idx, g2)])[0]))

    # corrupt the second copy's witness in the deduped region
    g3 = {k: np.array(v) for k, v in g.items()}
    g3["witness"][7, 5, 2] ^= 1
    assert not bool(np.asarray(shared_jit([_group(root, idx, g3)])[0]))

    # batch of [good, bad] verifies lanewise
    def stack(ga, gb):
        return {
            "root": jnp.asarray(np.stack([root, root])),
            "indices": jnp.asarray(
                np.stack([np.asarray(idx, np.uint32)] * 2)),
            "value": jnp.asarray(np.stack([ga["value"], gb["value"]])),
            "sibling": jnp.asarray(np.stack([ga["sibling"], gb["sibling"]])),
            "witness": jnp.asarray(np.stack([ga["witness"], gb["witness"]])),
            "depth": jnp.asarray(np.full((2, len(idx)), 6, np.uint32)),
        }
    oks = np.asarray(shared_jit([stack(g, g2)])[0])
    assert oks.tolist() == [True, False]


def test_ragged_group_routed_to_shared_rejects_not_misverifies():
    """The shared walk requires rectangular groups; a ragged depth array must
    reject (the facade routes ragged proofs to the masked walk instead)."""
    idx = [5, 99, 31, 77]
    root, g = _synth_group(idx, seed=2)
    grp = _group(root, idx, g)
    grp["depth"] = jnp.asarray(np.array([6, 6, 5, 6], np.uint32))
    assert not bool(np.asarray(shared_jit([grp])[0]))


# ---------------------------------------------------------------------------
# MXU agreement path (ops/merkle._dense_agree_mxu)
# ---------------------------------------------------------------------------

def test_dense_agree_mxu_matches_minmax():
    """Exact parity of the matmul agreement with the min/max form: same
    occupancy/agree flags always, same dense values wherever slots agree."""
    rng = np.random.default_rng(7)
    n, width = 24, 16
    for case in ("agree", "disagree"):
        vals = rng.integers(0, 1 << 32, size=(3, n, 8), dtype=np.uint32)
        o = rng.integers(0, width, size=(3, n)).astype(np.int32)
        # make every collision agree by copying the first branch at each slot
        for b in range(3):
            for s in range(width):
                hits = np.nonzero(o[b] == s)[0]
                if len(hits) > 1:
                    vals[b, hits[1:]] = vals[b, hits[0]]
        if case == "disagree":
            dup = np.nonzero(o[0] == o[0][0])[0]
            o[0][1] = o[0][0]
            vals[0, 1] = vals[0, 0] ^ np.uint32(1 << 31)   # conflicting copy
        d1, occ1, a1 = merkle._dense_agree_minmax(jnp.asarray(vals),
                                                  jnp.asarray(o), width)
        d2, occ2, a2 = merkle._dense_agree_mxu(jnp.asarray(vals),
                                               jnp.asarray(o), width)
        assert np.array_equal(np.asarray(occ1), np.asarray(occ2))
        assert np.array_equal(np.asarray(a1), np.asarray(a2)), case
        ok = np.asarray(a1)
        d1, d2, occ = np.asarray(d1), np.asarray(d2), np.asarray(occ1)
        assert np.array_equal(d1[ok][occ[ok]], d2[ok][occ[ok]])
        if case == "agree":
            assert ok.all()
        else:
            assert not ok[0] and ok[1:].all()   # only batch 0 was corrupted


def test_shared_mxu_agreement_end_to_end(proof_bytes, monkeypatch):
    """Whole shared walk with the MXU agreement forced on: golden groups
    accept, corrupted deduplicated-witness data still rejects."""
    monkeypatch.setattr(merkle, "_AGREE_MXU", "1")
    fn = jax.jit(merkle.verify_groups_shared)
    raw = _proof_groups(proof_bytes)
    groups = [_group(r, i, g) for r, i, g in raw]
    oks = [bool(np.asarray(o)) for o in fn(groups)]
    assert oks == [True] * 12
    root, idx, g = raw[0]
    g2 = {k: np.array(v) for k, v in g.items()}
    w = g2["witness"].shape[-2]
    g2["witness"][len(idx) - 1, w - 1, 3] ^= 0x80000000
    assert not bool(np.asarray(fn([_group(root, idx, g2)])[0]))


# ---------------------------------------------------------------------------
# sibling-quad poly groups (ops/merkle._shared_bottom quad path)
# ---------------------------------------------------------------------------

def test_quad_poly_groups_accept_and_reject(proof_bytes):
    """FRI poly groups walked in sibling-quad form: golden data accepts;
    corrupting any datum a dropped branch contributed (values, siblings,
    first witnesses, upper witnesses of non-representative branches) still
    rejects, exactly like the independent walk."""
    raw = _proof_groups(proof_bytes)
    for gi in (3, 11):                       # first and last poly group
        root, idx, g = raw[gi]
        quad_jit = jax.jit(
            lambda gs: merkle.verify_groups_shared(
                [dict(g_, quad=True) for g_ in gs]))
        assert bool(np.asarray(quad_jit([_group(root, idx, g)])[0])), gi
        w = g["witness"].shape[-2]
        for site, mut in [
            ("b1_value", lambda g2: g2["value"].__setitem__((1, 0), g2["value"][1, 0] ^ 1)),
            ("b0_sibling", lambda g2: g2["sibling"].__setitem__((0, 2), g2["sibling"][0, 2] ^ 4)),
            ("b1_wit0", lambda g2: g2["witness"].__setitem__((1, 0, 0), g2["witness"][1, 0, 0] ^ 1)),
            ("b3_wit_top", lambda g2: g2["witness"].__setitem__((3, w - 1, 7), g2["witness"][3, w - 1, 7] ^ 2)),
            ("b0_wit_mid", lambda g2: g2["witness"].__setitem__((0, w // 2, 3), g2["witness"][0, w // 2, 3] ^ 8)),
            ("b2_value", lambda g2: g2["value"].__setitem__((2, 5), g2["value"][2, 5] ^ 16)),
        ]:
            g2 = {k: np.array(v) for k, v in g.items()}
            mut(g2)
            assert not bool(np.asarray(
                quad_jit([_group(root, idx, g2)])[0])), (gi, site)
            # parity: the independent walk rejects too
            okf, _ = merkle.verify_branches(
                jnp.asarray(root), jnp.asarray(np.asarray(idx, np.uint32)),
                jnp.asarray(g2["value"]), jnp.asarray(g2["sibling"]),
                jnp.asarray(g2["witness"]), w)
            assert not bool(np.asarray(okf).all()), (gi, site)


def test_quad_misaligned_consecutive_rejects():
    """Alignment guard: a quad whose PERMUTED indices are consecutive but not
    4-aligned (4y+2..4y+5) with fabricated data that satisfies every
    pair/witness cross-check -- the attacker presents the real subtree of
    level-2 node y, so without the `(idx4[...,0] & 3) == 0` guard the shared
    walk's H(n01||n23) chain reaches the true root and ACCEPTS, while the
    independent walks hash in the opposite order and reject."""
    w = 6
    rng = np.random.default_rng(3)
    leaves = [rng.integers(0, 256, 32, np.uint8).tobytes() for _ in range(128)]
    levels = _build_tree(leaves)
    root = _words(levels[-1][0])
    y = 3
    # query indices x whose permuted index i = (x // ld4) + 4*(x % ld4) is
    # 4y+2 .. 4y+5 (consecutive, straddling two level-2 subtrees)
    ld4 = 1 << (w - 1)
    idx = [(i % 4) * ld4 + (i // 4) for i in range(4 * y + 2, 4 * y + 6)]
    n01 = levels[1][2 * y]          # real level-1 nodes of level-2 node y
    n23 = levels[1][2 * y + 1]
    vals = [leaves[4 * y], leaves[4 * y + 1], leaves[4 * y + 2], leaves[4 * y + 3]]
    sibs = [vals[1], vals[0], vals[3], vals[2]]          # pair checks pass
    wit0 = [n23, n23, n01, n01]                          # level-1 checks pass
    upper = [levels[t][(y >> (t - 2)) ^ 1] for t in range(2, w + 1)]
    g = {"value": np.array([_words(v) for v in vals]),
         "sibling": np.array([_words(s) for s in sibs]),
         "witness": np.array([[_words(x_) for x_ in [w0] + upper]
                              for w0 in wit0])}
    assert g["witness"].shape == (4, w, 8)
    quad_jit = jax.jit(lambda gs: merkle.verify_groups_shared(
        [dict(g_, quad=True) for g_ in gs]))
    assert not bool(np.asarray(quad_jit([_group(root, idx, g)])[0]))
    # parity: the independent walk rejects this data too
    okf, _ = merkle.verify_branches(
        jnp.asarray(root), jnp.asarray(np.asarray(idx, np.uint32)),
        jnp.asarray(g["value"]), jnp.asarray(g["sibling"]),
        jnp.asarray(g["witness"]), w)
    assert not bool(np.asarray(okf).any())


def test_quad_mixed_with_plain_groups(proof_bytes):
    """Quad and plain groups stack their dense tails into the same per-level
    Blake2s calls; whole-proof group set accepts with poly groups as quads."""
    raw = _proof_groups(proof_bytes)
    groups = [_group(r, i, g) for r, i, g in raw]
    mixed_jit = jax.jit(
        lambda gs: merkle.verify_groups_shared(
            [dict(g_, quad=(k >= 2 and k % 2 == 1))  # FRI poly groups
             for k, g_ in enumerate(gs)]))
    oks = [bool(np.asarray(o)) for o in mixed_jit(groups)]
    assert oks == [True] * 12
