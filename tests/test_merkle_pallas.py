"""Interpret-mode coverage for the Pallas Merkle walk kernels.

Round-2 history: the masked whole-walk kernel measured 4x slower than the
XLA scan and was parked.  Round-4 re-measurement (tools/microbench_walk.py)
found it 1.45x FASTER in-graph at the main-walk shapes, so the static-depth
partial-walk variants (walk_leaf_levels / chain_levels) are now the
production shared-bottom path under STARK_PALLAS_WALK=1 (docs/PERF.md
round-4 section).  These tests pin all kernels against the XLA formulation
in interpreter mode; bit-exactness on real TPU is driven by bench.py and the
verify skill.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stark_verifier_tpu.ops import blake2s, merkle, merkle_pallas


@pytest.fixture(autouse=True)
def _tiny_tiles(monkeypatch):
    # full [32, 128] grid tiles take minutes under the interpret-mode
    # emulator; 1x128 tiles exercise the same kernel logic
    monkeypatch.setattr(merkle_pallas, "SUB_TILE", 1)


def _reference_walk(val, sib, wit, ti, dp, max_depth):
    """XLA reference: leaf-pair hash then ragged witness walk."""
    odd = (ti & 1).astype(bool)[..., None]
    r = blake2s.hash_leaf_pair(jnp.where(odd, sib, val),
                               jnp.where(odd, val, sib))
    t2 = ti >> 1
    for k in range(max_depth):
        w = wit[:, k, :]
        odd = (t2 & 1).astype(bool)[..., None]
        nr = blake2s.hash_pair(jnp.where(odd, w, r), jnp.where(odd, r, w))
        act = (k < dp)[..., None]
        r = jnp.where(act, nr, r)
        t2 = jnp.where(k < dp, t2 >> 1, t2)
    return r


# vw=24 (multi-block leaf) is validated on real TPU only: its 3 unrolled
# compressions make the interpret-mode emulator take >10 min to trace
@pytest.mark.parametrize("vw", [8])
def test_walk_matches_xla_ragged(vw):
    rng = np.random.RandomState(0)
    n, max_depth = 8, 3
    val = jnp.asarray(rng.randint(0, 2**32, (n, vw), dtype=np.uint32))
    sib = jnp.asarray(rng.randint(0, 2**32, (n, vw), dtype=np.uint32))
    wit = jnp.asarray(rng.randint(0, 2**32, (n, max_depth, 8),
                                  dtype=np.uint32))
    idx = jnp.arange(n, dtype=jnp.uint32)
    dp = jnp.asarray((np.arange(n) % max_depth) + 1, jnp.uint32)
    ld4 = jnp.uint32(1) << (dp - 1)
    ti = (jnp.uint32(1) << (dp + 2)) + (idx // ld4) + 4 * (idx % ld4)

    got = np.asarray(merkle_pallas.walk_branches(val, sib, wit, ti, dp,
                                                 interpret=True))
    want = np.asarray(_reference_walk(val, sib, wit, ti, dp, max_depth))
    np.testing.assert_array_equal(got, want)


def test_walk_leaf_levels_matches_xla():
    """Static-depth partial walk (the shared-bottom production kernel)."""
    rng = np.random.RandomState(1)
    n, depth, levels = 8, 4, 3
    val = jnp.asarray(rng.randint(0, 2**32, (n, 8), dtype=np.uint32))
    sib = jnp.asarray(rng.randint(0, 2**32, (n, 8), dtype=np.uint32))
    wit = jnp.asarray(rng.randint(0, 2**32, (n, depth, 8), dtype=np.uint32))
    idx = jnp.arange(n, dtype=jnp.uint32)
    ld4 = jnp.uint32(1 << (depth - 1))
    ti = jnp.uint32(1 << (depth + 2)) + (idx // ld4) + 4 * (idx % ld4)

    got = np.asarray(merkle_pallas.walk_leaf_levels(
        val, sib, wit, ti, levels=levels, interpret=True))
    dp = jnp.full((n,), jnp.uint32(levels))
    want = np.asarray(_reference_walk(val, sib, wit[:, :levels], ti, dp,
                                      levels))
    np.testing.assert_array_equal(got, want)


def test_chain_levels_matches_xla():
    rng = np.random.RandomState(2)
    n, levels = 8, 3
    h = jnp.asarray(rng.randint(0, 2**32, (n, 8), dtype=np.uint32))
    wit = jnp.asarray(rng.randint(0, 2**32, (n, levels, 8), dtype=np.uint32))
    ti = jnp.asarray(rng.randint(8, 64, (n,), dtype=np.uint32))

    got = np.asarray(merkle_pallas.chain_levels(h, wit, ti, levels=levels,
                                                interpret=True))
    r, t2 = h, ti
    for k in range(levels):
        w = wit[:, k, :]
        odd = (t2 & 1).astype(bool)[..., None]
        r = blake2s.hash_pair(jnp.where(odd, w, r), jnp.where(odd, r, w))
        t2 = t2 >> 1
    np.testing.assert_array_equal(got, np.asarray(r))


def test_shared_walk_pallas_integration(proof_bytes, monkeypatch):
    """verify_groups_shared with STARK_PALLAS_WALK=interpret must agree with
    the XLA path on real proof.bin groups: lincomb (plain leaf walk) and the
    last FRI level's column + quad poly groups (chain after pair+combine)."""
    from stark_verifier_tpu.proofio import wire
    from stark_verifier_tpu.ops import prg

    p = wire.parse_proof(proof_bytes)
    lv = p.fri_levels[-1]                    # shallowest level (cheapest)
    mod = 256 // 4                           # final level domain / 4

    lin_idx = prg.pseudorandom_indices(
        jnp.asarray(p.l_merkle_root_words), 80, 65536, 8)
    ys = prg.pseudorandom_indices(jnp.asarray(lv.root2_words), 40, mod, 8)
    poly_pos = (ys[..., None]
                + jnp.uint32(mod) * jnp.arange(4, dtype=jnp.uint32)).reshape(160)

    def groups():
        return [
            {"root": jnp.asarray(p.l_merkle_root_words), "indices": lin_idx,
             "value": jnp.asarray(p.lincomb.value_words),
             "sibling": jnp.asarray(p.lincomb.sibling_words),
             "witness": jnp.asarray(p.lincomb.witness_words),
             "depth": jnp.asarray(p.lincomb.depths)},
            {"root": jnp.asarray(lv.root2_words), "indices": ys,
             "value": jnp.asarray(lv.column.value_words),
             "sibling": jnp.asarray(lv.column.sibling_words),
             "witness": jnp.asarray(lv.column.witness_words),
             "depth": jnp.asarray(lv.column.depths)},
            {"root": jnp.asarray(p.fri_levels[-2].root2_words),
             "indices": poly_pos,
             "value": jnp.asarray(lv.poly.value_words),
             "sibling": jnp.asarray(lv.poly.sibling_words),
             "witness": jnp.asarray(lv.poly.witness_words),
             "depth": jnp.asarray(lv.poly.depths), "quad": True},
        ]

    want = [bool(np.asarray(v)) for v in merkle.verify_groups_shared(groups())]
    assert want == [True, True, True]
    monkeypatch.setenv("STARK_PALLAS_WALK", "interpret")
    got = [bool(np.asarray(v)) for v in merkle.verify_groups_shared(groups())]
    assert got == want

    # corruption still rejects through the pallas path
    g = groups()
    bad = np.asarray(g[0]["value"]).copy()
    bad[3, 0] ^= 1
    g[0]["value"] = jnp.asarray(bad)
    got_bad = [bool(np.asarray(v)) for v in merkle.verify_groups_shared(g)]
    assert got_bad[0] is False and got_bad[1] and got_bad[2]
