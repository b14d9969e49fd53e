"""Interpret-mode coverage for the experimental Pallas Merkle walk kernel.

The kernel is bit-exact on TPU (all 5 FRI levels + the 160-branch main group
of proof.bin validated on hardware) but measured 4x SLOWER than the XLA
lockstep-scan formulation at batch 1024 (158 ms vs 39 ms): Blake2s is one
long elementwise dependency chain that XLA already fuses into a single
near-VPU-peak loop, so there is no memory traffic for a hand kernel to save.
It stays out of the product path (docs/PERF.md "Dead ends"); this test pins
its semantics against the XLA path so the experiment remains runnable.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stark_verifier_tpu.ops import blake2s, merkle_pallas


@pytest.fixture(autouse=True)
def _tiny_tiles(monkeypatch):
    # full [32, 128] grid tiles take minutes under the interpret-mode
    # emulator; 1x128 tiles exercise the same kernel logic
    monkeypatch.setattr(merkle_pallas, "SUB_TILE", 1)
    monkeypatch.setattr(merkle_pallas, "LANE_TILE", 128)


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
