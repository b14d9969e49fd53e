"""Interpret-mode golden tests: fused Pallas FRI row kernel vs the XLA path
(quartic.eval4_inv_free), including the sx==node coincidence select."""

import numpy as np
import jax.numpy as jnp
import pytest

from stark_verifier_tpu import fp
from stark_verifier_tpu.ops import field as F, fri_pallas, quartic


@pytest.fixture(autouse=True)
def _tiny_tiles(monkeypatch):
    monkeypatch.setattr(fri_pallas, "LANE_TILE", 128)


def _rand_limbs(rng, shape, canonical=False):
    v = rng.randint(0, 1 << 16, shape + (fp.NLIMBS,)).astype(np.uint32)
    if canonical:
        v = np.asarray(F.canon(jnp.asarray(v)))
    return v


def test_rows_match_xla():
    rng = np.random.RandomState(7)
    G = 12
    nodes = _rand_limbs(rng, (G, 4), canonical=True)
    x1ci = _rand_limbs(rng, (G,), canonical=True)
    winv = _rand_limbs(rng, (4,), canonical=True)
    ys = _rand_limbs(rng, (G, 4))                   # raw rows
    sx = _rand_limbs(rng, ())                       # raw special_x

    want = np.asarray(quartic.eval4_inv_free(
        jnp.asarray(nodes), jnp.asarray(x1ci), jnp.asarray(winv),
        jnp.asarray(ys), jnp.asarray(sx)))
    got = np.asarray(fri_pallas.eval4_rows(
        jnp.asarray(nodes), jnp.asarray(x1ci), winv, jnp.asarray(ys),
        jnp.asarray(sx), interpret=True))
    np.testing.assert_array_equal(got, want)


def test_rows_node_coincidence():
    """sx equal to one of the nodes: the kernel must return that node's y
    (canonicalized), like the XLA path."""
    rng = np.random.RandomState(8)
    G = 4
    nodes = _rand_limbs(rng, (G, 4), canonical=True)
    x1ci = _rand_limbs(rng, (G,), canonical=True)
    winv = _rand_limbs(rng, (4,), canonical=True)
    ys = _rand_limbs(rng, (G, 4))
    sx = nodes[2, 3].copy()                         # hits group 2, node 3

    want = np.asarray(quartic.eval4_inv_free(
        jnp.asarray(nodes), jnp.asarray(x1ci), jnp.asarray(winv),
        jnp.asarray(ys), jnp.asarray(sx)))
    got = np.asarray(fri_pallas.eval4_rows(
        jnp.asarray(nodes), jnp.asarray(x1ci), winv, jnp.asarray(ys),
        jnp.asarray(sx), interpret=True))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        got[2], np.asarray(F.canon(jnp.asarray(ys[2, 3]))))
