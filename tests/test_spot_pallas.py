"""Interpret-mode golden tests: fused Pallas spot-check kernel vs the XLA
formulation of the three constraint families (transition/boundary/lincomb),
covering both passing and failing positions."""

import numpy as np
import jax.numpy as jnp
import pytest

from stark_verifier_tpu import fp
from stark_verifier_tpu.ops import field as F, spot_pallas


@pytest.fixture(autouse=True)
def _tiny_tiles(monkeypatch):
    monkeypatch.setattr(spot_pallas, "LANE_TILE", 128)


def _rand_limbs(rng, shape, canonical=False):
    v = rng.randint(0, 1 << 16, shape + (fp.NLIMBS,)).astype(np.uint32)
    if canonical:
        v = np.asarray(F.canon(jnp.asarray(v)))
    return v


def _xla_reference(raw5, tab5, ks4, ic1, ic0):
    p = F.canon(jnp.asarray(raw5[..., 0, :]))
    pg1 = F.canon(jnp.asarray(raw5[..., 1, :]))
    d = F.canon(jnp.asarray(raw5[..., 2, :]))
    b = F.canon(jnp.asarray(raw5[..., 3, :]))
    l = F.canon(jnp.asarray(raw5[..., 4, :]))
    x, xs, z, z2, k = (jnp.asarray(tab5[..., i, :]) for i in range(5))
    ks = jnp.asarray(ks4)
    ic1 = jnp.asarray(ic1)
    ic0 = jnp.asarray(ic0)

    p_sq = F.sqr_mod(p)
    rhs_t = F.mul_sum_mod([(p_sq, p), (z, d)], extra=[k])
    ok_t = jnp.all(pg1 == rhs_t, -1)
    rhs_b = F.mul_sum_mod([(b, z2), (ic1, x)],
                          extra=[jnp.broadcast_to(ic0, x.shape)])
    ok_b = jnp.all(p == rhs_b, -1)
    p_xs = F.mul_mod_lazy(p, xs)
    b_xs = F.mul_mod_lazy(b, xs)
    rhs_l = F.mul_sum_mod(
        [(ks[..., 0, :], p), (ks[..., 1, :], p_xs),
         (ks[..., 2, :], b), (ks[..., 3, :], b_xs)], extra=[d])
    ok_l = jnp.all(l == rhs_l, -1)
    return (np.stack([np.asarray(ok_t), np.asarray(ok_b), np.asarray(ok_l)],
                     axis=-1),
            np.asarray(rhs_t), np.asarray(rhs_b), np.asarray(rhs_l))


def test_spot_checks_match_xla():
    rng = np.random.RandomState(11)
    n = 10
    raw5 = _rand_limbs(rng, (n, 5))
    tab5 = _rand_limbs(rng, (n, 5), canonical=True)
    ks4 = _rand_limbs(rng, (4,))
    ic1 = _rand_limbs(rng, (), canonical=True)
    ic0 = _rand_limbs(rng, (), canonical=True)

    want, rhs_t, rhs_b, rhs_l = _xla_reference(raw5, tab5, ks4, ic1, ic0)
    assert not want.any()            # random inputs: all three checks fail

    # make individual families PASS on chosen positions (a canonical rhs is
    # a valid raw encoding of itself)
    raw5[0, 1] = rhs_t[0]            # transition holds at position 0
    raw5[1, 0] = rhs_b[1]            # boundary holds at position 1 ...
    raw5[2, 4] = rhs_l[2]
    want, _, _, _ = _xla_reference(raw5, tab5, ks4, ic1, ic0)
    assert want[0, 0] and want[1, 1] and want[2, 2]

    got = np.asarray(spot_pallas.spot_checks(
        jnp.asarray(raw5), jnp.asarray(tab5), jnp.asarray(ks4),
        jnp.asarray(ic1), jnp.asarray(ic0), interpret=True))
    np.testing.assert_array_equal(got, want)
