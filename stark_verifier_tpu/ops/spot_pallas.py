"""Pallas TPU kernel for the fused constraint spot checks.

One kernel evaluates all three per-position constraint families of
verify_mimc_proof (reference: /root/reference/src/main.rs:163-192) with
every intermediate in VMEM:

  transition   P(g1 x) == P(x)^3 + K(x) + Z(x) D(x)
  boundary     P(x)    == B(x) Z2(x) + I1 x + I0
  lincomb      L(x)    == D(x) + k1 P + k2 P x^s + k3 B + k4 B x^s

The XLA path pays ~11 modular multiplies per position with HBM-resident
intermediates between the MXU column matmuls; here the five canonicalized
trace values, both x^steps products and the three single-fold multi-term
accumulators never leave VMEM.  Output is the three ok bits per position.

Layout/Mosaic constraints as ops/field_pallas.py (limb-major [16, T]
tiles, no scatters, no boolean vectors).  Enabled via STARK_PALLAS=1
(field.pallas_enabled); golden-tested against the XLA formulation in
tests/test_spot_pallas.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field_pallas import (
    _canon_cols, _fold_canon, _mul_cols, _shift_rows, _sum_rows)

LANE_TILE = 512          # positions per grid step


def _pad_cols(v: jnp.ndarray) -> jnp.ndarray:
    """Embed a [16, T] value into [33, T] product columns as an addend."""
    return _shift_rows(v, 0, 33)


def _eq_bit(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[16, T] x [16, T] -> [1, T] uint32 1 where all limbs equal."""
    s = _sum_rows(a ^ b)                                         # < 2^20
    return (jnp.uint32(0) - s) >> 31 ^ jnp.uint32(1)


@functools.lru_cache(maxsize=4)
def _make_spot_kernel(power: int):
    """power: the transition exponent (3 = reference MiMC AIR, 2 = the
    square family, models/square.py); static per statement family."""
    if power not in (2, 3):
        raise ValueError(f"unsupported transition power {power}")

    def kernel(raw_ref, tab_ref, pc_ref, o_ref):
        # raw [80, T]: P(x), P(g1 x), D(x), B(x), L(x) raw trace limbs
        # tab [80, T]: x, x^steps, Z(x), Z2(x), K(x) canonical table gathers
        # pc  [96, T]: k1..k4 raw, I_c1, I_c0 (broadcast per proof)
        raw = raw_ref[:]
        tab = tab_ref[:]
        pc = pc_ref[:]
        p, pg1, d, b, l = (_canon_cols(raw[16 * i:16 * (i + 1)])
                           for i in range(5))
        x, xs, z, z2, k = (tab[16 * i:16 * (i + 1)] for i in range(5))
        k1, k2, k3, k4, ic1, ic0 = (pc[16 * i:16 * (i + 1)] for i in range(6))

        # transition: P^power + Z*D + K through ONE fold (mul_sum_mod bound)
        if power == 3:
            p_sq = _fold_canon(_mul_cols(p, p))
            t_prod = _mul_cols(p_sq, p)
        else:
            t_prod = _mul_cols(p, p)
        rhs_t = _fold_canon(t_prod + _mul_cols(z, d) + _pad_cols(k))
        ok_t = _eq_bit(pg1, rhs_t)

        # boundary: B*Z2 + I1*x + I0
        rhs_b = _fold_canon(_mul_cols(b, z2) + _mul_cols(ic1, x)
                            + _pad_cols(ic0))
        ok_b = _eq_bit(p, rhs_b)

        # lincomb: k1*P + k2*P*x^s + k3*B + k4*B*x^s + D (raw k's, 2.2.3)
        p_xs = _fold_canon(_mul_cols(p, xs))
        b_xs = _fold_canon(_mul_cols(b, xs))
        rhs_l = _fold_canon(_mul_cols(k1, p) + _mul_cols(k2, p_xs)
                            + _mul_cols(k3, b) + _mul_cols(k4, b_xs)
                            + _pad_cols(d))
        ok_l = _eq_bit(l, rhs_l)

        T = ok_t.shape[1]
        o_ref[:] = jnp.concatenate(
            [ok_t, ok_b, ok_l, jnp.zeros((5, T), jnp.uint32)], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "power"))
def _spot_t(raw_t, tab_t, pc_t, interpret: bool = False, power: int = 3):
    """Limb-major fused spot checks -> [8, N] uint32 (rows 0..2 = the
    transition/boundary/lincomb ok bits).  N must be a LANE_TILE multiple."""
    n = raw_t.shape[1]
    if n % LANE_TILE:
        raise ValueError(f"N={n} must be a LANE_TILE multiple")
    grid = (n // LANE_TILE,)

    def spec(rows):
        return pl.BlockSpec((rows, LANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_spot_kernel(power),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.uint32),
        grid=grid,
        in_specs=[spec(80), spec(80), spec(96)],
        out_specs=spec(8),
        interpret=interpret,
    )(raw_t, tab_t, pc_t)


def spot_checks(raw5, tab5, ks4, ic1, ic0, interpret: bool = False,
                power: int = 3):
    """Fused transition/boundary/lincomb checks.

    raw5: [..., 5, 16] raw trace limbs (P, Pg1, D, B, L); tab5 [..., 5, 16]
    canonical gathers (x, x^steps, Z, Z2, K); ks4 [..., 4, 16] raw k1..k4
    (broadcastable over positions); ic1/ic0 [..., 16] boundary interpolant
    coefficients (broadcastable); power: transition exponent (2 or 3).
    Returns ok [..., 3] bool.
    """
    lead = raw5.shape[:-2]
    ks4 = jnp.broadcast_to(ks4, lead + (4, 16))
    pcs = jnp.concatenate(
        [ks4, jnp.broadcast_to(ic1, lead + (16,))[..., None, :],
         jnp.broadcast_to(ic0, lead + (16,))[..., None, :]], axis=-2)
    n = int(np.prod(lead)) if lead else 1
    npad = -(-n // LANE_TILE) * LANE_TILE

    def flat(x, rows):
        x = x.reshape((n, rows))
        if npad != n:
            x = jnp.concatenate(
                [x, jnp.zeros((npad - n, rows), jnp.uint32)])
        return x.T

    out = _spot_t(flat(raw5, 80), flat(tab5, 80), flat(pcs, 96),
                  interpret=interpret, power=power)
    return out.T[:n, :3].reshape(lead + (3,)) != 0
