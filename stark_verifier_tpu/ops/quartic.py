"""Fused batched 4-point interpolation + evaluation for FRI rows.

TPU-native equivalent of multi_interp_4 / eval_quartic (reference:
/root/reference/src/utils.rs:103-120,196-244): the reference loops over
40 query rows per FRI level doing explicit cross-product Lagrange formulas
with one shared batch inversion; here all rows (and all proofs in a batch)
interpolate in lockstep.

All arithmetic is mod-p homomorphic, so raw (unreduced) row values from the
proof bytes are accepted directly; outputs are canonical.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import field as F


def interp4(xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Batched 4-point Lagrange interpolation.

    xs: [..., G, 4, 16] x-coordinates (canonical), ys: [..., G, 4, 16] values
    (may be raw/unreduced).  Returns [..., G, 4, 16] coefficient vectors
    (constant-first), canonical -- matching multi_interp_4's output mod p.
    """
    x0, x1, x2, x3 = (xs[..., i, :] for i in range(4))
    x01 = F.mul_mod(x0, x1)
    x02 = F.mul_mod(x0, x2)
    x03 = F.mul_mod(x0, x3)
    x12 = F.mul_mod(x1, x2)
    x13 = F.mul_mod(x1, x3)
    x23 = F.mul_mod(x2, x3)
    x123 = F.mul_mod(x12, x3)
    x023 = F.mul_mod(x02, x3)
    x013 = F.mul_mod(x01, x3)
    x012 = F.mul_mod(x01, x2)

    one = jnp.broadcast_to(F.const(1), x0.shape).astype(jnp.uint32)

    def eq(c0, q1a, q1b, q1c, l1, l2, l3):
        # [c0neg, q1a+q1b+q1c, -(l1+l2+l3), 1]   (utils.rs:204-217 pattern)
        return jnp.stack([
            F.neg_mod(c0),
            F.add_mod(F.add_mod(q1a, q1b), q1c),
            F.neg_mod(F.add_mod(F.add_mod(l1, l2), l3)),
            one,
        ], axis=-2)                                   # [..., 4(coef), 16]

    eq0 = eq(x123, x12, x13, x23, x1, x2, x3)
    eq1 = eq(x023, x02, x03, x23, x0, x2, x3)
    eq2 = eq(x013, x01, x03, x13, x0, x1, x3)
    eq3 = eq(x012, x01, x02, x12, x0, x1, x2)
    eqs = jnp.stack([eq0, eq1, eq2, eq3], axis=-3)    # [..., 4(i), 4(j), 16]

    e = eval_quartic(eqs, xs)                         # [..., G, 4, 16] e_i = eq_i(x_i)

    # one shared inversion across the whole (G*4) batch, like the reference's
    # single multi_inv over all groups (utils.rs:228)
    lead = e.shape[:-3]
    flat = e.reshape(lead + (-1, 16))
    inv_e = F.batch_inv(flat).reshape(e.shape)

    iy = F.mul_mod(ys, inv_e)                         # [..., G, 4, 16]
    terms = F.mul_mod(eqs, iy[..., :, None, :])       # [..., 4(i), 4(j), 16]
    return F._sum_mod(jnp.moveaxis(terms, -3, -2), axis=-2)  # sum over i -> [..., 4(j), 16]


def eval_quartic(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """coeffs[..., 4, 16] (constant-first), x [..., 16] -> [..., 16] canonical.

    Mirrors eval_quartic (utils.rs:103-120): c0 + c1*x + c2*x^2 + c3*x^3 mod p.
    x may be raw/unreduced (the FRI special_x quirk, SURVEY.md 2.2.5).
    """
    xsq = F.mul_mod(x, x)
    xcb = F.mul_mod(xsq, x)
    t0 = F.canon(coeffs[..., 0, :])
    t1 = F.mul_mod(coeffs[..., 1, :], x)
    t2 = F.mul_mod(coeffs[..., 2, :], xsq)
    t3 = F.mul_mod(coeffs[..., 3, :], xcb)
    return F.add_mod(F.add_mod(t0, t1), F.add_mod(t2, t3))
