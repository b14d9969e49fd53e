"""Pallas TPU kernel for fused 256-bit modular multiplication.

The XLA lowering of ops/field.mul_mod materializes the [N, 16, 16] limb
product matrix and its padded diagonal-sum intermediates in HBM -- several KB
of memory traffic per multiply, making the op HBM-bound at ~2 M mul/s on a
v5e.  This kernel keeps the whole schoolbook product, Kogge-Stone carry
propagation, sparse-prime folds, and final conditional subtract in
VMEM/registers: per multiply it reads 128 B of operands and writes 64 B.

Layout: limb-major [16, N] tiles (limbs on the sublane axis, batch on the
128-lane axis), so every per-limb row is a contiguous vector.  The public
wrapper accepts/returns the framework's [..., 16] layout and adapts.

Same bit-exact semantics as field.mul_mod: inputs any values < 2^256,
output canonical in [0, p).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import fp

MASK = 0xFFFF            # plain int: pallas kernels cannot capture jnp consts
LANE_TILE = 512          # batch elements per grid step


def _carry_cols(v: jnp.ndarray) -> jnp.ndarray:
    """Normalize limb columns (< 2^27) along axis 0 of [n, T]; exact, no
    control flow (same derivation as field._carry_fix, limb-major)."""
    n = v.shape[0]
    c = v >> 16
    lo = v & MASK
    s = lo.at[1:].add(c[:-1])
    g = (s >> 16).astype(jnp.bool_)
    t = s & MASK
    p = t == MASK
    shift = 1
    while shift < n:
        zg = jnp.zeros_like(g)
        zp = jnp.zeros_like(p)
        g_prev = zg.at[shift:].set(g[:-shift])
        p_prev = zp.at[shift:].set(p[:-shift])
        g = g | (p & g_prev)
        p = p & p_prev
        shift *= 2
    carry_in = jnp.zeros_like(g).at[1:].set(g[:-1])
    return (t + carry_in.astype(jnp.uint32)) & MASK


def _ge_cols(a: jnp.ndarray, b_const: np.ndarray) -> jnp.ndarray:
    """a >= b (per column) for a [16, T] against constant limbs b [16]."""
    res = jnp.zeros(a.shape[1:], dtype=jnp.int32)
    for i in range(a.shape[0] - 1, -1, -1):
        ai = a[i].astype(jnp.int32)
        bi = jnp.int32(int(b_const[i]))
        d = jnp.sign(ai - bi)
        res = jnp.where(res != 0, res, d)
    return res >= 0


def _mul_mod_kernel(a_ref, b_ref, o_ref):
    a = a_ref[:]                     # [16, T]
    b = b_ref[:]
    T = a.shape[1]

    # schoolbook product columns (each limb product exact in uint32)
    acc = jnp.zeros((32, T), jnp.uint32)
    for i in range(16):
        prod = a[i][None, :] * b     # [16, T]
        lo = prod & MASK
        hi = prod >> 16
        acc = acc.at[i:i + 16].add(lo)
        acc = acc.at[i + 1:i + 17].add(hi)
    w = _carry_cols(acc)             # [32, T] normalized

    C = fp.FOLD_C_LIMBS              # [3] host constants
    Cj = [jnp.uint32(int(C[k])) for k in range(3)]

    def mul_c(h, out_rows):          # h [m, T] * C into [out_rows, T] columns
        m = h.shape[0]
        acc = jnp.zeros((out_rows, T), jnp.uint32)
        for k in range(3):
            prod = h * Cj[k]
            acc = acc.at[k:k + m].add(prod & MASK)
            acc = acc.at[k + 1:k + m + 1].add(prod >> 16)
        return acc

    # fold 1: lo + hi*C  (< 2^298 -> 19 limbs)
    t1 = _carry_cols(mul_c(w[16:], 19).at[:16].add(w[:16]))
    # fold 2 (< 2^256 + 2^84 -> 17 limbs)
    t2 = _carry_cols(mul_c(t1[16:19], 17).at[:16].add(t1[:16]))
    # folds 3+4: top limb in {0,1}
    for _ in range(2):
        top = t2[16]
        acc3 = jnp.zeros((17, T), jnp.uint32).at[:16].set(t2[:16])
        for k in range(3):
            prod = top * Cj[k]
            acc3 = acc3.at[k].add(prod & MASK)
            acc3 = acc3.at[k + 1].add(prod >> 16)
        t2 = _carry_cols(acc3)
    r = t2[:16]

    # canonical subtract of p where r >= p (constants as python scalars --
    # pallas kernels cannot capture device constant arrays)
    P = fp.P_LIMBS
    ge = _ge_cols(r, P)
    rows = [r[i] + jnp.uint32(0xFFFF - int(P[i])) for i in range(16)]
    s = jnp.stack(rows)
    s = s.at[0].add(jnp.uint32(1))
    s = _carry_cols(s)
    o_ref[:] = jnp.where(ge[None, :], s, r)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mul_mod_t(a_t: jnp.ndarray, b_t: jnp.ndarray, interpret: bool = False):
    """Limb-major fused modmul: [16, N] x [16, N] -> [16, N] canonical.
    N must be a multiple of LANE_TILE."""
    n = a_t.shape[1]
    assert n % LANE_TILE == 0, n
    grid = (n // LANE_TILE,)
    spec = pl.BlockSpec((16, LANE_TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mul_mod_kernel,
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a_t, b_t)


def mul_mod(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Drop-in fused replacement for field.mul_mod on [..., 16] arrays.

    Pads the flattened batch to a LANE_TILE multiple; layout adapters cost
    ~128 B/element of traffic vs the multi-KB intermediates they replace.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    lead = shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    npad = -(-n // LANE_TILE) * LANE_TILE
    a2 = a.reshape(n, 16)
    b2 = b.reshape(n, 16)
    if npad != n:
        a2 = jnp.concatenate([a2, jnp.zeros((npad - n, 16), jnp.uint32)])
        b2 = jnp.concatenate([b2, jnp.zeros((npad - n, 16), jnp.uint32)])
    out_t = mul_mod_t(a2.T, b2.T, interpret=interpret)
    return out_t.T[:n].reshape(shape)
