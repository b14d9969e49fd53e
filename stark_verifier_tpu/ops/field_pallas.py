"""Pallas TPU kernel for fused 256-bit modular multiplication.

The XLA lowering of ops/field.mul_mod materializes the limb product columns
and fold intermediates in HBM -- several KB of memory traffic per multiply.
This kernel keeps the whole schoolbook product, the carry-pass-minimal fold
chain (same derivation as field._fold_cols), and the +C canonical select in
VMEM/registers: per multiply it reads 128 B of operands and writes 64 B.

Layout: limb-major [16, N] tiles (limbs on the sublane axis, batch on the
lane axis), so every per-limb row is a contiguous vector.  The public
wrapper accepts/returns the framework's [..., 16] layout and adapts.

Mosaic notes (learned from tools/pallas_repro.py): slice-accumulation
(`x.at[i:j].add`) lowers to scatter-add, which Mosaic does not implement --
every shifted add here is therefore built as a zero-pad concatenate, which
lowers to cheap sublane shifts.

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
_C0, _C1, _C2 = (int(c) for c in fp.FOLD_C_LIMBS)


def _shift_rows(v: jnp.ndarray, k: int, out_rows: int) -> jnp.ndarray:
    """[r, T] -> [out_rows, T] with out[i] = v[i - k] (zeros elsewhere).
    Pure concatenate -- no scatter."""
    r = v.shape[0]
    parts = []
    if k > 0:
        parts.append(jnp.zeros((k, v.shape[1]), v.dtype))
    take = min(r, out_rows - k)
    parts.append(v[:take])
    pad = out_rows - k - take
    if pad > 0:
        parts.append(jnp.zeros((pad, v.shape[1]), v.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _carry_cols(v: jnp.ndarray) -> jnp.ndarray:
    """Normalize limb columns (< 2^27) along axis 0 of [n, T]; exact, no
    control flow (same Kogge-Stone derivation as field._carry_fix,
    limb-major and scatter-free).

    The generate/propagate lanes are kept as uint32 0/1 values -- Mosaic
    rejects vector-mask register casts ("Invalid vector register cast"), so
    no boolean vectors appear anywhere."""
    n = v.shape[0]
    c = v >> 16
    lo = v & MASK
    s = lo + _shift_rows(c, 1, n)            # top carry drops (mod 2^(16n))
    g = s >> 16                              # generate: 0/1 (s < 2^17)
    t = s & MASK
    p = (t + 1) >> 16                        # propagate: 1 iff t == 0xFFFF
    shift = 1
    while shift < n:
        g = g | (p & _shift_rows(g, shift, n))
        p = p & _shift_rows(p, shift, n)
        shift *= 2
    carry_in = _shift_rows(g, 1, n)
    return (t + carry_in) & MASK


def _acc_mul_c(acc: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """acc += C * m for UNNORMALIZED m [rm, T] (limbs < 2^25), with C's three
    16-bit limbs multiplying m's on-the-fly 16-bit split (field._acc_mul_c,
    limb-major)."""
    rows = acc.shape[0]
    m_lo = m & MASK
    m_hi = m >> 16
    for k, c in enumerate((_C0, _C1, _C2)):
        cu = jnp.uint32(c)
        p_lo = m_lo * cu
        acc = acc + _shift_rows(p_lo & MASK, k, rows)
        acc = acc + _shift_rows(p_lo >> 16, k + 1, rows)
        acc = acc + _shift_rows(m_hi * cu, k + 1, rows)
    return acc


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product columns of two [16, T] limb tiles -> [33, T]
    (rows < 2^21, each 16x16-bit limb product exact in uint32)."""
    acc = jnp.zeros((33, a.shape[1]), jnp.uint32)
    for i in range(16):
        prod = a[i][None, :] * b     # [16, T]
        acc = acc + _shift_rows(prod & MASK, i, 33)
        acc = acc + _shift_rows(prod >> 16, i + 1, 33)
    return acc


def _mul_cols_const(a: jnp.ndarray, bw) -> jnp.ndarray:
    """Product columns of a [16, T] tile with a STATIC 16-limb constant
    (tuple of python ints < 2^16); zero limbs are skipped at trace time."""
    acc = jnp.zeros((33, a.shape[1]), jnp.uint32)
    for i, c in enumerate(bw):
        if c == 0:
            continue
        prod = a * jnp.uint32(c)     # [16, T] exact
        acc = acc + _shift_rows(prod & MASK, i, 33)
        acc = acc + _shift_rows(prod >> 16, i + 1, 33)
    return acc


def _fold_canon(acc: jnp.ndarray) -> jnp.ndarray:
    """Reduce [33, T] product columns (rows < 2^25: a single product, or a
    sum of up to 16 of them) to the canonical [16, T] residue -- limb-major
    mirror of field._fold_cols."""
    T = acc.shape[1]
    # fold 1: lo + C * hi           (rows < 2^23.2)
    f1 = _acc_mul_c(_shift_rows(acc[:16], 0, 20), acc[16:33])
    # fold 2: + C * top-4           (rows < 2^25.4)
    f2 = _acc_mul_c(_shift_rows(f1[:16], 0, 17), f1[16:20])
    t = _carry_cols(f2)              # [17, T] normalized; t[16] < 2^14

    # fold 3: v = t[:16] + C * t[16]  (rows < 2^17.2), u = v + C; normalize
    # both, select on u's carry-out (v >= p  <=>  u >= 2^256)
    t16 = t[16][None, :]
    v = t[:16]
    for k, c in enumerate((_C0, _C1, _C2)):
        p = t16 * jnp.uint32(c)      # [1, T] < 2^30
        v = v + _shift_rows(p & MASK, k, 16)
        v = v + _shift_rows(p >> 16, k + 1, 16)
    cvec = jnp.concatenate(
        [jnp.full((1, T), np.uint32(c), jnp.uint32) for c in (_C0, _C1, _C2)]
        + [jnp.zeros((13, T), jnp.uint32)], axis=0)
    v17 = _shift_rows(v, 0, 17)
    u17 = _shift_rows(v + cvec, 0, 17)
    vn = _carry_cols(v17)
    un = _carry_cols(u17)
    return jnp.where(un[16][None, :] > 0, un[:16], vn[:16])


def _canon_cols(v: jnp.ndarray) -> jnp.ndarray:
    """[16, T] normalized limbs (any value < 2^256) -> canonical residue.
    v >= p  <=>  v + C >= 2^256  (p = 2^256 - C): one carry pass + select."""
    T = v.shape[1]
    cvec = jnp.concatenate(
        [jnp.full((1, T), np.uint32(c), jnp.uint32) for c in (_C0, _C1, _C2)]
        + [jnp.zeros((13, T), jnp.uint32)], axis=0)
    un = _carry_cols(_shift_rows(v + cvec, 0, 17))
    return jnp.where(un[16][None, :] > 0, un[:16], v)


_P16 = tuple(int(x) for x in fp.P_LIMBS)


def _sub_canon(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for canonical [16, T] tiles, canonical output.

    t = a + ~b + 1 (17 rows): carry-out set  <=>  a >= b; on borrow add p
    back (adding p mod 2^256 == subtracting C, and the 2^256 overflow drops).
    """
    T = a.shape[1]
    # +1 enters as a row-0 concat, not .at[0].add (no scatters in Mosaic)
    t = a + (jnp.uint32(MASK) - b) + _shift_rows(
        jnp.ones((1, T), jnp.uint32), 0, 16)
    tc = _carry_cols(_shift_rows(t, 0, 17))
    r1 = tc[:16]
    pvec = jnp.concatenate(
        [jnp.full((1, T), np.uint32(c), jnp.uint32) for c in _P16], axis=0)
    u = _carry_cols(_shift_rows(r1 + pvec, 0, 17))
    return jnp.where(tc[16][None, :] > 0, r1, u[:16])


def _add_canon(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for canonical [16, T] tiles, canonical output.

    s = a + b < 2p; s >= p  <=>  s + C >= 2^256 (p = 2^256 - C), so
    normalize s and s + C in ONE lane-stacked [17, 2T] carry pass and select
    on the +C copy's carry-out (limb-major mirror of field.add_mod)."""
    T = a.shape[1]
    s = a + b                                # rows < 2^17
    cvec = jnp.concatenate(
        [jnp.full((1, T), np.uint32(c), jnp.uint32) for c in (_C0, _C1, _C2)]
        + [jnp.zeros((13, T), jnp.uint32)], axis=0)
    w = jnp.concatenate([_shift_rows(s, 0, 17),
                         _shift_rows(s + cvec, 0, 17)], axis=1)
    wn = _carry_cols(w)
    sn, un = wn[:, :T], wn[:, T:]
    return jnp.where(un[16][None, :] > 0, un[:16], sn[:16])


def _sum_rows(v: jnp.ndarray) -> jnp.ndarray:
    """Sum [r, T] rows -> [1, T].  Unrolled adds: Mosaic does not implement
    reductions over unsigned integers (jnp.sum on uint32 fails to lower)."""
    s = v[0]
    for i in range(1, v.shape[0]):
        s = s + v[i]
    return s[None, :]


def _mul_mod_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = _fold_canon(_mul_cols(a_ref[:], b_ref[:]))


@functools.partial(jax.jit, static_argnames=("interpret",))
def mul_mod_t(a_t: jnp.ndarray, b_t: jnp.ndarray, interpret: bool = False):
    """Limb-major fused modmul: [16, N] x [16, N] -> [16, N] canonical.
    N must be a multiple of LANE_TILE."""
    n = a_t.shape[1]
    if n % LANE_TILE:
        raise ValueError(f"N={n} must be a LANE_TILE multiple")
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
