"""Pallas TPU kernel for the fused FRI row check (even/odd-split form).

The FRI row interpolant's nodes are q_i * x1 with q = (1, g, g^2, g^3) the
quartic roots of unity and g^2 = -1 (stale-root quirk: identical at every
level, SURVEY 2.2.5), so the cubic through the four row values splits into
even/odd parts LINEAR in z^2 (see ops/quartic.eval4_even_odd for the
derivation):

    4 * P(sx) = (y0+y1+y2+y3)
              + ((y0+y2) - (y1+y3)) * v
              + ((y0-y2) + c1 + ((y0-y2) - c1) * v) * u      [Horner in v]
    c1 = (y1 - y3) * g^{-1},  u = sx / x1,  v = sx^2 / x1^2

This is 7 modular multiplies per row group (5 full + 2 constant) versus ~15
for the barycentric form the first kernel generation used, needs no nodes
gather, no barycentric weights, and no sx==node coincidence select
(polynomial in sx, exact everywhere).  Under XLA each multiply's MXU column
matmul forces its elementwise neighbours into separate fusions (every
[N, 16] intermediate round-trips HBM); this kernel keeps the whole chain in
VMEM.

The kernel speaks the WIRE encoding on both ends: row values enter as the
proof's 8-word big-endian rows and the result leaves as 8 BE words, with the
word<->limb conversions (field.words_be_to_limbs / limbs_to_words_be) done
in VMEM -- that halves the kernel's HBM input AND output traffic and deletes
the standalone conversion fusions that used to sit between the proof arrays
and the kernel (docs/PERF.md round-4 "glue" lever).  Comparing the returned
words against the committed column-value words is equivalent to the limb
comparison: the encoding is bijective.

Layout and Mosaic constraints follow ops/field_pallas.py (limb-major
[16, T] tiles, no scatters, no boolean vectors); g^{-1} and 4^{-1} are
STATIC per statement family and baked in as scalar limb constants.

Bit-exact semantics of the reference's multi_interp_4 + eval_quartic
(reference: /root/reference/src/utils.rs:196-244, 103-120): same polynomial,
evaluated mod p.  Enabled in the verifier via STARK_PALLAS=1
(field.pallas_enabled); golden-tested against the XLA path and the oracle in
tests/test_fri_pallas.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field_pallas import (
    MASK, _add_canon, _canon_cols, _fold_canon, _mul_cols, _mul_cols_const,
    _shift_rows, _sub_canon)

LANE_TILE = 512          # row groups per grid step


def _words_to_limb_rows(w: jnp.ndarray) -> jnp.ndarray:
    """VMEM mirror of field.words_be_to_limbs: [8, T] LE word rows of a
    32-byte big-endian value -> [16, T] limb rows.  bswap each word (pure
    shifts/masks), reverse group order, split into 16-bit halves -- all
    static row concats, no gathers."""
    m8, m16 = jnp.uint32(0xFF), jnp.uint32(0xFF00)
    sw = (((w & m8) << 24) | ((w & m16) << 8)
          | ((w >> 8) & m16) | (w >> 24))
    rows = []
    for k in range(8):                   # group k = least significant 32 bits
        g = sw[7 - k][None, :]
        rows.append(g & jnp.uint32(MASK))
        rows.append(g >> 16)
    return jnp.concatenate(rows, axis=0)


def _limb_rows_to_words(l: jnp.ndarray) -> jnp.ndarray:
    """VMEM mirror of field.limbs_to_words_be: [16, T] limb rows (< 2^16)
    -> [8, T] LE word rows of the big-endian encoding."""
    m8, m16 = jnp.uint32(0xFF), jnp.uint32(0xFF00)
    rows = []
    for j in range(8):
        k = 7 - j
        g = (l[2 * k] | (l[2 * k + 1] << 16))[None, :]
        rows.append((((g & m8) << 24) | ((g & m16) << 8)
                     | ((g >> 8) & m16) | (g >> 24)))
    return jnp.concatenate(rows, axis=0)


@functools.lru_cache(maxsize=4)
def _make_row_kernel(ginv_limbs: tuple, inv4_limbs: tuple):
    """ginv_limbs/inv4_limbs: 16-tuples of ints -- g^{-1} = g^3 and 4^{-1}."""

    def kernel(ysw_ref, sx_ref, s2_ref, x1i_ref, x1sqi_ref, o_ref):
        # ysw [32, T] (4 stacked 8-word raw BE rows); sx/s2 [16, T] canonical
        # (special_x and its square, shared per level, broadcast per group);
        # x1i/x1sqi [16, T] = x1^{-1}, x1^{-2} power-table gathers
        ysw = ysw_ref[:]
        y = [_canon_cols(_words_to_limb_rows(ysw[8 * i:8 * (i + 1)]))
             for i in range(4)]
        s02 = _add_canon(y[0], y[2])
        s13 = _add_canon(y[1], y[3])
        d02 = _sub_canon(y[0], y[2])
        c1 = _fold_canon(_mul_cols_const(_sub_canon(y[1], y[3]), ginv_limbs))
        sa = _add_canon(s02, s13)
        da = _sub_canon(s02, s13)
        e = _add_canon(d02, c1)
        f = _sub_canon(d02, c1)
        st = _fold_canon(_mul_cols(s2_ref[:], x1sqi_ref[:]))   # v = sx^2/x1^2
        sxx = _fold_canon(_mul_cols(sx_ref[:], x1i_ref[:]))    # u = sx /x1
        # Horner in v: e*u + f*u*v == (e + f*v)*u -- one full mul saved
        efv = _add_canon(e, _fold_canon(_mul_cols(f, st)))
        # the two products and sa share ONE fold (rows < 2*2^21 + 2^16)
        acc = _mul_cols(da, st) + _mul_cols(efv, sxx)
        acc = acc + _shift_rows(sa, 0, 33)
        s = _fold_canon(acc)
        o_ref[:] = _limb_rows_to_words(_fold_canon(_mul_cols_const(
            s, inv4_limbs)))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ginv_limbs", "inv4_limbs", "interpret"))
def _rows_t(ysw_t, sx_t, s2_t, x1i_t, x1sqi_t, ginv_limbs: tuple,
            inv4_limbs: tuple, interpret: bool = False):
    """Limb-major fused row check: ysw [32, N] BE word rows,
    sx/s2/x1i/x1sqi [16, N] -> [8, N] BE word rows of the canonical
    evaluations.  N must be a LANE_TILE multiple.

    PRECONDITION: sx/s2/x1i/x1sqi must already be CANONICAL limbs -- the
    kernel multiplies them without an internal _canon_cols pass (only the raw
    ysw rows are canonicalized in-kernel); eval4_rows establishes this via
    F.canon(sx)/sqr_mod and the power-table gathers (tables are canonical by
    construction).  Feeding raw limbs here computes wrong residues."""
    n = sx_t.shape[1]
    if n % LANE_TILE:
        raise ValueError(f"N={n} must be a LANE_TILE multiple")
    grid = (n // LANE_TILE,)

    def spec(rows):
        return pl.BlockSpec((rows, LANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_row_kernel(ginv_limbs, inv4_limbs),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.uint32),
        grid=grid,
        in_specs=[spec(32), spec(16), spec(16), spec(16), spec(16)],
        out_specs=spec(8),
        interpret=interpret,
    )(ysw_t, sx_t, s2_t, x1i_t, x1sqi_t)


def eval4_rows(x1_inv, x1sq_inv, ys_words, sx, ginv_np, inv4_np,
               interpret: bool = False):
    """Fused replacement for words_be_to_limbs + quartic.eval4_even_odd
    + limbs_to_words_be, wire encoding on both ends.

    x1_inv/x1sq_inv [..., G, 16] canonical power-table gathers; ys_words
    [..., G, 4, 8] raw proof word rows (fri["poly_value"] regrouped by
    query); sx [..., 16] raw, broadcast over G; ginv_np/inv4_np [16] HOST
    (numpy) constants g^{-1}, 4^{-1}.  Returns [..., G, 8] BE words of the
    canonical evaluation -- compare directly against the committed column
    value words (bijective encoding)."""
    from . import field as F
    ginv_limbs = tuple(int(x) for x in np.asarray(ginv_np))
    inv4_limbs = tuple(int(x) for x in np.asarray(inv4_np))
    sxc = F.canon(sx)                       # per level (tiny XLA prologue)
    s2 = F.sqr_mod(sxc)
    lead = x1_inv.shape[:-1]                # [..., G]
    sx_b = jnp.broadcast_to(sxc[..., None, :], lead + (16,))
    s2_b = jnp.broadcast_to(s2[..., None, :], lead + (16,))
    n = int(np.prod(lead)) if lead else 1
    npad = -(-n // LANE_TILE) * LANE_TILE

    def flat(x, tail):
        x = x.reshape((n,) + tail)
        if npad != n:
            x = jnp.concatenate(
                [x, jnp.zeros((npad - n,) + tail, jnp.uint32)])
        return x

    out_t = _rows_t(flat(ys_words, (32,)).T, flat(sx_b, (16,)).T,
                    flat(s2_b, (16,)).T, flat(x1_inv, (16,)).T,
                    flat(x1sq_inv, (16,)).T, ginv_limbs, inv4_limbs,
                    interpret=interpret)
    return out_t.T[:n].reshape(lead + (8,))
