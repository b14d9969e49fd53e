"""Pallas TPU kernel for the fused FRI row check.

quartic.eval4_inv_free under XLA is ~13 modular multiplies per row group,
and each multiply's MXU column matmul forces its elementwise neighbours
into separate fusions -- every intermediate [N, 16] limb array (and the
[N, 512] f32 product columns) round-trips HBM.  This kernel evaluates the
whole inversion-free barycentric chain

    P(sx) = [ sum_i (y_i * winv_i) * prod_{j != i} (sx - x_j) ] * x1^-3

for a row group in ONE kernel: the four node-difference residues, both
pair products, the four "others" products, the four weighted rows, the
single-fold 4-term sum and the final x1^-3 product all live in VMEM.  Per
group it reads 10x64 B of operands and writes 64 B -- vs ~3 KB of HBM
intermediates per multiply on the XLA path.

Layout and Mosaic constraints follow ops/field_pallas.py (limb-major
[16, T] tiles, no scatters, no boolean vectors); the barycentric weight
inverses winv_i are STATIC per statement family, so they are baked into
the kernel as scalar limb constants.

Bit-exact semantics of quartic.eval4_inv_free (reference:
/root/reference/src/utils.rs:196-244, 103-120), including the sx==node
coincidence select.  Enabled in the verifier via STARK_PALLAS=1
(field.pallas_enabled); golden-tested against the XLA path in
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
    MASK, _canon_cols, _fold_canon, _mul_cols, _mul_cols_const, _sub_canon,
    _sum_rows)

LANE_TILE = 512          # row groups per grid step


def _is_zero_bit(v: jnp.ndarray) -> jnp.ndarray:
    """[16, T] canonical residue -> [1, T] uint32 1 where the value is 0.
    Row sum < 2^20, so (0 - s) >> 31 is the s != 0 indicator."""
    s = _sum_rows(v)
    return jnp.uint32(1) - ((jnp.uint32(0) - s) >> 31)


@functools.lru_cache(maxsize=4)
def _make_row_kernel(winv_limbs: tuple):
    """winv_limbs: 4-tuple of 16-tuples of ints -- the static barycentric
    weight inverses 1/prod_{j != i}(q_i - q_j) (host-inverted)."""

    def kernel(nodes_ref, ys_ref, x1ci_ref, sx_ref, o_ref):
        # nodes/ys [64, T] (4 stacked 16-limb values), x1ci/sx [16, T]
        sxc = _canon_cols(sx_ref[:])                 # raw special_x -> canon
        nodes = nodes_ref[:]
        ys = ys_ref[:]
        d = [_sub_canon(sxc, nodes[16 * i:16 * (i + 1)]) for i in range(4)]

        d01 = _fold_canon(_mul_cols(d[0], d[1]))
        d23 = _fold_canon(_mul_cols(d[2], d[3]))
        others = (_fold_canon(_mul_cols(d[1], d23)),
                  _fold_canon(_mul_cols(d[0], d23)),
                  _fold_canon(_mul_cols(d01, d[3])),
                  _fold_canon(_mul_cols(d01, d[2])))
        # the 4 barycentric terms share ONE fold (sum rows < 2^23)
        acc = _mul_cols(_fold_canon(_mul_cols_const(
            ys[0:16], winv_limbs[0])), others[0])
        for i in range(1, 4):
            yw = _fold_canon(_mul_cols_const(
                ys[16 * i:16 * (i + 1)], winv_limbs[i]))
            acc = acc + _mul_cols(yw, others[i])
        ssum = _fold_canon(acc)
        lhs = _fold_canon(_mul_cols(ssum, x1ci_ref[:]))

        # sx == node coincidence: the interpolant's value there is that
        # node's y (canonicalized); nodes are distinct so at most one hits
        hits = [_is_zero_bit(di) for di in d]
        any_hit = hits[0] | hits[1] | hits[2] | hits[3]
        y_sel = jnp.zeros_like(lhs)
        for i in range(4):
            m = jnp.uint32(0) - hits[i]              # all-ones where hit
            y_sel = y_sel | (ys[16 * i:16 * (i + 1)] & m)
        y_hit = _canon_cols(y_sel)
        ma = jnp.uint32(0) - any_hit
        o_ref[:] = (y_hit & ma) | (lhs & ~ma)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("winv_limbs", "interpret"))
def _rows_t(nodes_t, ys_t, x1ci_t, sx_t, winv_limbs: tuple,
            interpret: bool = False):
    """Limb-major fused row check: nodes/ys [64, N], x1ci/sx [16, N] ->
    [16, N] canonical evaluations.  N must be a LANE_TILE multiple."""
    n = sx_t.shape[1]
    assert n % LANE_TILE == 0, n
    grid = (n // LANE_TILE,)

    def spec(rows):
        return pl.BlockSpec((rows, LANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_row_kernel(winv_limbs),
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
        grid=grid,
        in_specs=[spec(64), spec(64), spec(16), spec(16)],
        out_specs=spec(16),
        interpret=interpret,
    )(nodes_t, ys_t, x1ci_t, sx_t)


def eval4_rows(nodes, x1cb_inv, winv_np, ys, sx, interpret: bool = False):
    """Drop-in fused replacement for quartic.eval4_inv_free.

    nodes [..., G, 4, 16] canonical; x1cb_inv [..., G, 16]; winv_np [4, 16]
    HOST (numpy) weight-inverse constants; ys [..., G, 4, 16] raw rows;
    sx [..., 16] raw, broadcast over G.  Returns [..., G, 16] canonical.
    """
    winv_limbs = tuple(tuple(int(x) for x in row) for row in
                       np.asarray(winv_np))
    lead = nodes.shape[:-2]                          # [..., G]
    sx_b = jnp.broadcast_to(sx[..., None, :], lead + (16,))
    n = int(np.prod(lead)) if lead else 1
    npad = -(-n // LANE_TILE) * LANE_TILE

    def flat(x, tail):
        x = x.reshape((n,) + tail)
        if npad != n:
            x = jnp.concatenate(
                [x, jnp.zeros((npad - n,) + tail, jnp.uint32)])
        return x

    nodes_t = flat(nodes, (64,)).T                   # [64, N]
    ys_t = flat(ys, (64,)).T
    x1ci_t = flat(x1cb_inv, (16,)).T
    sx_t = flat(sx_b, (16,)).T
    out_t = _rows_t(nodes_t, ys_t, x1ci_t, sx_t, winv_limbs,
                    interpret=interpret)
    return out_t.T[:n].reshape(lead + (16,))
