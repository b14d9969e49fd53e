"""Kernel-level parity: the barycentric FRI row evaluation vs the oracle's
coefficient path (multi_interp_4 + eval_quartic), including node collisions.

The device pipeline no longer forms coefficient vectors, so this test pins
that the evaluated values stay bit-identical to the reference algorithm
(reference: src/utils.rs:196-244, 103-120)."""

import random

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from stark_verifier_tpu import fp
from stark_verifier_tpu.config import StarkConfig, StatementTables, cached_tables

P = fp.MODULUS
rng = random.Random(31337)


def _eval_device(e1_list, ys_rows, sx_int):
    """Run the gather-table + inversion-free barycentric path exactly as the
    verifier does (quartic.eval4_inv_free with x1^-3 gathered)."""
    from stark_verifier_tpu.ops import quartic
    tables = cached_tables(StarkConfig())
    g2t = jnp.asarray(tables.g2_powers)
    e1 = jnp.asarray(np.array(e1_list, dtype=np.uint32))          # [G]
    offs = jnp.arange(4, dtype=jnp.uint32) * jnp.uint32(16384)
    nodes = jnp.take(g2t, (e1[:, None] + offs) & jnp.uint32(65535), axis=0)
    x1cb_inv = jnp.take(
        g2t, (jnp.uint32(0) - jnp.uint32(3) * e1) & jnp.uint32(65535), axis=0)
    ys = jnp.asarray(np.stack([fp.ints_to_limbs(r) for r in ys_rows]))
    sx = jnp.asarray(fp.int_to_limbs(sx_int % (1 << 256)))
    f = jax.jit(lambda n, c, y, s: quartic.eval4_inv_free(
        n, c, jnp.asarray(oracle.quartic_weight_consts(
            tables.G2, 65536)[1]), y, s))
    out = f(nodes, x1cb_inv, ys, sx)
    return [fp.limbs_to_int(r) for r in np.asarray(out)]


def _eval_device_legacy(e1_list, ys_rows, sx_int):
    """The coefficient-era barycentric path (kept as a second implementation
    check: both must match the oracle)."""
    from stark_verifier_tpu.ops import quartic
    tables = cached_tables(StarkConfig())
    g2t = jnp.asarray(tables.g2_powers)
    e1 = jnp.asarray(np.array(e1_list, dtype=np.uint32))          # [G]
    offs = jnp.arange(4, dtype=jnp.uint32) * jnp.uint32(16384)
    nodes = jnp.take(g2t, (e1[:, None] + offs) & jnp.uint32(65535), axis=0)
    x1cb = jnp.take(g2t, (jnp.uint32(3) * e1) & jnp.uint32(65535), axis=0)
    ys = jnp.asarray(np.stack([fp.ints_to_limbs(r) for r in ys_rows]))
    sx = jnp.asarray(fp.int_to_limbs(sx_int % (1 << 256)))
    f = jax.jit(lambda n, c, y, s: quartic.eval_interp4_nodes(
        n, c, jnp.asarray(oracle.quartic_weight_consts(
            tables.G2, 65536)[0]), y, s))
    out = f(nodes, x1cb, ys, sx)
    return [fp.limbs_to_int(r) for r in np.asarray(out)]


def _eval_device_eo(e1_list, ys_rows, sx_int):
    """The even/odd-split path (quartic.eval4_even_odd) exactly as the
    verifier gathers it: x1^-1 and x1^-2 from the power table."""
    from stark_verifier_tpu.ops import quartic
    tables = cached_tables(StarkConfig())
    g2t = jnp.asarray(tables.g2_powers)
    e1 = jnp.asarray(np.array(e1_list, dtype=np.uint32))          # [G]
    x1_inv = jnp.take(g2t, (jnp.uint32(0) - e1) & jnp.uint32(65535), axis=0)
    x1sq_inv = jnp.take(
        g2t, (jnp.uint32(0) - jnp.uint32(2) * e1) & jnp.uint32(65535), axis=0)
    ys = jnp.asarray(np.stack([fp.ints_to_limbs(r) for r in ys_rows]))
    sx = jnp.asarray(fp.int_to_limbs(sx_int % (1 << 256)))
    f = jax.jit(lambda xi, xsi, y, s: quartic.eval4_even_odd(
        xi, xsi, y, s, jnp.asarray(tables.quartic_ginv),
        jnp.asarray(tables.inv4)))
    out = f(x1_inv, x1sq_inv, ys, sx)
    return [fp.limbs_to_int(r) for r in np.asarray(out)]


def _eval_oracle(e1_list, ys_rows, sx_int):
    tables = cached_tables(StarkConfig())
    G2 = tables.G2
    qr = [1, pow(G2, 16384, P), pow(G2, 32768, P), pow(G2, 49152, P)]
    xs, ys = [], []
    for e1, row in zip(e1_list, ys_rows):
        x1 = pow(G2, e1, P)
        xs += [q * x1 % P for q in qr]
        ys += row
    polys = oracle.multi_interp_4(xs, ys)
    return [oracle.eval_quartic(polys[4 * g: 4 * g + 4], sx_int)
            for g in range(len(e1_list))]


def test_interp4_coefficients_match_oracle():
    """The coefficient-form C10 API (quartic.interp4 + eval_quartic) matches
    the reference algorithm exactly: same coefficient vectors as
    multi_interp_4 (utils.rs:196-244) and the same evaluation."""
    from stark_verifier_tpu.ops import quartic
    G = 6
    xs_int = [[rng.randrange(P) for _ in range(4)] for _ in range(G)]
    ys_int = [[rng.randrange(1 << 256) for _ in range(4)] for _ in range(G)]
    sx = rng.randrange(1 << 256)
    xs = jnp.asarray(np.stack([fp.ints_to_limbs(r) for r in xs_int]))
    ys = jnp.asarray(np.stack([fp.ints_to_limbs(r) for r in ys_int]))
    coeffs = quartic.interp4(xs, ys)                     # [G, 4, 16]
    want = oracle.multi_interp_4([x for r in xs_int for x in r],
                                 [y for r in ys_int for y in r])
    got = [fp.limbs_to_int(c) for g in np.asarray(coeffs) for c in g]
    assert got == want
    ev = quartic.eval_quartic(coeffs, jnp.asarray(
        fp.int_to_limbs(sx % (1 << 256))))
    assert ([fp.limbs_to_int(r) for r in np.asarray(ev)]
            == [oracle.eval_quartic(want[4 * g: 4 * g + 4], sx)
                for g in range(G)])


def test_barycentric_matches_coefficient_path():
    G = 12
    e1 = [rng.randrange(65536) for _ in range(G)]
    rows = [[rng.randrange(1 << 256) for _ in range(4)] for _ in range(G)]
    sx = rng.randrange(1 << 256)    # raw unreduced special_x, like the roots
    want = _eval_oracle(e1, rows, sx)
    assert _eval_device(e1, rows, sx) == want
    assert _eval_device_legacy(e1, rows, sx) == want
    assert _eval_device_eo(e1, rows, sx) == want


def test_barycentric_node_collision():
    """special_x landing exactly on an interpolation node must return that
    node's value (canonical) -- as the coefficient path does."""
    tables = cached_tables(StarkConfig())
    e1 = [123, 456]
    rows = [[rng.randrange(P) for _ in range(4)] for _ in range(2)]
    # sx = second node of group 0: q_1 * G2^123 = G2^(16384+123)
    sx = pow(tables.G2, 16384 + 123, P)
    got = _eval_device(e1, rows, sx)
    exp = _eval_oracle(e1, rows, sx)
    assert got == exp
    assert got[0] == rows[0][1] % P
    # the even/odd form is polynomial in sx -- exact at nodes with no select
    assert _eval_device_eo(e1, rows, sx) == exp
