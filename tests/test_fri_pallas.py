"""Interpret-mode golden tests: fused Pallas FRI row kernel (even/odd-split
form) vs the XLA path (quartic.eval4_even_odd), the independent barycentric
formulation (quartic.eval4_inv_free), and the oracle's coefficient path --
on STRUCTURED nodes q_i * x1 exactly as the verifier gathers them."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from stark_verifier_tpu import fp
from stark_verifier_tpu.config import StarkConfig, cached_tables
from stark_verifier_tpu.ops import field as F, fri_pallas, quartic

P = fp.MODULUS
rng = random.Random(0x4A11)


@pytest.fixture(autouse=True)
def _tiny_tiles(monkeypatch):
    monkeypatch.setattr(fri_pallas, "LANE_TILE", 128)


def _structured(G, sx_int):
    """(x1_inv, x1sq_inv, nodes, x1cb_inv, ys, sx) device arrays for G random
    row groups on the real statement's power table."""
    tables = cached_tables(StarkConfig())
    g2t = jnp.asarray(tables.g2_powers)
    e1_list = [rng.randrange(65536) for _ in range(G)]
    e1 = jnp.asarray(np.array(e1_list, dtype=np.uint32))
    mask = jnp.uint32(65535)
    x1_inv = jnp.take(g2t, (jnp.uint32(0) - e1) & mask, axis=0)
    x1sq_inv = jnp.take(g2t, (jnp.uint32(0) - jnp.uint32(2) * e1) & mask,
                        axis=0)
    offs = jnp.arange(4, dtype=jnp.uint32) * jnp.uint32(16384)
    nodes = jnp.take(g2t, (e1[:, None] + offs) & mask, axis=0)
    x1cb_inv = jnp.take(g2t, (jnp.uint32(0) - jnp.uint32(3) * e1) & mask,
                        axis=0)
    rows = [[rng.randrange(1 << 256) for _ in range(4)] for _ in range(G)]
    ys = jnp.asarray(np.stack([fp.ints_to_limbs(r) for r in rows]))
    sx = jnp.asarray(fp.int_to_limbs(sx_int % (1 << 256)))
    return tables, e1_list, rows, x1_inv, x1sq_inv, nodes, x1cb_inv, ys, sx


def _oracle_eval(tables, e1_list, rows, sx_int):
    G2 = tables.G2
    qr = [1, pow(G2, 16384, P), pow(G2, 32768, P), pow(G2, 49152, P)]
    xs, ys = [], []
    for e1, row in zip(e1_list, rows):
        x1 = pow(G2, e1, P)
        xs += [q * x1 % P for q in qr]
        ys += row
    polys = oracle.multi_interp_4(xs, ys)
    return [oracle.eval_quartic(polys[4 * g: 4 * g + 4], sx_int)
            for g in range(len(e1_list))]


def _check(G, sx_int):
    (tables, e1_list, rows, x1_inv, x1sq_inv, nodes, x1cb_inv, ys,
     sx) = _structured(G, sx_int)
    want = _oracle_eval(tables, e1_list, rows, sx_int)
    ginv = np.asarray(tables.quartic_ginv)
    inv4 = np.asarray(tables.inv4)

    # the kernel speaks the wire encoding: BE word rows in, BE words out
    ys_w = F.limbs_to_words_be(ys)
    got_pallas_w = np.asarray(fri_pallas.eval4_rows(
        x1_inv, x1sq_inv, ys_w, sx, ginv, inv4, interpret=True))
    got_pallas = np.asarray(F.words_be_to_limbs(jnp.asarray(got_pallas_w)))
    got_xla = np.asarray(quartic.eval4_even_odd(
        x1_inv, x1sq_inv, ys, sx, jnp.asarray(ginv), jnp.asarray(inv4)))
    got_bary = np.asarray(quartic.eval4_inv_free(
        nodes, x1cb_inv,
        jnp.asarray(oracle.quartic_weight_consts(tables.G2, 65536)[1]),
        ys, sx))

    assert [fp.limbs_to_int(r) for r in got_pallas] == want
    np.testing.assert_array_equal(got_pallas, got_xla)
    np.testing.assert_array_equal(got_pallas, got_bary)
    return tables, e1_list, rows


def test_rows_match_xla_and_oracle():
    _check(12, rng.randrange(1 << 256))     # raw unreduced special_x


def test_rows_node_coincidence():
    """sx equal to a node: the even/odd form is polynomial in sx, so it must
    equal the oracle's coefficient evaluation there -- which is that node's
    row value mod p."""
    tables = cached_tables(StarkConfig())
    # regenerate with a DETERMINISTIC first exponent so sx can hit its node
    state = rng.getstate()
    e1_probe = rng.randrange(65536)
    rng.setstate(state)
    sx_int = pow(tables.G2, 16384 + e1_probe, P)    # q_1 * x1 of group 0
    tables, e1_list, rows = _check(4, sx_int)
    assert e1_list[0] == e1_probe
    want0 = _oracle_eval(tables, e1_list, rows, sx_int)[0]
    assert want0 == rows[0][1] % P
