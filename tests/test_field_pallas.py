"""Interpret-mode bit-exactness of the fused Pallas mul_mod kernel.

Runs the kernel through the Pallas interpreter (no Mosaic/TPU needed) against
the XLA field.mul_mod path and host bigints, over the same edge vectors
test_field.py uses.  TPU compilation/throughput is exercised separately by
tools/pallas_repro.py (Mosaic compiles are minutes through the axon tunnel).
"""

import random

import numpy as np
import jax.numpy as jnp

from stark_verifier_tpu import fp
from stark_verifier_tpu.ops import field, field_pallas

P = fp.MODULUS
rng = random.Random(0xF00D)


def to_dev(xs):
    return jnp.asarray(fp.ints_to_limbs(xs))


def to_ints(arr):
    arr = np.asarray(arr)
    return [fp.limbs_to_int(arr[i]) for i in range(arr.shape[0])]


def _edge_values():
    vals = [0, 1, 2, P - 1, P - 2, P, P + 1, (1 << 256) - 1,
            fp.FOLD_C, (1 << 255), (1 << 128) - 1]
    vals += [rng.randrange(1 << 256) for _ in range(53)]
    return vals


def test_pallas_mul_mod_interpret_matches_bigint():
    a = _edge_values()
    b = list(reversed(_edge_values()))
    got = to_ints(field_pallas.mul_mod(to_dev(a), to_dev(b), interpret=True))
    assert got == [x * y % P for x, y in zip(a, b)]


def test_pallas_mul_mod_interpret_matches_xla():
    n = 512
    a = [rng.randrange(1 << 256) for _ in range(n)]
    b = [rng.randrange(1 << 256) for _ in range(n)]
    got = np.asarray(field_pallas.mul_mod(to_dev(a), to_dev(b), interpret=True))
    want = np.asarray(field.mul_mod(to_dev(a), to_dev(b)))
    np.testing.assert_array_equal(got, want)


def test_pallas_mul_mod_worstcase_carries():
    """All-0xFFFF limbs and near-p values exercise the longest carry ripples
    through the scatter-free Kogge pass."""
    xs = [(1 << 256) - 1] * 8 + [P - 1] * 8
    ys = [(1 << 256) - 1, P - 1] * 8
    got = to_ints(field_pallas.mul_mod(to_dev(xs), to_dev(ys), interpret=True))
    assert got == [x * y % P for x, y in zip(xs, ys)]
