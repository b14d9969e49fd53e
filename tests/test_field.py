"""Field-kernel tests: limb arithmetic vs Python bigint oracle.

These are the 'kernel-level vectors' of SURVEY.md section 4(b): every device
field op is checked against exact Python int arithmetic, including adversarial
values near p, near 2^256 (unreduced inputs), and carry-ripple worst cases.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stark_verifier_tpu import fp
from stark_verifier_tpu.ops import field

P = fp.MODULUS
rng = random.Random(0xC0FFEE)


def rand_canon(n):
    return [rng.randrange(P) for _ in range(n)]


def rand_raw(n):
    """Unreduced 256-bit values (may be >= p) -- the reference feeds these in."""
    return [rng.randrange(1 << 256) for _ in range(n)]


EDGE = [0, 1, 2, P - 1, P - 2, P // 2, 2**255, 2**256 - 1, P,
        fp.FOLD_C, P - fp.FOLD_C, (1 << 256) - fp.FOLD_C,
        0xFFFF, 2**16, 2**240, (2**256 - 1) ^ 0xFFFF]


def to_dev(xs):
    return jnp.asarray(fp.ints_to_limbs(xs))


def to_ints(arr):
    arr = np.asarray(arr)
    return [fp.limbs_to_int(arr[i]) for i in range(arr.shape[0])]


def test_limb_roundtrip():
    xs = EDGE + rand_raw(50)
    assert to_ints(to_dev(xs)) == xs


def test_canon():
    xs = [x for x in EDGE + rand_raw(100)]
    out = to_ints(field.canon(to_dev(xs)))
    assert out == [x % P for x in xs]


def test_ge():
    a = EDGE + rand_raw(64)
    b = list(reversed(EDGE)) + rand_raw(64)
    got = np.asarray(field.ge(to_dev(a), to_dev(b)))
    assert got.tolist() == [x >= y for x, y in zip(a, b)]


def test_add_sub_mod():
    a = [x % P for x in EDGE] + rand_canon(100)
    b = list(reversed([x % P for x in EDGE])) + rand_canon(100)
    add = to_ints(field.add_mod(to_dev(a), to_dev(b)))
    sub = to_ints(field.sub_mod(to_dev(a), to_dev(b)))
    assert add == [(x + y) % P for x, y in zip(a, b)]
    assert sub == [(x - y) % P for x, y in zip(a, b)]


def test_mul_wide_exact():
    a = EDGE + rand_raw(60)
    b = list(reversed(EDGE)) + rand_raw(60)
    wide = np.asarray(field.mul_wide(to_dev(a), to_dev(b)))
    got = [fp.limbs_to_int(wide[i]) for i in range(wide.shape[0])]
    assert got == [x * y for x, y in zip(a, b)]


def test_mul_mod_unreduced_inputs():
    a = EDGE + rand_raw(100)
    b = list(reversed(EDGE)) + rand_raw(100)
    got = to_ints(field.mul_mod(to_dev(a), to_dev(b)))
    assert got == [x * y % P for x, y in zip(a, b)]


def test_reduce_wide_carry_worstcase():
    # values crafted to maximize carry rippling: all-FFFF limbs, powers of 2
    xs = [(1 << 512) - 1, (1 << 512) - (1 << 256), (1 << 256) * (P - 1),
          P * P, (P - 1) * (P - 1), (1 << 511), 0, 1]
    arr = jnp.asarray(np.stack([fp.int_to_limbs(x, 32) for x in xs]))
    got = to_ints(field.reduce_wide(arr))
    assert got == [x % P for x in xs]


def test_pow_const_and_inv():
    xs = [x % P for x in EDGE if x % P != 0] + rand_canon(20)
    d = to_dev(xs)
    assert to_ints(field.pow_const(d, 3)) == [pow(x, 3, P) for x in xs]
    assert to_ints(field.pow_const(d, 8192)) == [pow(x, 8192, P) for x in xs]
    assert to_ints(field.inv_mod(d)) == [pow(x, P - 2, P) for x in xs]
    # zero maps to zero
    assert to_ints(field.inv_mod(to_dev([0]))) == [0]


def test_pow_table():
    g = pow(7, (P - 1) // 65536, P)
    table = jnp.asarray(fp.pow2_table(g, 16))
    es = [0, 1, 7, 8191, 65535, 12345] + [rng.randrange(65536) for _ in range(20)]
    e = jnp.asarray(np.array(es, dtype=np.uint32))
    got = to_ints(field.pow_table(table, e, 16))
    assert got == [pow(g, x, P) for x in es]


def test_batch_inv():
    xs = rand_canon(37) + [0, 1, P - 1, 0]
    arr = to_dev(xs)[None]  # [1, n, 16]
    got = to_ints(field.batch_inv(arr)[0])
    exp = [pow(x, P - 2, P) if x else 0 for x in xs]
    assert got == exp


def test_eval_poly():
    coeffs = rand_canon(64)
    xs = rand_canon(5) + [0, 1]
    got = to_ints(field.eval_poly(to_dev(coeffs), to_dev(xs)))
    exp = [sum(c * pow(x, i, P) for i, c in enumerate(coeffs)) % P for x in xs]
    assert got == exp


def test_ops_jit_and_vmap():
    a = rand_canon(8)
    b = rand_canon(8)
    da, db = to_dev(a), to_dev(b)
    jm = jax.jit(field.mul_mod)
    assert to_ints(jm(da, db)) == [x * y % P for x, y in zip(a, b)]
    vm = jax.vmap(field.mul_mod)
    assert to_ints(vm(da, db)) == [x * y % P for x, y in zip(a, b)]


def test_mul_sum_mod():
    """k-product + addend accumulation with a single fold reduction."""
    for n in (1, 2, 4, 5, 16):
        a = rand_raw(n)
        b = rand_raw(n)
        pairs = [(to_dev([x]), to_dev([y])) for x, y in zip(a, b)]
        want = sum(x * y for x, y in zip(a, b)) % P
        got = to_ints(field.mul_sum_mod(pairs))
        assert got == [want], n
    # plain addends ride the same fold
    a, b = rand_raw(3), rand_raw(3)
    ex = rand_raw(2)
    got = to_ints(field.mul_sum_mod(
        [(to_dev([x]), to_dev([y])) for x, y in zip(a, b)],
        extra=[to_dev([t]) for t in ex]))
    assert got == [(sum(x * y for x, y in zip(a, b)) + sum(ex)) % P]
    # worst case: 16 products of all-ones values + 8 all-ones addends --
    # maximal column sums through the fold chain
    m = (1 << 256) - 1
    ones = to_dev([m])
    got = to_ints(field.mul_sum_mod([(ones, ones)] * 16, extra=[ones] * 8))
    assert got == [(16 * m * m + 8 * m) % P]
    # batched shapes + broadcasting leads
    av, bv = rand_raw(6), rand_raw(6)
    pa = to_dev(av).reshape(2, 3, 16)
    pb = to_dev(bv).reshape(2, 3, 16)
    one = to_dev([1])[0]
    got = np.asarray(field.mul_sum_mod([(pa, pb), (pa, one)]))
    want = [(x * y + x) % P for x, y in zip(av, bv)]
    assert [fp.limbs_to_int(got.reshape(6, 16)[i]) for i in range(6)] == want
