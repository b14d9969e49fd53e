"""NTT/iNTT parity vs the oracle recursion (BASELINE.json config 3).

Bit-exact parity at 2^6 and 2^13 against the Python re-implementation of the
reference recursion (oracle.fft_inv / fft_fwd == src/fft.rs:37-86); larger
sizes are checked by round-trip and by spot-evaluating the interpolated
polynomial at sample points with exact Python ints.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from stark_verifier_tpu import fp
from stark_verifier_tpu.ops import ntt

P = fp.MODULUS
rng = random.Random(99)


def _root_of_order(n):
    # 7 generates the full 2-adic subgroup: 7^((p-1)/n) has order n for n | 2^32
    return pow(7, (P - 1) // n, P)


def _to_dev(xs):
    return jnp.asarray(fp.ints_to_limbs(xs))


def _to_ints(arr):
    return [fp.limbs_to_int(r) for r in np.asarray(arr)]


def test_intt_64_matches_oracle():
    root = _root_of_order(64)
    vals = [rng.randrange(P) for _ in range(64)]
    got = _to_ints(jax.jit(lambda v: ntt.intt(v, root))(_to_dev(vals)))
    assert got == oracle.fft_inv(vals, root)


def test_ntt_8192_matches_oracle():
    n = 8192
    root = _root_of_order(n)
    vals = [rng.randrange(P) for _ in range(n)]
    got = _to_ints(jax.jit(lambda v: ntt.ntt(v, root))(_to_dev(vals)))
    exp = oracle.fft_fwd(vals, root)
    assert got == exp


def test_ntt_roundtrip_65536():
    n = 1 << 16
    root = _root_of_order(n)
    vals = [rng.randrange(P) for _ in range(n)]
    d = _to_dev(vals)
    fwd = jax.jit(lambda v: ntt.ntt(v, root))(d)
    back = jax.jit(lambda v: ntt.intt(v, root))(fwd)
    assert _to_ints(back) == vals


def test_ntt_spot_evaluation_65536():
    """NTT output i equals poly evaluation at root^i (exact Python check on a
    few sampled indices)."""
    n = 1 << 16
    root = _root_of_order(n)
    vals = [rng.randrange(P) for _ in range(n)]
    out = _to_ints(jax.jit(lambda v: ntt.ntt(v, root))(_to_dev(vals)))
    for i in (0, 1, 12345, n - 1):
        x = pow(root, i, P)
        acc, pw = 0, 1
        for c in vals:
            acc = (acc + c * pw) % P
            pw = pw * x % P
        assert out[i] == acc, i


def test_ntt_roundtrip_and_spot_eval_131072():
    """2^17 config (BASELINE names 2^13-2^20): iNTT(NTT(v)) == v, and NTT
    output spot-checked against exact Python evaluation.  The twiddle
    precompute is the bulk to_bytes path -- table build must stay well under
    a minute at this size."""
    import time
    n = 1 << 17
    root = _root_of_order(n)
    vals = [rng.randrange(P) for _ in range(n)]
    t0 = time.perf_counter()
    d = _to_dev(vals)
    fwd = jax.jit(lambda v: ntt.ntt(v, root))(d)
    build_and_run = time.perf_counter() - t0
    assert build_and_run < 120, f"table build too slow: {build_and_run:.1f}s"
    back = jax.jit(lambda v: ntt.intt(v, root))(fwd)
    assert _to_ints(back) == vals
    out = _to_ints(fwd)
    for i in (0, 77777, n - 1):
        x = pow(root, i, P)
        acc, pw = 0, 1
        for c in vals:
            acc = (acc + c * pw) % P
            pw = pw * x % P
        assert out[i] == acc, i


def test_ntt_batched():
    n = 256
    root = _root_of_order(n)
    a = [rng.randrange(P) for _ in range(n)]
    b = [rng.randrange(P) for _ in range(n)]
    batch = jnp.stack([_to_dev(a), _to_dev(b)])
    got = jax.jit(lambda v: ntt.ntt(v, root))(batch)
    assert _to_ints(got[0]) == oracle.fft_fwd(a, root)
    assert _to_ints(got[1]) == oracle.fft_fwd(b, root)
