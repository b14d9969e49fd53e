"""Distributed NTT on the 8-device mesh: bit-exact vs the local kernel and
the oracle recursion (point axis sharded, ppermute butterfly exchanges)."""

import random

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from stark_verifier_tpu import fp
from stark_verifier_tpu.ops import ntt as ntt_ops
from stark_verifier_tpu.parallel import mesh as M
from stark_verifier_tpu.parallel.ntt import make_sharded_ntt

P_ = fp.MODULUS
rng = random.Random(123)


def _root(n):
    return pow(7, (P_ - 1) // n, P_)


def test_sharded_ntt_matches_oracle_4096():
    n = 4096
    root = _root(n)
    vals = [rng.randrange(P_) for _ in range(n)]
    mesh = M.make_mesh(8)
    fn = make_sharded_ntt(n, root, mesh)
    got = np.asarray(fn(jnp.asarray(fp.ints_to_limbs(vals))))
    exp = oracle.fft_fwd(vals, root)
    assert [fp.limbs_to_int(r) for r in got] == exp


def test_sharded_intt_roundtrip_16384():
    n = 1 << 14
    root = _root(n)
    vals = [rng.randrange(P_) for _ in range(n)]
    mesh = M.make_mesh(8)
    fwd = make_sharded_ntt(n, root, mesh)
    inv = make_sharded_ntt(n, root, mesh, inverse=True)
    d = jnp.asarray(fp.ints_to_limbs(vals))
    back = np.asarray(inv(fwd(d)))
    assert [fp.limbs_to_int(r) for r in back] == vals


def test_sharded_ntt_roundtrip_131072():
    """2^17 (BASELINE's larger configs) on the 8-device mesh: round-trip plus
    spot-eval against exact Python ints."""
    n = 1 << 17
    root = _root(n)
    vals = [rng.randrange(P_) for _ in range(n)]
    mesh = M.make_mesh(8)
    fwd = make_sharded_ntt(n, root, mesh)
    inv = make_sharded_ntt(n, root, mesh, inverse=True)
    d = jnp.asarray(fp.ints_to_limbs_fast(vals))
    out = fwd(d)
    back = np.asarray(inv(out))
    assert [fp.limbs_to_int(r) for r in back] == vals
    out = np.asarray(out)
    for i in (1, 99999):
        x = pow(root, i, P_)
        acc, pw = 0, 1
        for c in vals:
            acc = (acc + c * pw) % P_
            pw = pw * x % P_
        assert fp.limbs_to_int(out[i]) == acc, i


def test_sharded_matches_local_kernel():
    n = 2048
    root = _root(n)
    vals = [rng.randrange(P_) for _ in range(n)]
    d = jnp.asarray(fp.ints_to_limbs(vals))
    mesh = M.make_mesh(8)
    sharded = np.asarray(make_sharded_ntt(n, root, mesh)(d))
    local = np.asarray(jax.jit(lambda v: ntt_ops.ntt(v, root))(d))
    assert (sharded == local).all()
