"""Point-parallel NTT over a device mesh: butterfly stages across chips.

The standalone 2^13-2^20 NTT configs (BASELINE.json config 3) shard the
evaluation-point axis over the mesh.  With contiguous sharding of the
bit-reversed sequence, a DIT stage with butterfly distance 2^s is:

  * LOCAL when 2^(s+1) <= points/device -- identical to ops/ntt.py stages,
    executed per shard inside shard_map;
  * CROSS-DEVICE when 2^s >= points/device -- each device's whole shard pairs
    with exactly one partner device (partner id = my id XOR 2^s/shard), so
    the exchange is a single ppermute with an XOR permutation over ICI, not
    an all-to-all; the lo side computes a + w*b, the hi side a - w*b.

Cross-stage twiddles are position-dependent: T_s[g] = root^((n >> (s+1)) *
(g mod 2^s)).  Because g mod 2^s == (g - 2^s) mod 2^s, the hi partner reads
the same table entry as its lo counterpart, so each device just uses its own
sharded slice of T_s -- no twiddle communication at all.

The initial global bit-reverse shuffle is expressed as a plain gather under
jit; the SPMD partitioner lowers it to the cross-chip data movement once per
transform.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .. import fp
from ..ops import field as F
from ..ops.ntt import _twiddle_stages, _bitrev_perm


@functools.lru_cache(maxsize=16)
def _cross_tables(root: int, n: int, n_cross: int, modulus: int):
    """Stacked per-position twiddle tables for the last n_cross stages:
    [n_cross, n, 16] with row s' for stage s = logn - n_cross + s'."""
    logn = n.bit_length() - 1
    pows = np.zeros((n // 2, fp.NLIMBS), dtype=np.uint32)
    cur = 1
    for i in range(n // 2):
        pows[i] = fp.int_to_limbs(cur)
        cur = cur * root % modulus
    out = np.zeros((n_cross, n, fp.NLIMBS), dtype=np.uint32)
    g = np.arange(n)
    for s_i, s in enumerate(range(logn - n_cross, logn)):
        stride = n >> (s + 1)
        idx = (g % (1 << s)) * stride      # exponent index into pows
        out[s_i] = pows[idx]
    return out


def make_sharded_ntt(n: int, root: int, mesh: Mesh, axis_name: str = "data",
                     inverse: bool = False, modulus: int = fp.MODULUS):
    """Build a jitted sharded n-point NTT over `mesh` (values [n, 16] with the
    point axis sharded).  Bit-exact with ops.ntt.ntt."""
    D = mesh.devices.size
    if n % D:
        raise ValueError(f"n={n} not divisible by mesh size {D}")
    S = n // D
    logn = n.bit_length() - 1
    logS = S.bit_length() - 1
    n_cross = logn - logS
    if (1 << logn) != n or (1 << logS) != S:
        raise ValueError(f"n={n} and per-shard size {S} must be powers of 2")

    w = pow(root, modulus - 2, modulus) if inverse else root
    local_stages = _twiddle_stages(w, n, modulus)[:logS]
    cross = jnp.asarray(_cross_tables(w, n, n_cross, modulus))  # [C, n, 16]
    perm = jnp.asarray(_bitrev_perm(n))
    sh = NamedSharding(mesh, P(axis_name))
    sh_cross = NamedSharding(mesh, P(None, axis_name))

    def body(x, crosst):
        # x: [S, 16] local shard (bit-reversed order); crosst: [C, S, 16]
        for s, tw in enumerate(local_stages):
            half = 1 << s
            m = half * 2
            xb = x.reshape(S // m, m, fp.NLIMBS)
            a, b = xb[:, :half], xb[:, half:]
            t = F.mul_mod(b, jnp.asarray(tw))
            x = jnp.concatenate([F.add_mod(a, t), F.sub_mod(a, t)],
                                axis=1).reshape(S, fp.NLIMBS)
        me = jax.lax.axis_index(axis_name)
        for s_i in range(n_cross):
            bit = 1 << s_i                      # partner distance in device ids
            pairs = [(i, i ^ bit) for i in range(D)]
            other = jax.lax.ppermute(x, axis_name, perm=pairs)
            is_hi = ((me & bit) != 0)
            tw = crosst[s_i]                    # [S, 16] own slice of T_s
            bvals = jnp.where(is_hi, x, other)  # the hi element of each pair
            avals = jnp.where(is_hi, other, x)
            wb = F.mul_mod(tw, bvals)
            x = jnp.where(is_hi, F.sub_mod(avals, wb), F.add_mod(avals, wb))
        return x

    smapped = shard_map(body, mesh=mesh, in_specs=(P(axis_name), P(None, axis_name)),
                        out_specs=P(axis_name))

    n_inv = pow(n, modulus - 2, modulus)

    @functools.partial(jax.jit, out_shardings=sh)
    def ntt_fn(values):
        x = jnp.take(values, perm, axis=0)      # global bit-reverse shuffle
        x = jax.lax.with_sharding_constraint(x, sh)
        x = smapped(x, cross)
        if inverse:
            x = F.mul_mod(x, F.const(n_inv))
        return x

    return ntt_fn
