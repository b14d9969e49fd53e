"""Radix-2 number-theoretic transform over F_p on device.

TPU-native equivalent of the reference's recursive Cooley-Tukey
(reference: /root/reference/src/fft.rs:37-86): an iterative decimation-in-time
NTT -- bit-reverse permutation then log2(n) butterfly stages, each stage a
single vectorized modular multiply/add/sub over all n/2 pairs.  The recursive
even/odd split of the reference computes exactly this DFT, so outputs are
bit-identical (both are canonical mod p).

The inverse transform follows fft_inv (fft.rs:64-86): same butterflies with
the inverse root, then scale by n^(p-2) mod p.

Twiddle factors depend only on (root, n) -- statement-level constants --
and are precomputed host-side and cached.

Multi-chip scaling note: for the standalone 2^13-2^20 configs the first
log2(n_chips) stages exchange butterfly halves across chips; parallel/ntt.py
implements that with shard_map + ppermute over the mesh.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from .. import fp
from . import field as F


@functools.lru_cache(maxsize=32)
def _twiddle_stages(root: int, n: int, modulus: int) -> tuple:
    """Per-stage twiddle tables for an n-point DIT NTT with given root.

    Stage s (s = 0 .. log2(n)-1) has half-block size 2^s and uses twiddles
    w^(n / 2^(s+1) * k) for k < 2^s, where w = root.
    Returns a tuple of [2^s, 16] uint32 numpy arrays.
    """
    logn = n.bit_length() - 1
    if 1 << logn != n:
        raise ValueError(f"n must be a power of two, got {n}")
    # all powers root^0 .. root^(n/2 - 1); the int chain is cheap, the limb
    # conversion goes through the bulk to_bytes path (2^20-size configs would
    # otherwise spend minutes in per-entry Python loops)
    m = max(n // 2, 1)
    vals = [1] * m
    cur = 1
    for i in range(1, m):
        cur = cur * root % modulus
        vals[i] = cur
    pows = fp.ints_to_limbs_fast(vals)
    stages = []
    for s in range(logn):
        stride = n >> (s + 1)
        stages.append(np.ascontiguousarray(pows[::stride][: 1 << s]))
    return tuple(stages)


@functools.lru_cache(maxsize=32)
def _bitrev_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


def ntt(values: jnp.ndarray, root: int, inverse: bool = False,
        modulus: int = fp.MODULUS) -> jnp.ndarray:
    """n-point NTT/iNTT of [..., n, 16] canonical values; root must have
    multiplicative order exactly n."""
    n = values.shape[-2]
    if inverse:
        # inverse transform uses root^-1 (the reference reverses the power
        # list, fft.rs:79-80) and scales by n^-1 (fft.rs:82-84)
        w = pow(root, modulus - 2, modulus)
    else:
        w = root
    stages = _twiddle_stages(w, n, modulus)
    perm = jnp.asarray(_bitrev_perm(n))

    x = jnp.take(values, perm, axis=-2)
    lead = x.shape[:-2]
    for s, tw in enumerate(stages):
        half = 1 << s
        m = half * 2
        xb = x.reshape(lead + (n // m, m, fp.NLIMBS))
        a = xb[..., :half, :]
        b = xb[..., half:, :]
        t = F.mul_mod(b, jnp.asarray(tw))
        lo = F.add_mod(a, t)
        hi = F.sub_mod(a, t)
        x = jnp.concatenate([lo, hi], axis=-2).reshape(lead + (n, fp.NLIMBS))
    if inverse:
        n_inv = pow(n, modulus - 2, modulus)
        x = F.mul_mod(x, F.const(n_inv))
    return x


def intt(values: jnp.ndarray, root: int, modulus: int = fp.MODULUS) -> jnp.ndarray:
    """Inverse NTT matching the reference's fft_inv (fft.rs:64-86)."""
    return ntt(values, root, inverse=True, modulus=modulus)
