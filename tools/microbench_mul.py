"""Microbenchmark: modular-multiply layouts on the current device.

Hypothesis: [N, 16] puts the 16-limb axis in vector lanes (only 16/128 used);
a limb-major [16, N] layout should approach full VPU utilization.

Usage: python tools/microbench_mul.py [N] [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from stark_verifier_tpu import fp
from stark_verifier_tpu.ops import field as F

MASK = jnp.uint32(0xFFFF)


def mul_mod_limb_major(a_t: jnp.ndarray, b_t: jnp.ndarray) -> jnp.ndarray:
    """(a*b) mod p with limbs on axis 0: [16, N] x [16, N] -> [16, N]."""
    N = a_t.shape[1]

    def carry_fix_t(v):
        n = v.shape[0]
        c = v >> 16
        lo = v & MASK
        s = lo.at[1:].add(c[:-1])
        g = (s >> 16).astype(jnp.bool_)
        t = s & MASK
        p = t == MASK
        shift = 1
        while shift < n:
            g_prev = jnp.zeros_like(g).at[shift:].set(g[:-shift])
            p_prev = jnp.zeros_like(p).at[shift:].set(p[:-shift])
            g = g | (p & g_prev)
            p = p & p_prev
            shift *= 2
        carry_in = jnp.zeros_like(g).at[1:].set(g[:-1])
        return (t + carry_in.astype(jnp.uint32)) & MASK

    def mul_acc_t(a_t, b_t, out_limbs):
        acc = jnp.zeros((out_limbs, a_t.shape[1]), jnp.uint32)
        na = a_t.shape[0]
        nb = b_t.shape[0]
        for i in range(na):
            prod = a_t[i][None, :] * b_t          # [nb, N]
            lo = prod & MASK
            hi = prod >> 16
            acc = acc.at[i:i + nb].add(lo)
            acc = acc.at[i + 1:i + 1 + nb].add(hi)
        return acc

    C = jnp.asarray(fp.FOLD_C_LIMBS)[:, None]      # [3,1]
    P = jnp.asarray(fp.P_LIMBS)[:, None]           # [16,1]

    w = carry_fix_t(mul_acc_t(a_t, b_t, 32))
    lo16, hi16 = w[:16], w[16:]
    t = carry_fix_t(mul_acc_t(hi16, jnp.broadcast_to(C, (3, N)), 19).at[:16].add(lo16))
    t2 = carry_fix_t(mul_acc_t(t[16:19], jnp.broadcast_to(C, (3, N)), 17).at[:16].add(t[:16]))
    acc3 = jnp.zeros((17, N), jnp.uint32).at[:16].set(t2[:16]).at[:3].add(t2[16][None, :] * C)
    t3 = carry_fix_t(acc3)
    acc4 = jnp.zeros((17, N), jnp.uint32).at[:16].set(t3[:16]).at[:3].add(t3[16][None, :] * C)
    t4 = carry_fix_t(acc4)[:16]
    # conditional subtract p
    ge = _ge_t(t4, jnp.broadcast_to(P, (16, N)))
    comp = (MASK - P)
    s = t4 + jnp.broadcast_to(comp, (16, N))
    s = s.at[0].add(jnp.uint32(1))
    s = carry_fix_t(s)
    return jnp.where(ge[None, :], s, t4)


def _ge_t(a, b):
    n = a.shape[0]
    ne = a != b
    any_ne = jnp.any(ne, axis=0)
    first = jnp.argmax(ne[::-1], axis=0)
    top = (n - 1 - first)[None, :]
    a_top = jnp.take_along_axis(a, top, axis=0)[0]
    b_top = jnp.take_along_axis(b, top, axis=0)[0]
    return jnp.where(any_ne, a_top > b_top, True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    import random
    rng = random.Random(1)
    xs = [rng.randrange(1 << 256) for _ in range(256)]
    base = fp.ints_to_limbs(xs)
    a = jnp.asarray(np.tile(base, (N // 256, 1)))
    b = jnp.asarray(np.tile(base[::-1].copy(), (N // 256, 1)))
    at = a.T.copy()
    bt = b.T.copy()

    f1 = jax.jit(F.mul_mod)
    f2 = jax.jit(mul_mod_limb_major)

    # correctness cross-check
    r1 = np.asarray(f1(a[:256], b[:256]))
    r2 = np.asarray(f2(at[:, :256], bt[:, :256])).T
    assert (r1 == r2).all(), "layout variants disagree"
    exp = [(x * y) % fp.MODULUS for x, y in zip(xs, xs[::-1])]
    got = [fp.limbs_to_int(r) for r in r1]
    assert got == exp, "mul incorrect"

    for name, f, args in (("batch-major [N,16]", f1, (a, b)),
                          ("limb-major [16,N]", f2, (at, bt))):
        jax.block_until_ready(f(*args))
        ts = []
        for _ in range(iters):
            t = time.perf_counter()
            jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t)
        p50 = float(np.percentile(ts, 50))
        print(f"{name:22s} N={N} p50={p50*1e3:8.3f} ms  "
              f"{N/p50/1e6:8.2f} Mmul/s", flush=True)


if __name__ == "__main__":
    main()
