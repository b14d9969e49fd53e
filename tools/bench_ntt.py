"""Standalone NTT throughput bench, 2^13..2^20 (BASELINE.md config 3).

Runs the radix-2 DIT NTT (ops/ntt.py) on the default backend (TPU via axon,
or CPU for smoke runs), reporting per-size wall-clock and Melem/s.  Results
go into docs/PERF.md.

Usage: timeout 1800 python tools/bench_ntt.py [min_log] [max_log]
"""

import json
import random
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from stark_verifier_tpu import fp
    from stark_verifier_tpu.ops import ntt

    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    P = fp.MODULUS
    rng = random.Random(5)
    print(f"backend: {jax.default_backend()}, {jax.devices()}", flush=True)

    results = {}
    for logn in range(lo, hi + 1):
        n = 1 << logn
        root = pow(7, (P - 1) // n, P)
        t0 = time.perf_counter()
        vals = fp.ints_to_limbs_fast(
            [rng.randrange(P) for _ in range(n)])
        d = jnp.asarray(vals)
        # reduce to ONE scalar on device and fetch it: through the axon
        # tunnel block_until_ready can return early and a [n, 16] fetch
        # costs ~seconds (docs/PERF.md measurement rule)
        fn = jax.jit(lambda v, r=root: jnp.sum(ntt.ntt(v, r),
                                               dtype=jnp.uint32))
        np.asarray(fn(d))
        t_compile = time.perf_counter() - t0
        iters = max(3, min(20, (1 << 22) // n))
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(d))
        dt = (time.perf_counter() - t0) / iters
        results[f"2^{logn}"] = {
            "ms": round(dt * 1e3, 2),
            "Melem_per_s": round(n / dt / 1e6, 1),
            "compile_s": round(t_compile, 1),
        }
        print(f"2^{logn:2d}: {dt * 1e3:8.2f} ms  "
              f"{n / dt / 1e6:8.1f} Melem/s  (compile {t_compile:.1f}s)",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
