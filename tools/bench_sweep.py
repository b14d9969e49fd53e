"""Throughput sweep over batch sizes on the current device.

Usage: python tools/bench_sweep.py [batches...]
"""

import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")

from stark_verifier_tpu.config import StarkConfig
from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.protocol import verify as V


def main():
    batches = [int(x) for x in sys.argv[1:]] or [512, 1024, 2048]
    pb = open("/root/reference/proof.bin", "rb").read()
    base = device.proof_tree(wire.parse_proof_fast(pb))
    fn, _ = V.make_verifier(StarkConfig())
    print(f"device={jax.devices()[0]}", flush=True)
    for b in batches:
        tree = device.to_device(device.replicate_proof(base, b))
        t0 = time.time()
        ok = np.asarray(fn(tree))
        print(f"batch={b} compile+run {time.time()-t0:.1f}s ok={bool(ok.all())}",
              flush=True)
        ts = []
        for _ in range(5):
            t = time.perf_counter()
            jax.block_until_ready(fn(tree))
            ts.append(time.perf_counter() - t)
        p50 = float(np.percentile(ts, 50))
        print(f"batch={b} p50={p50*1e3:.1f}ms proofs/s={b/p50:.1f}", flush=True)
        del tree


if __name__ == "__main__":
    main()
