"""Merkle whole-walk kernel sweep: Pallas (ops/merkle_pallas.walk_branches)
vs the XLA scan (ops/merkle.verify_branches) at the real main-walk shapes.

Round-3 verdict item 1: the round-2 Pallas walk lost 4x at SUB_TILE=32; the
hypothesis is LATENCY-bound small tiles (each ~1,200-op compression chain
only has sub_tile*128 lanes of independent work per op, so the VPU pipeline
stalls on dependent-op latency; XLA's fused scan covers the whole
[batch*160] array per op).  This sweeps the tile size to test it.

Usage: python tools/microbench_walk.py [batch] [iters] [tiles...]
Timing discipline (docs/PERF.md): device-side checksum, fetch ONE scalar
(through the axon tunnel block_until_ready returns early; a big fetch pays
~15-30 MB/s).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.ops import merkle, merkle_pallas, prg


def timeit(name, fn, *args, iters=5):
    np.asarray(jax.block_until_ready(fn(*args)))
    ts = []
    for _ in range(iters):
        t = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args)))
        ts.append(time.perf_counter() - t)
    p50 = float(np.percentile(ts, 50))
    print(f"{name:36s} {p50 * 1e3:9.2f} ms", flush=True)
    return p50


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tiles = [int(t) for t in sys.argv[3:]] or [32, 64, 128, 256]

    pb = open("/root/reference/proof.bin", "rb").read()
    tree = device.to_device(device.replicate_proof(
        device.proof_tree(wire.parse_proof_fast(pb)), batch))
    main_g = tree["main"]
    root = tree["merkle_root"]
    print(f"batch={batch} branches/proof=160 vw=24 depth=15 "
          f"device={jax.devices()[0]}", flush=True)

    @jax.jit
    def indices_of(tree):
        positions = prg.pseudorandom_indices(
            tree["l_merkle_root"], 80, 65536, 8)
        aug = jnp.stack([positions, (positions + 8) % 65536], -1)
        return aug.reshape(*positions.shape[:-1], 160)

    idx = jax.block_until_ready(indices_of(tree))

    @jax.jit
    def xla_walk(g, idx, root):
        ok, _ = merkle.verify_branches(
            root, idx, g["value"], g["sibling"], g["witness"], 15)
        return jnp.sum(ok.astype(jnp.uint32))

    t_xla = timeit("XLA lockstep scan", xla_walk, main_g, idx, root,
                   iters=iters)

    for st in tiles:
        @jax.jit
        def pallas_walk(g, idx, root, _st=st):
            d = jnp.uint32(15)
            ld4 = jnp.uint32(1 << 14)
            pidx = (idx // ld4) + 4 * (idx % ld4)
            ti = jnp.uint32(1 << 17) + pidx
            res = merkle_pallas.walk_branches(
                g["value"], g["sibling"], g["witness"], ti,
                jnp.full(idx.shape, d), sub_tile=_st)
            ok = jnp.all(res == root[..., None, :], axis=-1)
            return jnp.sum(ok.astype(jnp.uint32))

        # correctness first
        want = int(np.asarray(xla_walk(main_g, idx, root)))
        got = int(np.asarray(pallas_walk(main_g, idx, root)))
        assert got == want == batch * 160, (got, want)
        timeit(f"pallas walk sub_tile={st}", pallas_walk, main_g, idx, root,
               iters=iters)


if __name__ == "__main__":
    main()
