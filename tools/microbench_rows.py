"""Standalone timing of the FRI row check at real verifier shapes.

Compares the fused Pallas kernel (ops/fri_pallas.py) across LANE_TILE sizes
and against the XLA path (ops/quartic.eval4_even_odd).  Device-side checksum
sync (tunnel-honest).  Usage: python tools/microbench_rows.py [batch]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from stark_verifier_tpu import fp
    from stark_verifier_tpu.config import StarkConfig, cached_tables
    from stark_verifier_tpu.ops import fri_pallas, quartic

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    L, q = 5, 40
    cfg = StarkConfig()
    tables = cached_tables(cfg)
    rng = np.random.RandomState(3)

    g2t = jnp.asarray(tables.g2_powers)
    e1 = jnp.asarray(rng.randint(0, 65536, (batch, L, q)).astype(np.uint32))
    mask = jnp.uint32(65535)
    x1_inv = jnp.take(g2t, (jnp.uint32(0) - e1) & mask, axis=0)
    x1sq_inv = jnp.take(g2t, (jnp.uint32(0) - jnp.uint32(2) * e1) & mask,
                        axis=0)
    ys = jnp.asarray(
        rng.randint(0, 1 << 16, (batch, L, q, 4, 16)).astype(np.uint32))
    sx = jnp.asarray(
        rng.randint(0, 1 << 16, (batch, L, 16)).astype(np.uint32))
    ginv = np.asarray(tables.quartic_ginv)
    inv4 = np.asarray(tables.inv4)

    def timeit(fn):
        np.asarray(fn())          # compile + warm
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50)) * 1e3

    xla = jax.jit(lambda: jnp.sum(quartic.eval4_even_odd(
        x1_inv, x1sq_inv, ys, sx, jnp.asarray(ginv), jnp.asarray(inv4)),
        dtype=jnp.uint32))
    print(f"xla even/odd      {timeit(xla):8.2f} ms", flush=True)

    from stark_verifier_tpu.ops import field as F
    ys_w = jnp.asarray(np.asarray(F.limbs_to_words_be(ys)))   # wire encoding
    for tile in (256, 512, 1024, 2048):
        fri_pallas.LANE_TILE = tile
        fri_pallas._rows_t.clear_cache()
        fn = jax.jit(lambda: jnp.sum(fri_pallas.eval4_rows(
            x1_inv, x1sq_inv, ys_w, sx, ginv, inv4), dtype=jnp.uint32))
        print(f"pallas tile {tile:5d} {timeit(fn):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
