"""Minimal repro / retry for the Mosaic-via-axon compile hang (VERDICT item 2).

Round 1 observed: any pl.pallas_call -- even a trivial VMEM copy kernel --
hangs >8 min in remote Mosaic compilation through the axon TPU tunnel
(docs/PERF.md "Dead ends").  This script retries with escalating kernels and
per-stage wall-clock logging so a rerun either (a) proves Pallas now compiles,
unblocking ops/field_pallas.py, or (b) is the committed evidence of the hang.

Run on TPU as a background task with a generous budget:
  cd /root/repo && timeout 900 python tools/pallas_repro.py > /tmp/pallas_repro.log 2>&1
"""

import sys
import time

import numpy as np


def stage(name):
    print(f"[{time.strftime('%H:%M:%S')}] {name}", flush=True)


def main():
    stage("importing jax")
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    stage(f"jax {jax.__version__}, backend {jax.default_backend()}, "
          f"devices {jax.devices()}")

    # Stage 1: trivial copy kernel (the round-1 hang case)
    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    stage("compiling trivial copy kernel (round-1 hang point)...")
    t0 = time.perf_counter()
    out = pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    stage(f"copy kernel OK in {time.perf_counter() - t0:.1f}s")

    # Stage 2: arithmetic kernel with a grid
    def add_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = a_ref[:] + b_ref[:] * jnp.uint32(3)

    a = jnp.ones((16, 512), jnp.uint32)
    b = jnp.full((16, 512), 7, jnp.uint32)
    stage("compiling gridded arithmetic kernel...")
    t0 = time.perf_counter()
    spec = pl.BlockSpec((16, 128), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        add_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.uint32),
        grid=(4,),
        in_specs=[spec, spec],
        out_specs=spec,
    )(a, b)
    assert int(np.asarray(out)[0, 0]) == 22
    stage(f"gridded kernel OK in {time.perf_counter() - t0:.1f}s")

    # Stage 3: the real fused mul_mod kernel vs the XLA path
    stage("compiling ops/field_pallas.mul_mod (the real kernel)...")
    sys.path.insert(0, "/root/repo")
    from stark_verifier_tpu.ops import field as F, field_pallas
    from stark_verifier_tpu import fp

    rng = np.random.default_rng(0)
    n = 2048
    av = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    bv = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    t0 = time.perf_counter()
    got = np.asarray(field_pallas.mul_mod(jnp.asarray(av), jnp.asarray(bv)))
    stage(f"pallas mul_mod compiled+ran in {time.perf_counter() - t0:.1f}s")
    want = np.asarray(F.mul_mod(jnp.asarray(av), jnp.asarray(bv)))
    np.testing.assert_array_equal(got, want)
    stage("pallas mul_mod bit-exact vs XLA path over 2048 random pairs")

    # Stage 4: quick throughput probe
    big = 1 << 18
    aa = jnp.asarray(rng.integers(0, 1 << 16, size=(big, 16), dtype=np.uint32))
    bb = jnp.asarray(rng.integers(0, 1 << 16, size=(big, 16), dtype=np.uint32))
    r = field_pallas.mul_mod(aa, bb)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = field_pallas.mul_mod(aa, r)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    stage(f"pallas mul_mod throughput: {10 * big / dt / 1e6:.1f} Mmul/s")

    r2 = F.mul_mod(aa, bb)
    jax.block_until_ready(r2)
    t0 = time.perf_counter()
    for _ in range(10):
        r2 = F.mul_mod(aa, r2)
    jax.block_until_ready(r2)
    dt = time.perf_counter() - t0
    stage(f"XLA    mul_mod throughput: {10 * big / dt / 1e6:.1f} Mmul/s")
    stage("ALL STAGES PASSED")


if __name__ == "__main__":
    main()
