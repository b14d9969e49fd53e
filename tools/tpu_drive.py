"""TPU verification drive: field kernels vs bigint oracle + end-to-end
verifier against the golden proof (accept) and corrupted copies (reject),
on the REAL chip.  Used by the /verify workflow after library changes."""

import random
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def stage(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import stark_verifier_tpu as sv
    from stark_verifier_tpu import fp
    from stark_verifier_tpu.ops import field
    from stark_verifier_tpu.config import StarkConfig
    from stark_verifier_tpu.proofio import wire, device
    from stark_verifier_tpu.protocol import verify as V

    stage(f"devices: {jax.devices()}")
    assert jax.default_backend() == "tpu", jax.default_backend()

    P = sv.MODULUS
    rng = random.Random(7)

    # 1. field kernels vs bigint oracle (mul, sqr, add, sub, canon, inv)
    xs = [rng.randrange(1 << 256) for _ in range(256)]
    ys = [rng.randrange(1 << 256) for _ in range(256)]
    dx = jnp.asarray(fp.ints_to_limbs(xs))
    dy = jnp.asarray(fp.ints_to_limbs(ys))
    out = np.asarray(jax.jit(field.mul_mod)(dx, dy))
    assert [fp.limbs_to_int(r) for r in out] == [x * y % P for x, y in zip(xs, ys)]
    out = np.asarray(jax.jit(field.sqr_mod)(dx))
    assert [fp.limbs_to_int(r) for r in out] == [x * x % P for x in xs]
    cx = [x % P for x in xs]
    cy = [y % P for y in ys]
    dcx = jnp.asarray(fp.ints_to_limbs(cx))
    dcy = jnp.asarray(fp.ints_to_limbs(cy))
    assert [fp.limbs_to_int(r) for r in np.asarray(jax.jit(field.add_mod)(dcx, dcy))] \
        == [(a + b) % P for a, b in zip(cx, cy)]
    assert [fp.limbs_to_int(r) for r in np.asarray(jax.jit(field.sub_mod)(dcx, dcy))] \
        == [(a - b) % P for a, b in zip(cx, cy)]
    assert [fp.limbs_to_int(r) for r in np.asarray(jax.jit(field.canon)(dx))] \
        == [x % P for x in xs]
    inv = np.asarray(jax.jit(field.inv_mod)(dcx))
    assert [fp.limbs_to_int(r) for r in inv] == [pow(a, P - 2, P) for a in cx]
    stage("field kernels bit-exact vs bigint oracle on TPU")

    # 2. end-to-end: golden proof accepts, corrupted proofs reject
    with open("/root/reference/proof.bin", "rb") as f:
        proof_bytes = f.read()
    batch = 8
    trees = []
    golden = device.proof_tree(wire.parse_proof_fast(proof_bytes))
    trees.append(golden)
    for off in (40, 100_000, 300_000, 566_000):
        b = bytearray(proof_bytes)
        b[off] ^= 1
        try:
            trees.append(device.proof_tree(wire.parse_proof_fast(bytes(b))))
        except wire.WireFormatError:
            trees.append(golden)  # parse-reject counts; keep shapes
            stage(f"offset {off}: rejected at parse")
    while len(trees) < batch:
        trees.append(golden)
    stacked = device.to_device(device.stack_proofs(trees))

    fn, _ = V.make_verifier(StarkConfig(strict=True))
    t0 = time.perf_counter()
    verdicts = np.asarray(fn(stacked))
    stage(f"strict verifier compiled+ran in {time.perf_counter() - t0:.1f}s: "
          f"verdicts={verdicts.tolist()}")
    assert verdicts[0], "golden proof rejected!"
    assert not verdicts[1:5].any(), "corrupted proof accepted!"
    assert verdicts[5:].all()

    # 3. quick steady-state timing at batch 8 (not the headline bench)
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(stacked))
    stage(f"steady-state batch-8 strict verify: {(time.perf_counter()-t0)*1e3:.1f} ms")
    stage("ALL DRIVES PASSED")


if __name__ == "__main__":
    main()
