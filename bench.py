"""Benchmark: batched MiMC-STARK verifications/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference publishes no numbers; the measured
stand-in is the session's independent single-core Python oracle at 0.18 s per
full verification (5.56 proofs/s).  vs_baseline = throughput / 5.56.
"""

import json
import sys
import time

import numpy as np

BASELINE_PROOFS_PER_S = 1 / 0.18  # Python oracle, 1 CPU core (BASELINE.md)


def bench_stream(n_proofs: int, chunk: int, device_parse: bool = False):
    """System throughput: N DISTINCT byte blobs through the full ingestion
    path (parse -> stack -> H2D -> verify; --device-parse: pack -> one-array
    H2D -> in-graph deserialize+verify), the honest end-to-end metric -- the
    batch mode below times pure device compute on one replicated proof
    (reference main() times deserialization too, main.rs:200-204)."""
    import os
    os.environ.setdefault("STARK_PALLAS", "1")
    os.environ.setdefault("STARK_PALLAS_WALK", "1")
    import time
    import jax
    import stark_verifier_tpu as sv
    sv.enable_compile_cache()
    from stark_verifier_tpu.parallel import mesh as M

    with open("/root/reference/proof.bin", "rb") as f:
        pb = f.read()
    blobs = [bytes(pb) for _ in range(n_proofs)]   # distinct buffers

    mesh = M.make_mesh(1)
    # warm: compile the sharded verifier at the chunk shape
    warm = list(M.verify_stream(blobs[:chunk], chunk=chunk, mesh=mesh,
                                device_parse=device_parse))
    assert all(v for _, v in warm)

    t0 = time.perf_counter()
    results = list(M.verify_stream(blobs, chunk=chunk, mesh=mesh,
                                   device_parse=device_parse))
    dt = time.perf_counter() - t0
    assert len(results) == n_proofs and all(v for _, v in results)
    rate = n_proofs / dt
    wire_mb = len(pb) * n_proofs / dt / 1e6
    print(json.dumps({
        "metric": "stream MiMC-STARK verifications/s (1 chip, "
                  + ("device-parse+H2D+verify)" if device_parse
                     else "parse+H2D+verify)"),
        "value": round(rate, 2),
        "unit": "proofs/s",
        "vs_baseline": round(rate / BASELINE_PROOFS_PER_S, 2),
        "n_proofs": n_proofs, "chunk": chunk,
        "device_parse": device_parse,
        "wire_MBps": round(wire_mb, 1),
        "device": str(jax.devices()[0]),
    }))


def bench_stream_prestage(n_proofs: int, chunk: int):
    """Upload-then-verify system throughput with device-side parsing.

    Packs all wire blobs on host and uploads them BEFORE the first jitted
    execution (this environment's axon tunnel degrades H2D ~40x after the
    first execution -- docs/PERF.md; a real PCIe host has no such cliff, so
    this mode is the honest stand-in for the real-host overlapped
    pipeline), then verifies chunks of device-resident words with the
    in-graph deserializer.  Reports pack/upload/verify phases and the
    combined rate over upload+verify."""
    import os
    os.environ.setdefault("STARK_PALLAS", "1")
    os.environ.setdefault("STARK_PALLAS_WALK", "1")
    import time
    import numpy as np
    import jax
    import stark_verifier_tpu as sv
    sv.enable_compile_cache()
    from stark_verifier_tpu.config import StarkConfig
    from stark_verifier_tpu.parallel import mesh as M
    from stark_verifier_tpu.proofio import static_layout as SL

    with open("/root/reference/proof.bin", "rb") as f:
        pb = f.read()
    n_proofs = -(-n_proofs // chunk) * chunk       # whole chunks: one shape
    blobs = [bytes(pb) for _ in range(n_proofs)]
    cfg = StarkConfig()
    lay = SL.canonical_layout(cfg)

    t0 = time.perf_counter()
    packed, _lens = lay.pack(blobs)                # [n, words] uint32
    t_pack = time.perf_counter() - t0

    t0 = time.perf_counter()
    words_all = jax.device_put(packed)             # BEFORE any execution
    jax.block_until_ready(words_all)
    t_h2d = time.perf_counter() - t0

    mesh = M.make_mesh(1)
    # chunked-in-graph: ONE dispatch for the whole prestaged batch
    fn, _ = M.make_sharded_blob_verifier(mesh, cfg, chunk=chunk)
    warm = np.asarray(fn(words_all)[0])            # compile + warm
    assert warm.all(), "golden proof rejected -- refusing to bench"

    t0 = time.perf_counter()
    v = np.asarray(fn(words_all)[0])
    t_verify = time.perf_counter() - t0
    assert v.all()

    rate = n_proofs / (t_h2d + t_verify)
    print(json.dumps({
        "metric": "prestaged stream verifications/s (1 chip, "
                  "upload+device-parse+verify)",
        "value": round(rate, 2),
        "unit": "proofs/s",
        "vs_baseline": round(rate / BASELINE_PROOFS_PER_S, 2),
        "n_proofs": n_proofs, "chunk": chunk,
        "pack_s": round(t_pack, 3),
        "h2d_s": round(t_h2d, 3),
        "h2d_GBps": round(len(pb) * n_proofs / t_h2d / 1e9, 2),
        "verify_s": round(t_verify, 3),
        "verify_proofs_per_s": round(n_proofs / t_verify, 1),
        "device": str(jax.devices()[0]),
    }))


def main():
    import os
    if "--stream-prestage" in sys.argv:
        args = [a for a in sys.argv[1:]
                if a not in ("--stream-prestage", "--device-parse")]
        n = int(args[0]) if args else 4096
        chunk = int(args[1]) if len(args) > 1 else 512
        return bench_stream_prestage(n, chunk)
    if "--stream" in sys.argv:
        dp = "--device-parse" in sys.argv
        args = [a for a in sys.argv[1:]
                if a not in ("--stream", "--device-parse")]
        n = int(args[0]) if args else 4096
        chunk = int(args[1]) if len(args) > 1 else 512
        return bench_stream(n, chunk, device_parse=dp)
    # fused Pallas protocol kernels (ops/fri_pallas.py, ops/spot_pallas.py):
    # +29% measured (7,607 -> 9,796 proofs/s at batch 4096, docs/PERF.md);
    # opt out with STARK_PALLAS=0 if the Mosaic toolchain misbehaves
    os.environ.setdefault("STARK_PALLAS", "1")
    # fused Pallas whole-walk Merkle kernels (ops/merkle_pallas.py): +25.5%
    # measured (18,237 -> 22,886 proofs/s at batch 8192, docs/PERF.md r4)
    os.environ.setdefault("STARK_PALLAS_WALK", "1")
    import jax
    import stark_verifier_tpu as sv
    sv.enable_compile_cache()
    from stark_verifier_tpu.config import StarkConfig
    from stark_verifier_tpu.proofio import wire, device
    from stark_verifier_tpu.protocol import verify as V

    # defaults from the round-3 sweep (tools/bench_sweep.sh, docs/PERF.md):
    # batch 8192 / chunk 512 peaks at 18.3k proofs/s; 16384 exceeds HBM
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    with open("/root/reference/proof.bin", "rb") as f:
        proof_bytes = f.read()
    tree = device.proof_tree(wire.parse_proof_fast(proof_bytes))
    tree = device.to_device(device.replicate_proof(tree, batch))

    # STARK_SHARED_MERKLE=0 ablates the shared-path Merkle walk (dedup of
    # the converging upper-tree levels, ops/merkle.py) back to the
    # independent lockstep walk
    shared = os.environ.get("STARK_SHARED_MERKLE", "1") == "1"
    chunk = int(os.environ.get("STARK_CHUNK", "512"))
    if batch > chunk and batch % chunk:
        # a silent fall-through to the flat graph would mislabel the sweep
        # measurement (a flat 8192-proof graph is a different working set)
        raise SystemExit(f"STARK_CHUNK={chunk} does not divide batch {batch}")
    if batch > chunk and batch % chunk == 0:
        # beyond the ~1024 working-set sweet spot, chunk inside the graph
        # (docs/PERF.md batch-scaling note); STARK_CHUNK tunes the chunk size
        fn, _ = V.make_chunked_verifier(StarkConfig(), chunk=chunk,
                                        shared_merkle=shared)
    else:
        fn, _ = V.make_verifier(StarkConfig(), shared_merkle=shared)
    verdicts = np.asarray(fn(tree))  # compile + warm
    assert verdicts.all(), "golden proof rejected -- refusing to bench"

    times = []
    for _ in range(iters):
        t = time.perf_counter()
        # np.asarray, not block_until_ready: through the axon tunnel,
        # block_until_ready has been observed to return before the TPU
        # computation completes; fetching the [batch] verdict bytes to host
        # is the honest end-of-pipeline sync (and is what a caller needs).
        ok = np.asarray(fn(tree))
        times.append(time.perf_counter() - t)
        assert ok.all()

    # single-proof latency floor (batch 1, steady state): (a) tree staged on
    # device -- the pure verify latency; (b) including per-call H2D staging +
    # verdict fetch -- what a caller holding raw bytes sees.  Costs one extra
    # batch-1 graph compile; STARK_BENCH_LATENCY=0 skips.
    lat = {}
    if os.environ.get("STARK_BENCH_LATENCY", "1") == "1":
        single = device.proof_tree(wire.parse_proof_fast(proof_bytes))
        fn1, _ = V.make_verifier(StarkConfig(), shared_merkle=shared)
        dev1 = device.to_device(single)
        assert bool(np.asarray(fn1(dev1)))         # compile + warm

        def p50(f, n=30):
            ts = []
            for _ in range(n):
                t = time.perf_counter()
                assert np.asarray(f()).all()
                ts.append(time.perf_counter() - t)
            return round(float(np.percentile(ts, 50)) * 1e3, 2)

        lat["latency_p50_ms_device"] = p50(lambda: fn1(dev1))
        lat["latency_p50_ms_e2e"] = p50(
            lambda: fn1(device.to_device(single)))

    from stark_verifier_tpu.profiling import BenchReport
    report = BenchReport(batch=batch, iters=iters,
                         p50_s=float(np.percentile(times, 50)),
                         device=str(jax.devices()[0]), n_devices=1)
    print(report.to_json(), file=sys.stderr)   # full metrics report
    print(json.dumps({
        "metric": "batched MiMC-STARK verifications/s (1 chip)",
        "value": round(report.proofs_per_s, 2),
        "unit": "proofs/s",
        "vs_baseline": round(report.proofs_per_s / BASELINE_PROOFS_PER_S, 2),
        **lat,
    }))


if __name__ == "__main__":
    main()
