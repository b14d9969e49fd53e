"""Command-line driver, mirroring the reference binary's behavior.

Reference: /root/reference/src/main.rs:199-227 -- reads proof.bin, recomputes
the MiMC output, verifies, prints phase timings and `proof verified`.  This
CLI adds what the hardcoded binary lacks (SURVEY.md section 5 config item):
a proof path argument, batch mode, strictness and profiling flags, and a
nonzero exit code on rejection instead of a panic.

Usage:
  python -m stark_verifier_tpu.cli verify [PROOF.bin] [--batch N] [--profile]
  python -m stark_verifier_tpu.cli bench  [PROOF.bin] [--batch N] [--iters K]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time

import numpy as np

log = logging.getLogger("stark_verifier_tpu")


def _build_parser():
    ap = argparse.ArgumentParser(prog="stark_verifier_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("verify", "bench"):
        sp = sub.add_parser(name)
        sp.add_argument("proof", nargs="?", default="proof.bin",
                        help="path to serialized proof (default: ./proof.bin)")
        sp.add_argument("--batch", type=int, default=1,
                        help="replicate the proof to a batch of this size")
        sp.add_argument("--input", type=int, default=3,
                        help="MiMC input (reference hardcodes 3, main.rs:206)")
        sp.add_argument("--log-steps", type=int, default=13)
        sp.add_argument("--strict", action="store_true",
                        help="also bind the FRI POINTS element to the final "
                             "committed root (the check the reference skips)")
        sp.add_argument("--profile", action="store_true",
                        help="dump a jax.profiler trace to ./trace")
        if name == "bench":
            sp.add_argument("--iters", type=int, default=20)
            sp.add_argument("--devices", type=int, default=1,
                            help="shard the batch over the first N devices "
                                 "(parallel/mesh); N=1 uses the single-chip "
                                 "verifier")
            sp.add_argument("--ref-single-chip", type=float, default=None,
                            help="proofs/s of a 1-chip run, for the scaling-"
                                 "efficiency line (BASELINE.md >=80% metric)")
    return ap


def _prepare(args, times: "PhaseTimes"):
    import jax
    import stark_verifier_tpu as sv
    sv.enable_compile_cache()
    from stark_verifier_tpu.config import StarkConfig
    from stark_verifier_tpu.proofio import wire, device
    from stark_verifier_tpu.protocol import verify as V

    cfg = StarkConfig(log_steps=args.log_steps,
                      strict=getattr(args, "strict", False))
    n_devices = getattr(args, "devices", 1)
    with times.phase("parse"):
        with open(args.proof, "rb") as f:
            proof_bytes = f.read()
        try:
            parsed = wire.parse_and_validate(proof_bytes, cfg)
        except wire.WireFormatError as e:
            print(f"malformed proof: {e}", file=sys.stderr)
            sys.exit(2)
        tree = parsed_tree = device.proof_tree(parsed)
        if args.batch > 1 or n_devices > 1:
            tree = device.replicate_proof(tree, max(args.batch, 1))
    shared = device.is_rectangular(parsed_tree)

    if n_devices > 1:
        # batch-parallel over a device mesh (parallel/mesh): the verdict AND
        # is the only cross-chip collective; per-chip throughput at N vs 1
        # is the BASELINE.md scaling-efficiency metric
        from stark_verifier_tpu.parallel import mesh as M
        if args.batch % n_devices:
            print(f"--batch {args.batch} must be a multiple of --devices "
                  f"{n_devices}", file=sys.stderr)
            sys.exit(2)
        m = M.make_mesh(n_devices)
        with times.phase("h2d (sharded)"):
            tree = M.shard_batch(tree, m)
            jax.block_until_ready(tree)
        inner = M.make_sharded_verifier(m, cfg, inp=args.input,
                                        shared_merkle=shared)
        fn = lambda t: inner(t)[0]   # noqa: E731  (verdicts; drop the scalar)
        return jax, fn, tree

    with times.phase("h2d"):
        tree = device.to_device(tree)
        jax.block_until_ready(tree)
    fn, _tables = V.make_verifier(cfg, inp=args.input, shared_merkle=shared)
    return jax, fn, tree


def cmd_verify(args):
    from stark_verifier_tpu.profiling import PhaseTimes, maybe_trace
    times = PhaseTimes()
    jax, fn, tree = _prepare(args, times)

    with times.phase("verify (jit compile + run)"):
        verdicts = np.asarray(fn(tree))

    if args.profile:
        with maybe_trace(True):
            with times.phase("verify (steady state)"):
                np.asarray(fn(tree))

    n = max(args.batch, 1)
    ok = bool(verdicts.all())
    for name, secs in times.phases.items():
        print(f"{name}: {secs * 1e3:.1f} ms")
    if ok:
        print("proof verified")
        return 0
    bad = np.flatnonzero(~np.atleast_1d(verdicts))
    print(f"proof REJECTED (batch indices: {bad.tolist()})")
    return 1


def cmd_bench(args):
    from stark_verifier_tpu.profiling import PhaseTimes, BenchReport, maybe_trace
    times = PhaseTimes()
    jax, fn, tree = _prepare(args, times)
    with times.phase("compile + warm"):
        verdicts = np.asarray(fn(tree))
    if not verdicts.all():
        print("proof rejected; refusing to bench a failing verify", file=sys.stderr)
        return 1
    n = max(args.batch, 1)
    samples = []
    with maybe_trace(args.profile):
        for _ in range(args.iters):
            t = time.perf_counter()
            jax.block_until_ready(fn(tree))
            samples.append(time.perf_counter() - t)
    from stark_verifier_tpu.config import StarkConfig
    from stark_verifier_tpu.profiling import compressions_per_proof
    report = BenchReport(
        batch=n, iters=args.iters,
        p50_s=float(np.percentile(samples, 50)),
        device=str(jax.devices()[0]),
        n_devices=args.devices,
        comp_per_proof=compressions_per_proof(
            StarkConfig(log_steps=args.log_steps)),
    )
    log.info("phases: %s",
             {k: round(v * 1e3, 1) for k, v in times.phases.items()})
    print(report.to_json())
    if args.ref_single_chip:
        eff = report.proofs_per_s_per_chip / args.ref_single_chip
        print(json.dumps({"scaling_efficiency": round(eff, 4),
                          "n_devices": args.devices,
                          "ref_single_chip_proofs_per_s": args.ref_single_chip}))
    return 0


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    args = _build_parser().parse_args(argv)
    if args.cmd == "verify":
        return cmd_verify(args)
    return cmd_bench(args)


if __name__ == "__main__":
    sys.exit(main())
