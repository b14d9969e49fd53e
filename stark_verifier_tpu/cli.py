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
    with times.phase("parse"):
        with open(args.proof, "rb") as f:
            proof_bytes = f.read()
        try:
            parsed = wire.parse_proof_fast(proof_bytes)
        except wire.WireFormatError as e:
            print(f"malformed proof: {e}", file=sys.stderr)
            sys.exit(2)
        tree = parsed_tree = device.proof_tree(parsed)
        if args.batch > 1:
            tree = device.replicate_proof(tree, args.batch)
    with times.phase("h2d"):
        tree = device.to_device(tree)
        jax.block_until_ready(tree)

    fn, _tables = V.make_verifier(cfg, inp=args.input,
                                  shared_merkle=device.is_rectangular(parsed_tree))
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
    report = BenchReport(
        batch=n, iters=args.iters,
        p50_s=float(np.percentile(samples, 50)),
        device=str(jax.devices()[0]),
        n_devices=1,
    )
    log.info("phases: %s",
             {k: round(v * 1e3, 1) for k, v in times.phases.items()})
    print(report.to_json())
    return 0


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    args = _build_parser().parse_args(argv)
    if args.cmd == "verify":
        return cmd_verify(args)
    return cmd_bench(args)


if __name__ == "__main__":
    sys.exit(main())
