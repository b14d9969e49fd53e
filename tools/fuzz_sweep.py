"""Batched byte-flip corruption sweep with differential oracle agreement.

Certifies the PRODUCTION kernel set on real hardware (round-4 verdict item
2): the env defaults here match bench.py (STARK_PALLAS=1 Mosaic protocol
kernels, STARK_PALLAS_WALK=1 whole-walk Merkle kernels, dense tail 2), and
the active kernel config is recorded in the output so the artifact says
what it certified.  The hot loops being certified replace
/root/reference/src/merkle_tree.rs:119-163 and src/utils.rs:196-244.

Two checks per mutated blob, batched on the TPU:
  * differential (parity cfg): repo verdict must EQUAL the Python bigint
    oracle's verdict (tests/oracle.py = reference semantics) -- catches
    false-accepts AND false-rejects, including the accept cases the old
    reject-only sweep could not see (POINTS flips verify in parity mode
    since the reference discards them, deserializer.rs:47-59; trailing
    garbage verifies, main.rs:204).
  * strict cfg: every strict accept must also be a parity accept, POINTS
    flips and trailing garbage must flip to reject (the strict mode closes
    main.rs:94's TODO), and non-POINTS corruptions keep rejecting.

Offsets land in committed-value regions (roots / values / siblings /
witnesses / points), which keep the parsed shapes stackable; length-prefix
corruption is the parser error-model's job (test_native_parser,
test_fuzz_flips).  The oracle runs on a process pool overlapping the TPU
batches.

Writes FUZZ_SWEEP.json at the repo root:
  {"offsets_tested": N, "parity_agreed": N, "strict_checked": N,
   "parity_accepts": K, "kernels": {...}, "regions": {...}}

Usage:  timeout 3600 python tools/fuzz_sweep.py [n_offsets] [batch]
"""

import json
import os
import random
import subprocess
import sys
import time
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

_PROOF = None


def get_proof() -> bytes:
    """Lazy golden-proof loader (module import must stay side-effect free:
    tests import span_map on hosts that may lack /root/reference)."""
    global _PROOF
    if _PROOF is None:
        with open("/root/reference/proof.bin", "rb") as f:
            _PROOF = f.read()
    return _PROOF


def span_map(proof_bytes: bytes):
    """Walk the wire format recording (start, end, kind) byte spans for
    committed values (same walk as wire.parse_proof)."""
    from stark_verifier_tpu.proofio import wire

    spans = []
    r = wire._Reader(proof_bytes)
    spans.append((0, 32, "merkle_root"))
    spans.append((32, 64, "l_merkle_root"))
    r.take(64)

    def group(kind):
        n = r.u32()
        for _ in range(n):
            vsize = r.u32()
            spans.append((r.off, r.off + vsize, f"{kind}_value"))
            r.take(vsize)
            spans.append((r.off, r.off + vsize, f"{kind}_sibling"))
            r.take(vsize)
            wsize = r.u32()
            spans.append((r.off, r.off + wsize, f"{kind}_witness"))
            r.take(wsize)

    level = 0
    while True:
        tag = r.u32()
        if tag == 1:
            spans.append((r.off, r.off + 32, f"fri{level}_root2"))
            r.take(32)
            group(f"fri{level}_col")
            group(f"fri{level}_poly")
            level += 1
        elif tag == 2:
            psize = r.u32()
            spans.append((r.off, r.off + psize, "points"))
            r.take(psize)
            break
    group("main")
    group("lincomb")
    return spans


def mutate(off_bit):
    off, bit = off_bit
    proof = get_proof()
    if off < 0:            # trailing-garbage case: append bytes
        return proof + b"\x5a" * 8
    b = bytearray(proof)
    b[off] ^= 1 << bit
    return bytes(b)


def oracle_verdict(off_bit):
    import oracle
    return bool(oracle.verify_proof_bytes(mutate(off_bit)))


def main():
    # production kernel env, matching bench.py defaults (set here, not at
    # module level: tests import span_map and must not inherit the flags)
    os.environ.setdefault("STARK_PALLAS", "1")
    os.environ.setdefault("STARK_PALLAS_WALK", "1")
    n_offsets = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = random.Random(0xF1A7)

    spans = span_map(get_proof())                 # imports proofio.wire (numpy-only)
    total_bytes = sum(e - s for s, e, _ in spans)
    print(f"{len(spans)} committed-value spans, {total_bytes} bytes",
          flush=True)

    # one offset per span (shuffled so truncation never starves a region),
    # then uniform filler over all committed bytes; a few trailing-garbage
    # cases (off = -1) exercise the parity-accept / strict-reject boundary
    offsets = [((rng.randrange(s, e), rng.randrange(8)), kind)
               for s, e, kind in spans]
    rng.shuffle(offsets)
    offsets = offsets[:max(0, n_offsets - 4)]
    offsets += [((-1, 0), "trailing")] * min(4, n_offsets)
    flat = [(o, k) for s, e, k in spans for o in range(s, e)]
    while len(offsets) < n_offsets:
        o, k = flat[rng.randrange(len(flat))]
        offsets.append(((o, rng.randrange(8)), k))
    offsets = offsets[:n_offsets]

    # oracle pool first -- spawned BEFORE the TPU backend initializes (no
    # TPU client in the workers), overlapping the ~8 min of graph compiles
    import multiprocessing
    pool = ProcessPoolExecutor(max_workers=3,
                               mp_context=multiprocessing.get_context("spawn"))
    oracle_futs = [pool.submit(oracle_verdict, ob) for ob, _ in offsets]

    import jax
    from stark_verifier_tpu.config import StarkConfig
    from stark_verifier_tpu.proofio import wire, device
    from stark_verifier_tpu.protocol import verify as V
    from stark_verifier_tpu.ops import merkle

    fn_par, _ = V.make_verifier(StarkConfig())
    fn_str, _ = V.make_verifier(StarkConfig(strict=True))
    golden = device.proof_tree(wire.parse_proof_fast(get_proof()))
    gt = device.to_device(device.replicate_proof(golden, batch))
    t0 = time.perf_counter()
    assert np.asarray(fn_par(gt)).all(), "golden rejected (parity)"
    assert np.asarray(fn_str(gt)).all(), "golden rejected (strict)"
    print(f"compile+golden batches: {time.perf_counter() - t0:.1f}s",
          flush=True)

    parity_agreed = strict_checked = parity_accepts = 0
    region_counts = {}
    t0 = time.perf_counter()
    for i in range(0, len(offsets), batch):
        chunk = offsets[i:i + batch]
        trees = []
        for ob, kind in chunk:
            trees.append(device.proof_tree(wire.parse_proof_fast(mutate(ob))))
            region_counts[kind] = region_counts.get(kind, 0) + 1
        while len(trees) < batch:
            trees.append(golden)
        bt = device.to_device(device.stack_proofs(trees))
        v_par = np.asarray(fn_par(bt))
        v_str = np.asarray(fn_str(bt))
        for j, (ob, kind) in enumerate(chunk):
            want = oracle_futs[i + j].result()
            got = bool(v_par[j])
            assert got == want, (
                f"PARITY DISAGREEMENT at {ob} ({kind}): repo={got} "
                f"oracle={want}")
            parity_agreed += 1
            parity_accepts += got
            # strict-mode invariants
            gs = bool(v_str[j])
            if kind == "points":
                # POINTS bytes are load-bearing only under the strict
                # direct check (closes main.rs:94's TODO)
                assert got and not gs, (
                    f"strict must reject points mutation at {ob} "
                    f"(parity={got}, strict={gs})")
            elif kind == "trailing":
                # trailing bytes reject at HOST parse in strict mode
                # (wire.parse_and_validate; the graph never sees them)
                assert got and gs, "trailing garbage must verify in-graph"
                try:
                    wire.parse_and_validate(mutate(ob),
                                            StarkConfig(strict=True))
                    raise AssertionError(
                        "strict parse accepted trailing bytes")
                except wire.WireFormatError:
                    pass
            else:
                assert gs == got, (
                    f"strict verdict diverged outside POINTS at {ob} "
                    f"({kind}): parity={got} strict={gs}")
            strict_checked += 1
        print(f"  {parity_agreed}/{len(offsets)} agreed "
              f"({parity_agreed / (time.perf_counter() - t0):.0f} offsets/s, "
              f"{parity_accepts} parity-accepts)", flush=True)
    pool.shutdown()

    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True,
                            cwd="/root/repo").stdout.strip()
    out = {"offsets_tested": len(offsets),
           "parity_agreed": parity_agreed,
           "strict_checked": strict_checked,
           "parity_accepts": parity_accepts,
           "batch": batch,
           "kernels": {
               "STARK_PALLAS": os.environ.get("STARK_PALLAS"),
               "STARK_PALLAS_WALK": os.environ.get("STARK_PALLAS_WALK"),
               "shared_tail": merkle._tail_cap(),
               "device": str(jax.devices()[0]),
               "commit": commit,
           },
           "regions": region_counts}
    with open("/root/repo/FUZZ_SWEEP.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
