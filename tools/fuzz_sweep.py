"""Batched byte-flip corruption sweep (SURVEY.md section 4(c) at scale).

Stacks hundreds of single-bit-flip corruptions of the golden proof into
batched verifications -- thousands of offsets per minute on the TPU -- and
asserts every one rejects (strict mode, so POINTS bytes are load-bearing
too).  Offsets land in committed-value regions (roots / values / siblings /
witnesses / points), which keep the parsed shapes stackable; length-prefix
corruption is the parser error-model's job (test_native_parser,
test_fuzz_flips).

Writes FUZZ_SWEEP.json at the repo root:
  {"offsets_tested": N, "rejected": N, "batch": B, "regions": {...}}

Usage:  timeout 1800 python tools/fuzz_sweep.py [n_offsets] [batch]
"""

import json
import random
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


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


def main():
    import jax
    from stark_verifier_tpu.config import StarkConfig
    from stark_verifier_tpu.proofio import wire, device
    from stark_verifier_tpu.protocol import verify as V

    n_offsets = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = random.Random(0xF1A7)

    with open("/root/reference/proof.bin", "rb") as f:
        proof_bytes = f.read()
    spans = span_map(proof_bytes)
    total_bytes = sum(e - s for s, e, _ in spans)
    print(f"{len(spans)} committed-value spans, {total_bytes} bytes", flush=True)

    # one offset per span (shuffled so truncation never starves a region),
    # then uniform filler over all committed bytes
    offsets = []
    for s, e, kind in spans:
        offsets.append((rng.randrange(s, e), kind))
    rng.shuffle(offsets)
    flat = [(o, k) for s, e, k in spans for o in range(s, e)]
    while len(offsets) < n_offsets:
        offsets.append(flat[rng.randrange(len(flat))])
    offsets = offsets[:n_offsets]

    fn, _ = V.make_verifier(StarkConfig(strict=True))
    golden = device.proof_tree(wire.parse_proof_fast(proof_bytes))
    gt = device.to_device(device.replicate_proof(golden, batch))
    t0 = time.perf_counter()
    assert np.asarray(fn(gt)).all(), "golden rejected"
    print(f"compile+golden batch: {time.perf_counter() - t0:.1f}s", flush=True)

    rejected = 0
    region_counts = {}
    t0 = time.perf_counter()
    for i in range(0, len(offsets), batch):
        chunk = offsets[i:i + batch]
        trees = []
        for off, kind in chunk:
            b = bytearray(proof_bytes)
            b[off] ^= 1 << rng.randrange(8)
            trees.append(device.proof_tree(wire.parse_proof_fast(bytes(b))))
            region_counts[kind] = region_counts.get(kind, 0) + 1
        while len(trees) < batch:
            trees.append(golden)
        verdicts = np.asarray(fn(device.to_device(device.stack_proofs(trees))))
        bad = [chunk[j] for j in range(len(chunk)) if verdicts[j]]
        assert not bad, f"corruptions ACCEPTED: {bad[:10]}"
        rejected += len(chunk)
        print(f"  {rejected}/{len(offsets)} rejected "
              f"({rejected / (time.perf_counter() - t0):.0f} offsets/s)",
              flush=True)

    out = {"offsets_tested": len(offsets), "rejected": rejected,
           "batch": batch, "strict": True,
           "regions": region_counts}
    with open("/root/repo/FUZZ_SWEEP.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
