"""Corruption fuzz: single byte flips anywhere in the proof must reject.

Every flipped byte lands in some component (roots, branch values, siblings,
witnesses, length prefixes, FRI points in strict mode) -- the batched
verifier or the parser must reject each one while the untouched proof still
accepts.  This is the negative-test sweep of SURVEY.md section 4(c)."""

import random

import numpy as np

import stark_verifier_tpu as sv
from stark_verifier_tpu.config import StarkConfig
from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.protocol import verify as V

rng = random.Random(0xF1A7)


def test_random_byte_flips_reject(proof_bytes):
    fn, _ = V.make_verifier(StarkConfig())
    n = len(proof_bytes)
    # deterministic spread of offsets across the whole wire format, plus the
    # structurally interesting first bytes of each region
    offsets = sorted({0, 32, 64, 68, 100, 104, 110, n - 1, n - 33}
                     | {rng.randrange(n) for _ in range(16)})
    accepted = []
    for off in offsets:
        b = bytearray(proof_bytes)
        b[off] ^= 1 << rng.randrange(8)
        blob = bytes(b)
        try:
            # the real API path: parse + family-shape validation (a flipped
            # size field can reshape the proof; with the reference's
            # trailing-byte tolerance only validation catches that)
            tree = device.to_device(device.proof_tree(
                wire.parse_and_validate(blob, StarkConfig())))
        except wire.WireFormatError:
            continue  # parser/validator rejected: fine
        if bool(np.asarray(fn(tree))):
            accepted.append(off)
    # the POINTS element is parsed but ignored in parity mode -- flips there
    # legitimately accept (reference behavior); everything else must reject
    for off in accepted:
        assert _in_ignored_region(off, proof_bytes), \
            f"flip at offset {off} accepted outside the ignored POINTS region"
    # sanity: untouched proof still accepts
    tree = device.to_device(device.proof_tree(wire.parse_proof(proof_bytes)))
    assert bool(np.asarray(fn(tree)))


def test_batched_region_sweep(proof_bytes):
    """Batched corruption sweep: one verify call covers a whole batch of
    single-bit flips across committed-value regions (the scalable form of
    this suite -- tools/fuzz_sweep.py runs thousands of offsets on TPU)."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from fuzz_sweep import span_map

    spans = span_map(proof_bytes)
    batch = 64
    picks = [spans[rng.randrange(len(spans))] for _ in range(batch)]
    offsets = [rng.randrange(s, e) for s, e, _ in picks]

    fn, _ = V.make_verifier(StarkConfig(strict=True))
    trees = []
    for off in offsets:
        b = bytearray(proof_bytes)
        b[off] ^= 1 << rng.randrange(8)
        trees.append(device.proof_tree(
            wire.parse_and_validate(bytes(b), StarkConfig(strict=True))))
    verdicts = np.asarray(fn(device.to_device(device.stack_proofs(trees))))
    accepted = [(offsets[i], picks[i][2]) for i in range(batch) if verdicts[i]]
    assert not accepted, f"corruptions accepted: {accepted}"


def test_fuzz_sweep_artifact_coverage():
    """The TPU-scale differential sweep artifact (tools/fuzz_sweep.py) must
    cover >= 1000 offsets with FULL per-mutation oracle agreement, record
    the kernel config it certified (round-4 verdict item 2), and include
    the parity-accept classes (POINTS flips / trailing garbage) the old
    reject-only sweep could not check."""
    import json
    import os
    import pytest
    path = "/root/repo/FUZZ_SWEEP.json"
    if not os.path.exists(path):
        pytest.skip("run tools/fuzz_sweep.py to generate the artifact")
    with open(path) as f:
        d = json.load(f)
    assert d["offsets_tested"] >= 1000
    assert d["parity_agreed"] == d["offsets_tested"]
    assert d["strict_checked"] == d["offsets_tested"]
    assert d["parity_accepts"] >= 1          # POINTS/trailing accepts seen
    assert d["kernels"]["STARK_PALLAS"] == "1"
    assert d["kernels"]["STARK_PALLAS_WALK"] == "1"
    assert d["regions"].get("points", 0) >= 1
    assert d["regions"].get("trailing", 0) >= 1


def _in_ignored_region(off: int, proof_bytes: bytes) -> bool:
    """True if `off` lies in the POINTS payload (ignored in parity mode)."""
    r = wire._Reader(proof_bytes)
    r.take(64)
    while True:
        tag = r.u32()
        if tag == 1:
            r.take(32)
            wire._parse_multiproof(r)
            wire._parse_multiproof(r)
        elif tag == 2:
            psize = r.u32()
            start = r.off
            return start <= off < start + psize
    return False
