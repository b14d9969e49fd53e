"""Batched native ingestion (proofio/ingest.py): bitwise equality with the
per-proof parse path, failure masking, layout reuse, and pad semantics."""

import numpy as np
import pytest

import jax

from stark_verifier_tpu.config import StarkConfig
from stark_verifier_tpu.proofio import device, ingest, wire


def _trees_equal(a, b):
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        assert la.shape == lb.shape and (np.asarray(la) == np.asarray(lb)).all()


def test_ingest_matches_per_proof_path(proof_bytes):
    cfg = StarkConfig()
    blobs = [proof_bytes, proof_bytes + b"trailing", proof_bytes]
    tree, ok, layout = ingest.ingest_chunk(blobs, cfg)
    assert ok.tolist() == [True, True, True]
    want = device.stack_proofs(
        [device.proof_tree(wire.parse_proof(b)) for b in blobs])
    _trees_equal(tree, want)


def test_ingest_masks_failures_and_pads(proof_bytes):
    cfg = StarkConfig()
    blobs = [proof_bytes[:100],            # truncated -> scan failure
             proof_bytes,
             proof_bytes[:-5]]             # truncated mid-lincomb
    tree, ok, layout = ingest.ingest_chunk(blobs, cfg, pad_to=4)
    assert ok.tolist() == [False, True, False]
    # every slot (failed + pad) carries the first valid proof
    good = device.proof_tree(wire.parse_proof(proof_bytes))
    for j in range(4):
        _trees_equal(jax.tree.map(lambda a: a[j], tree), good)


def test_ingest_layout_reuse(proof_bytes):
    cfg = StarkConfig()
    tree1, ok1, layout = ingest.ingest_chunk([proof_bytes, proof_bytes], cfg)
    tree2, ok2, layout2 = ingest.ingest_chunk(
        [proof_bytes, proof_bytes], cfg, layout)
    assert layout2 is layout and tree2 is layout.tree
    assert ok2.all()
    good = device.proof_tree(wire.parse_proof(proof_bytes))
    _trees_equal(jax.tree.map(lambda a: a[0], tree2), good)


def test_ingest_wrong_family_rejects(proof_bytes):
    cfg = StarkConfig(log_steps=9)        # family expects 3 FRI levels
    tree, ok, _ = ingest.ingest_chunk([proof_bytes], cfg)
    assert tree is None and ok.tolist() == [False]


def test_ingest_structural_outlier_slow_path(proof_bytes):
    """A blob whose scan meta deviates from the chunk head (here: a proof
    with different witness maxima is simulated by a second family config --
    use the ragged prover output if available) routes through the per-proof
    path into the same slot."""
    import prover
    cfg9 = StarkConfig(log_steps=9)
    pb9, _out = prover.prove_to_bytes(5, 512, [(i ** 3) ^ 7 for i in range(16)])
    cfg9 = StarkConfig(log_steps=9, num_constants=16)
    tree, ok, _ = ingest.ingest_chunk([pb9, proof_bytes], cfg9)
    # second blob is a different family -> rejected; first fills slot 0
    assert ok.tolist() == [True, False]
    good = device.proof_tree(wire.parse_proof(pb9))
    _trees_equal(jax.tree.map(lambda a: a[0], tree), good)
