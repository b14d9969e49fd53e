"""Strict mode: the POINTS-to-root binding the reference never performs
(SURVEY.md 2.2.10; reference main.rs:94 TODO, deserializer.rs:47-59)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stark_verifier_tpu.config import StarkConfig
from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.protocol import verify as V
from stark_verifier_tpu.ops import merkle


@pytest.fixture(scope="module")
def strict_fn():
    fn, _ = V.make_verifier(StarkConfig(strict=True))
    return fn


def test_points_root_matches_last_root2(proof_bytes):
    p = wire.parse_proof(proof_bytes)
    root = merkle.merkle_root_permuted(jnp.asarray(p.points_words))
    assert (np.asarray(root) == p.fri_levels[-1].root2_words).all()


def test_strict_accepts_golden(strict_fn, proof_bytes):
    t = device.to_device(device.proof_tree(wire.parse_proof(proof_bytes)))
    assert bool(np.asarray(strict_fn(t)))


def test_strict_rejects_tampered_points_parity_accepts(proof_bytes):
    """Flipping a POINTS byte is invisible to the parity verifier (reference
    behavior) but rejected in strict mode."""
    t = device.proof_tree(wire.parse_proof(proof_bytes))
    t["points"] = t["points"].copy()
    t["points"][5, 0] ^= 1
    td = device.to_device(t)
    parity_fn, _ = V.make_verifier(StarkConfig())
    strict_fn2, _ = V.make_verifier(StarkConfig(strict=True))
    assert bool(np.asarray(parity_fn(td)))      # reference ignores points
    assert not bool(np.asarray(strict_fn2(td)))
