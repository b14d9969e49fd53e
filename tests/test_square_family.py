"""Second statement family (models/square.py, x <- x^2 + k): fresh
prover-generated proofs verify end-to-end, cross-checked against the oracle,
and the two families' verifiers are not interchangeable.

This is what keeps the StatementFamily abstraction (models/base.py)
load-bearing: the same protocol/ops machinery, dispatched on
StarkConfig.power (round-3 verdict item 10)."""

import numpy as np
import pytest

from stark_verifier_tpu import fp
from stark_verifier_tpu.config import StarkConfig
from stark_verifier_tpu.models import FAMILIES
from stark_verifier_tpu.models.square import SquareStatement
from stark_verifier_tpu.proofio import device, wire

import oracle
import prover

STEPS = 512
CONSTANTS = [(i ** 5) ^ 9 for i in range(16)]
CFG = StarkConfig(log_steps=9, num_constants=16, power=2)


@pytest.fixture(scope="module")
def square_proof():
    pb, out = prover.prove_to_bytes(7, STEPS, CONSTANTS, power=2)
    return pb, out


def test_registry():
    assert set(FAMILIES) == {"mimc", "square"}
    fam = FAMILIES["square"](CFG)
    assert fam.config().power == 2


def test_oracle_accepts_square_proof(square_proof):
    pb, out = square_proof
    proof, consumed = oracle.parse_proof(pb)
    assert consumed == len(pb)
    assert out == oracle.mimc(7, STEPS, CONSTANTS, power=2)
    assert oracle.verify_mimc_proof(7, STEPS, CONSTANTS, out, proof,
                                    parity_guards=False, power=2)


def test_square_family_output():
    # compute_output uses the family's DEFAULT (i^7)^42 constants
    fam = SquareStatement(CFG)
    got = fp.limbs_to_int(np.asarray(fam.compute_output(7)))
    want = oracle.mimc(7, STEPS, [(i ** 7) ^ 42 for i in range(16)], power=2)
    assert got == want


def test_square_family_verifies_and_tamper_rejects(square_proof):
    pb, out = square_proof
    fam = SquareStatement(CFG)
    fn, _ = fam.make_general_verifier()
    import jax.numpy as jnp

    tree = device.to_device(device.proof_tree(
        wire.parse_and_validate(pb, CFG)))
    args = (jnp.asarray(fp.int_to_limbs(7)),
            jnp.asarray(fp.ints_to_limbs(CONSTANTS)),
            jnp.asarray(fp.int_to_limbs(out)))
    assert bool(np.asarray(fn(tree, *args)))

    # wrong claimed output rejects
    bad_out = jnp.asarray(fp.int_to_limbs((out + 1) % fp.MODULUS))
    assert not bool(np.asarray(fn(tree, args[0], args[1], bad_out)))

    # tampered committed value rejects
    b = bytearray(pb)
    b[200] ^= 1
    tree_bad = device.to_device(device.proof_tree(
        wire.parse_and_validate(bytes(b), CFG)))
    assert not bool(np.asarray(fn(tree_bad, *args)))


def test_families_not_interchangeable(square_proof):
    """A square-family proof must NOT verify under the cubic AIR with the
    same parameters (the transition constraint actually binds)."""
    pb, out = square_proof
    import jax.numpy as jnp
    from stark_verifier_tpu.models.mimc import MimcStatement

    cfg3 = StarkConfig(log_steps=9, num_constants=16, power=3)
    fn3, _ = MimcStatement(cfg3).make_general_verifier()
    tree = device.to_device(device.proof_tree(
        wire.parse_and_validate(pb, cfg3)))
    assert not bool(np.asarray(fn3(
        tree, jnp.asarray(fp.int_to_limbs(7)),
        jnp.asarray(fp.ints_to_limbs(CONSTANTS)),
        jnp.asarray(fp.int_to_limbs(out)))))
