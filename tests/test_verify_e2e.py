"""End-to-end golden test: the jitted TPU verifier accepts proof.bin and
rejects corruptions -- the parity gate of SURVEY.md section 7 step 5."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from stark_verifier_tpu.config import StarkConfig, StatementTables
from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.protocol import verify as V
from stark_verifier_tpu.ops import field as F, mimc as mimc_ops, ntt
from stark_verifier_tpu import fp


@pytest.fixture(scope="module")
def verifier():
    return V.make_verifier()


@pytest.fixture(scope="module")
def tree(proof_bytes):
    return device.to_device(device.proof_tree(wire.parse_proof(proof_bytes)))


def test_minipoly_matches_oracle():
    tables = StatementTables(StarkConfig())
    constants = jnp.asarray(mimc_ops.round_constants_mimc(64))
    mini = ntt.intt(constants, tables.minipoly_root)
    got = [fp.limbs_to_int(r) for r in np.asarray(mini)]
    exp = oracle.fft_inv(oracle.mimc_round_constants(), tables.minipoly_root)
    assert got == exp


def test_mimc_device_output():
    constants = jnp.asarray(mimc_ops.round_constants_mimc(64))
    out = mimc_ops.mimc(F.const(3), 8192, constants)
    assert fp.limbs_to_int(np.asarray(out)) == oracle.mimc(
        3, 8192, oracle.mimc_round_constants())


def test_fri_accepts(tree):
    import jax
    cfg = StarkConfig()
    tables = StatementTables(cfg)
    fri_fn = jax.jit(lambda r, t: V.verify_low_degree_proof(r, t, tables, cfg))
    ok = fri_fn(tree["l_merkle_root"], tree["fri"])
    assert bool(np.asarray(ok))


def test_e2e_accepts_golden_proof(verifier, tree):
    fn, _ = verifier
    assert bool(np.asarray(fn(tree)))


def test_e2e_rejects_corrupted_roots(verifier, proof_bytes):
    fn, _ = verifier
    for byte_idx in (0, 32):  # merkle_root, l_merkle_root
        b = bytearray(proof_bytes)
        b[byte_idx] ^= 1
        t = device.to_device(device.proof_tree(wire.parse_proof(bytes(b))))
        assert not bool(np.asarray(fn(t)))


def test_e2e_rejects_corrupted_value(verifier, proof_bytes):
    fn, _ = verifier
    b = bytearray(proof_bytes)
    b[110] ^= 0x80  # inside the first FRI column branch's value bytes
    t = device.to_device(device.proof_tree(wire.parse_proof(bytes(b))))
    assert not bool(np.asarray(fn(t)))


def test_facade_maps_parse_failure_to_reject(proof_bytes):
    """Corrupting a length prefix breaks parsing; the library facade rejects
    instead of raising (the reference would panic, SURVEY.md 2.2.8)."""
    import stark_verifier_tpu as sv
    b = bytearray(proof_bytes)
    b[100] ^= 0x80  # branch-count prefix of the first FRI column MultiProof
    assert sv.verify_proof_bytes(bytes(b)) is False


def test_e2e_rejects_tampered_main_value(verifier, tree):
    fn, _ = verifier
    import jax
    t = jax.tree.map(lambda x: np.array(x), tree)
    t["main"]["value"][3, 0] ^= 1
    t = device.to_device(t)
    assert not bool(np.asarray(fn(t)))


def test_batched_verify_mixed_verdicts(verifier, proof_bytes):
    """A batch of [good, bad, good] proofs returns [True, False, True]."""
    fn, _ = verifier
    good = device.proof_tree(wire.parse_proof(proof_bytes))
    b = bytearray(proof_bytes)
    b[200] ^= 2
    bad = device.proof_tree(wire.parse_proof(bytes(b)))
    batch = device.to_device(device.stack_proofs([good, bad, good]))
    got = np.asarray(fn(batch))
    assert got.tolist() == [True, False, True]


def test_chunked_verifier_matches_flat(proof_bytes):
    """In-graph chunking (lax.map over chunk-size slices) returns the same
    per-proof verdicts as the flat batch path."""
    from stark_verifier_tpu.protocol.verify import make_chunked_verifier
    golden = device.proof_tree(wire.parse_proof(proof_bytes))
    bad = device.proof_tree(wire.parse_proof(proof_bytes))
    bad["lincomb"]["value"] = bad["lincomb"]["value"].copy()
    bad["lincomb"]["value"][0, 0] ^= 1
    batch = device.to_device(device.stack_proofs([golden, bad, bad, golden]))
    fn, _ = make_chunked_verifier(StarkConfig(), chunk=2)
    got = np.asarray(fn(batch))
    assert got.tolist() == [True, False, False, True]
