"""Fresh prover-generated proofs through the full device verifier.

Every other end-to-end test is pinned to the single bundled proof.bin
(statement: 2^13 steps, (i^7)^42 constants, inp 3).  tests/prover.py is the
verifier's inverse function; these tests use it to cover what the bundled
fixture cannot:

  * a DIFFERENT statement family (2^9 steps) accepted end-to-end,
  * the general (cdylib-shaped, lib.rs:99) API against a real proof of a
    non-default random constants family and non-default input,
  * strict mode against honestly generated POINTS (real low-degree data),
  * semantically-targeted tampering (per protocol site) rejected by both
    oracle and device paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
import prover
from stark_verifier_tpu import fp
from stark_verifier_tpu.config import StarkConfig
from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.protocol import verify as V

P = fp.MODULUS
STEPS = 512
CFG = StarkConfig(log_steps=9)
DEFAULT_CONSTS = [(i ** 7) ^ 42 for i in range(64)]


@pytest.fixture(scope="module")
def fresh_bytes():
    pb, out = prover.prove_to_bytes(3, STEPS, DEFAULT_CONSTS)
    assert out == oracle.mimc(3, STEPS, DEFAULT_CONSTS)
    return pb


@pytest.fixture(scope="module")
def small_verifier():
    return V.make_verifier(CFG, inp=3)


def test_oracle_accepts_fresh_proof(fresh_bytes):
    proof, consumed = oracle.parse_proof(fresh_bytes)
    assert consumed == len(fresh_bytes)
    assert len(proof.fri_levels) == CFG.fri_levels == 3
    assert len(proof.points) == CFG.fri_final_domain == 64
    out = oracle.mimc(3, STEPS, DEFAULT_CONSTS)
    assert oracle.verify_mimc_proof(3, STEPS, DEFAULT_CONSTS, out, proof,
                                    parity_guards=False)


def test_device_accepts_fresh_small_statement(small_verifier, fresh_bytes):
    fn, _ = small_verifier
    tree = device.to_device(device.proof_tree(wire.parse_proof(fresh_bytes)))
    assert bool(np.asarray(fn(tree)))


def test_device_rejects_semantic_tampering(small_verifier, fresh_bytes):
    """Flip one datum per protocol site on the parsed tree (device path) --
    every site must reject, matching the oracle walk."""
    fn, _ = small_verifier
    base = device.proof_tree(wire.parse_proof(fresh_bytes))
    import jax

    def mutate(path):
        t = jax.tree.map(lambda x: np.array(x), base)
        node = t
        for k in path[:-1]:
            node = node[k]
        leaf = node[path[-1]]
        flat = leaf.reshape(-1)
        flat[len(flat) // 2] ^= 1
        return device.to_device(t)

    sites = [
        ("merkle_root",), ("l_merkle_root",),
        ("fri", "root2"), ("fri", "col_value"), ("fri", "col_sibling"),
        ("fri", "poly_value"), ("fri", "col_witness", 0),
        ("fri", "poly_witness", 2),
        ("main", "value"), ("main", "witness"),
        ("lincomb", "value"), ("lincomb", "sibling"),
    ]
    for path in sites:
        assert not bool(np.asarray(fn(mutate(path)))), path


def test_device_batch_mixed_fresh(small_verifier, fresh_bytes):
    fn, _ = small_verifier
    good = device.proof_tree(wire.parse_proof(fresh_bytes))
    bad = device.proof_tree(wire.parse_proof(fresh_bytes))
    bad["main"]["value"] = bad["main"]["value"].copy()
    bad["main"]["value"][7, 3] ^= 4
    batch = device.to_device(device.stack_proofs([good, bad, good]))
    assert np.asarray(fn(batch)).tolist() == [True, False, True]


def test_strict_mode_on_fresh_points():
    """Strict mode (root binding + the real direct low-degree check,
    closing main.rs:94's TODO) against honestly generated POINTS: accepts;
    a POINTS value tampered at a non-multiple-of-8 position rejects."""
    fn, _ = V.make_verifier(StarkConfig(log_steps=9, strict=True), inp=3)
    pb, _ = prover.prove_to_bytes(3, STEPS, DEFAULT_CONSTS)
    tree = device.proof_tree(wire.parse_proof(pb))
    import jax
    assert bool(np.asarray(fn(device.to_device(tree))))

    t = jax.tree.map(lambda x: np.array(x), tree)
    t["points"][9, 0] ^= 1          # position 9: IS checked (not a multiple
                                    # of 8 -- the direct check skips those)
    assert not bool(np.asarray(fn(device.to_device(t))))


def test_stream_fresh_small_statement(fresh_bytes):
    """verify_stream on the 8-device mesh for a NON-default statement family:
    fresh proof accepts, a byte-flipped copy rejects, a truncated blob is
    skipped as a parse failure without aborting the stream."""
    from stark_verifier_tpu.parallel import mesh as M
    tampered = bytearray(fresh_bytes)
    tampered[120] ^= 1                      # inside a committed value
    blobs = [fresh_bytes, bytes(tampered), fresh_bytes[:300]]
    got = dict(M.verify_stream(blobs, chunk=8, cfg=CFG, inp=3))
    assert got == {0: True, 1: False, 2: False}


def test_general_api_fresh_random_family():
    """A real proof of a RANDOM constants family + non-default input through
    the general verifier (runtime inp/constants/output; lib.rs:99): accepts,
    and the same compiled graph rejects a mismatched statement."""
    import random
    rng = random.Random(0xF00D)
    consts = [rng.randrange(P) for _ in range(32)]
    inp = 987654321
    pb, out = prover.prove_to_bytes(inp, STEPS, consts)

    proof, consumed = oracle.parse_proof(pb)
    assert consumed == len(pb)
    assert oracle.verify_mimc_proof(inp, STEPS, consts, out, proof,
                                    parity_guards=False)

    cfg = StarkConfig(log_steps=9, num_constants=32)
    fn, _ = V.make_general_verifier(cfg)
    tree = device.to_device(device.proof_tree(wire.parse_proof(pb)))
    cl = jnp.asarray(fp.ints_to_limbs([c % P for c in consts]))

    def limbs(x):
        return jnp.asarray(fp.int_to_limbs(x % P))

    assert bool(np.asarray(fn(tree, limbs(inp), cl, limbs(out))))
    # same graph, wrong statement parameters -> reject (no recompilation)
    assert not bool(np.asarray(fn(tree, limbs(inp + 1), cl, limbs(out))))
    assert not bool(np.asarray(fn(tree, limbs(inp), cl, limbs(out + 1))))
    bad = list(consts)
    bad[11] ^= 1
    assert not bool(np.asarray(
        fn(tree, limbs(inp), jnp.asarray(fp.ints_to_limbs(bad)), limbs(out))))


def test_third_family_log_steps_11_e2e():
    """A THIRD statement family (log_steps=11, 32 constants, 4 FRI levels):
    prove fresh, verify through the library facade AND the device-parse
    canonical layout -- every family-geometry formula (FRI level count,
    witness depths, canonical byte layout) exercised at a size neither the
    bundled proof.bin (2^13) nor the small fixtures (2^9) touch."""
    import prover
    import stark_verifier_tpu as sv
    from stark_verifier_tpu.proofio import static_layout as SL
    import jax
    import numpy as np

    consts = [(i ** 5) ^ 3 for i in range(32)]
    pb11, out = prover.prove_to_bytes(7, 2048, consts)
    cfg11 = StarkConfig(log_steps=11, num_constants=32)
    assert cfg11.fri_levels == 4

    # canonical layout is a pure function of the geometry
    lay = SL.canonical_layout(cfg11)
    assert lay.nbytes == len(pb11)
    buf, lens = lay.pack([pb11])
    tree, shape_ok = jax.jit(lay.parse)(buf)
    assert np.asarray(shape_ok).tolist() == [True]

    # general API: runtime constants, fresh family
    assert sv.verify_mimc(7, 2048, consts, out, pb11) is True
    bad = bytearray(pb11)
    bad[120] ^= 4
    assert sv.verify_mimc(7, 2048, consts, out, bytes(bad)) is False
