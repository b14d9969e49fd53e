"""The general (cdylib-shaped) library API: runtime inp / round_constants /
output, mirroring `pub fn verify_mimc_proof` (reference: src/lib.rs:99).

Key property: statement parameters are RUNTIME device values, so one
compiled graph serves different statements -- these tests drive accept and
reject cases through a single jitted fn without recompilation, and pin the
runtime-K(x) path (device iNTT + Horner) against the statement-table path
and the oracle for a NON-default constants family.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
import stark_verifier_tpu as sv
from stark_verifier_tpu import fp
from stark_verifier_tpu.config import StarkConfig, cached_tables
from stark_verifier_tpu.models.mimc import MimcStatement
from stark_verifier_tpu.ops import field as F, mimc as mimc_ops, ntt
from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.protocol import verify as V

P = fp.MODULUS
rng = random.Random(0xCD)


@pytest.fixture(scope="module")
def general(proof_bytes):
    fn, tables = V.make_general_verifier(StarkConfig())
    tree = device.to_device(device.proof_tree(wire.parse_proof(proof_bytes)))
    return fn, tables, tree


def _limbs(x):
    return jnp.asarray(fp.int_to_limbs(x % P))


def test_general_accepts_golden_with_runtime_params(general):
    fn, _, tree = general
    consts = [(i ** 7) ^ 42 for i in range(64)]
    out = oracle.mimc(3, 8192, consts)
    ok = fn(tree, _limbs(3), jnp.asarray(fp.ints_to_limbs(consts)), _limbs(out))
    assert bool(np.asarray(ok))


def test_general_rejects_wrong_runtime_params(general):
    """Same compiled graph, different runtime statements -> rejects, no
    recompilation (wrong output / wrong input / wrong constants)."""
    fn, _, tree = general
    consts = [(i ** 7) ^ 42 for i in range(64)]
    out = oracle.mimc(3, 8192, consts)
    cl = jnp.asarray(fp.ints_to_limbs(consts))
    assert not bool(np.asarray(fn(tree, _limbs(3), cl, _limbs(out + 1))))
    assert not bool(np.asarray(fn(tree, _limbs(4), cl, _limbs(out))))
    bad = list(consts)
    bad[7] ^= 1
    assert not bool(np.asarray(
        fn(tree, _limbs(3), jnp.asarray(fp.ints_to_limbs(bad)), _limbs(out))))


def test_runtime_k_path_matches_table_and_oracle():
    """Device iNTT minipoly + Horner K(x) for a NON-default constants family
    == oracle fft_inv + eval_poly_at; and for the default family == the
    statement-static K table."""
    cfg = StarkConfig()
    tables = cached_tables(cfg)
    families = [
        [(i ** 7) ^ 42 for i in range(64)],                 # default
        [rng.randrange(P) for _ in range(64)],              # random family
    ]
    positions = [rng.randrange(65536) for _ in range(17)]
    g2t = jnp.asarray(tables.g2_powers)
    pos = jnp.asarray(np.array(positions, dtype=np.uint32))
    x_sk2 = jnp.take(g2t, (pos * jnp.uint32(cfg.skips2)) & jnp.uint32(65535),
                     axis=0)
    for fi, consts in enumerate(families):
        cl = jnp.asarray(fp.ints_to_limbs([c % P for c in consts]))
        minipoly = ntt.intt(cl, tables.minipoly_root)
        got = [fp.limbs_to_int(r)
               for r in np.asarray(F.eval_poly(minipoly, x_sk2))]
        mini_oracle = oracle.fft_inv([c % P for c in consts],
                                     tables.minipoly_root)
        want = [oracle.eval_poly_at(mini_oracle,
                                    pow(tables.G2, p * cfg.skips2, P))
                for p in positions]
        assert got == want, f"family {fi}"
        if fi == 0:
            table = [fp.limbs_to_int(tables.k_table[p % tables.k_period])
                     for p in positions]
            assert got == table


def test_mimc_output_nondefault_constants_vs_oracle():
    """Device MiMC scan with a runtime non-default constants family matches
    the oracle (steps-1 quirk included)."""
    consts = [rng.randrange(P) for _ in range(32)]
    steps = 512
    got = mimc_ops.mimc(F.const(5), steps,
                        jnp.asarray(fp.ints_to_limbs(consts)))
    assert fp.limbs_to_int(np.asarray(got)) == oracle.mimc(5, steps, consts)


def test_facade_verify_mimc_batch(proof_bytes):
    """Library facade: per-proof verdicts, malformed proofs reject."""
    consts = [(i ** 7) ^ 42 for i in range(64)]
    out = oracle.mimc(3, 8192, consts)
    corrupt = bytearray(proof_bytes)
    corrupt[100] ^= 1                       # breaks a committed value
    truncated = proof_bytes[:500]           # parse reject
    verdicts = sv.verify_mimc(3, 8192, consts, out,
                              [proof_bytes, bytes(corrupt), truncated])
    assert verdicts.tolist() == [True, False, False]


def test_compressions_per_proof_cfg_derived(proof_bytes):
    """profiling.compressions_per_proof must be derived from the family, not
    a default-family constant (round-4 verdict item 4).  Cross-checked
    against the branch counts/depths of ACTUAL parsed proofs: the golden
    default-family proof.bin and a freshly proven log_steps=9 proof."""
    from stark_verifier_tpu.profiling import (COMPRESSIONS_PER_PROOF,
                                              compressions_per_proof)
    import prover

    def from_parsed(p, cfg):
        total = 4                                     # k1..k4
        for lv in p.fri_levels:
            for g, leaf in ((lv.column, 1), (lv.poly, 1)):
                total += sum(leaf + int(d) for d in g.depths)
            total += -(-cfg.fri_queries // 8) - 1     # per-level PRG
        main_blocks = -(-2 * int(p.main.vsizes[0]) // 64)
        total += sum(main_blocks + int(d) for d in p.main.depths)
        total += sum(1 + int(d) for d in p.lincomb.depths)
        total += -(-cfg.spot_checks // 8) - 1         # spot PRG
        return total

    cfg = StarkConfig()
    p = wire.parse_proof(proof_bytes)
    assert compressions_per_proof(cfg) == from_parsed(p, cfg)
    assert COMPRESSIONS_PER_PROOF == compressions_per_proof(cfg) == 15793

    cfg9 = StarkConfig(log_steps=9, num_constants=16)
    pb9, _ = prover.prove_to_bytes(5, 512, [(i ** 3) ^ 7 for i in range(16)])
    p9 = wire.parse_proof(pb9)
    assert compressions_per_proof(cfg9) == from_parsed(p9, cfg9)
    assert compressions_per_proof(cfg9) != COMPRESSIONS_PER_PROOF
