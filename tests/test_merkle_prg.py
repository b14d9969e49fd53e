"""Merkle-branch kernel and Fiat-Shamir PRG vs the Python oracle, on real
proof.bin data (SURVEY.md section 4(a)/(b))."""

import numpy as np
import jax.numpy as jnp

import oracle
from stark_verifier_tpu.proofio import wire
from stark_verifier_tpu.ops import merkle, prg, field


def test_parser_structure(proof_bytes):
    p = wire.parse_proof(proof_bytes)
    assert len(p.fri_levels) == 5
    assert p.points_words.shape == (64, 8)
    assert [l.column.n for l in p.fri_levels] == [40] * 5
    assert [l.poly.n for l in p.fri_levels] == [160] * 5
    assert [l.column.depth for l in p.fri_levels] == [13, 11, 9, 7, 5]
    assert [l.poly.depth for l in p.fri_levels] == [15, 13, 11, 9, 7]
    assert p.main.n == 160 and p.main.value_bytes == 96 and p.main.depth == 15
    assert p.lincomb.n == 80 and p.lincomb.value_bytes == 32


def test_parser_rejects_malformed(proof_bytes):
    import pytest
    with pytest.raises(wire.WireFormatError):
        wire.parse_proof(proof_bytes[:100])
    b = bytearray(proof_bytes)
    b[64:68] = (7).to_bytes(4, "little")  # invalid element tag
    with pytest.raises(wire.WireFormatError):
        wire.parse_proof(bytes(b))
    # trailing bytes: tolerated by default like the reference (main.rs:204
    # ignores the consumed count), rejected only when asked
    p = wire.parse_proof(proof_bytes + b"\x00")
    assert p.consumed == len(proof_bytes)
    with pytest.raises(wire.WireFormatError):
        wire.parse_proof(proof_bytes + b"\x00", allow_trailing=False)


def test_words_be_to_limbs_roundtrip(proof_bytes):
    p = wire.parse_proof(proof_bytes)
    words = jnp.asarray(p.lincomb.value_words)      # [80, 8]
    limbs = field.words_be_to_limbs(words)
    # against oracle int parse
    op, _ = oracle.parse_proof(proof_bytes)
    exp = [int.from_bytes(b.value, "big") for b in op.linear_comb_branches.branches]
    from stark_verifier_tpu import fp
    got = [fp.limbs_to_int(np.asarray(limbs)[i]) for i in range(80)]
    assert got == exp
    back = field.limbs_to_words_be(limbs)
    assert (np.asarray(back) == p.lincomb.value_words).all()


def test_prg_matches_oracle(proof_bytes):
    p = wire.parse_proof(proof_bytes)
    seed = jnp.asarray(p.l_merkle_root_words)
    got = np.asarray(prg.pseudorandom_indices_jit(seed, 80, 65536, 8))
    exp = oracle.get_pseudorandom_indices(
        bytes(np.asarray(p.l_merkle_root_words).view(np.uint8)), 80, 65536, 8)
    assert got.tolist() == exp
    # no-exclude variant, level-0 FRI seed over rou_deg/4
    seed2 = jnp.asarray(p.fri_levels[0].root2_words)
    got2 = np.asarray(prg.pseudorandom_indices_jit(seed2, 40, 16384, 8))
    exp2 = oracle.get_pseudorandom_indices(
        bytes(np.asarray(p.fri_levels[0].root2_words).view(np.uint8)), 40, 16384, 8)
    assert got2.tolist() == exp2


def test_merkle_branches_lincomb(proof_bytes):
    """80 lincomb branches verify against l_merkle_root; corrupting any fails."""
    p = wire.parse_proof(proof_bytes)
    op, _ = oracle.parse_proof(proof_bytes)
    positions = oracle.get_pseudorandom_indices(op.l_merkle_root, 80, 65536, 8)
    g = p.lincomb
    ok, vals = merkle.verify_branches_jit(
        jnp.asarray(p.l_merkle_root_words), jnp.asarray(np.array(positions, np.uint32)),
        jnp.asarray(g.value_words), jnp.asarray(g.sibling_words),
        jnp.asarray(g.witness_words), g.depth)
    assert np.asarray(ok).all()
    # corrupt one witness word -> that branch fails, others still pass
    ww = np.array(g.witness_words)
    ww[7, 3, 0] ^= 1
    ok2, _ = merkle.verify_branches_jit(
        jnp.asarray(p.l_merkle_root_words), jnp.asarray(np.array(positions, np.uint32)),
        jnp.asarray(g.value_words), jnp.asarray(g.sibling_words),
        jnp.asarray(ww), g.depth)
    ok2 = np.asarray(ok2)
    assert not ok2[7] and ok2.sum() == 79
    # wrong index -> fail
    pos2 = np.array(positions, np.uint32)
    pos2[0] += 1
    ok3, _ = merkle.verify_branches_jit(
        jnp.asarray(p.l_merkle_root_words), jnp.asarray(pos2),
        jnp.asarray(g.value_words), jnp.asarray(g.sibling_words),
        jnp.asarray(g.witness_words), g.depth)
    assert not np.asarray(ok3)[0]


def test_merkle_branches_main_96byte_leaves(proof_bytes):
    """160 main branches (96-byte P||D||B values) verify against merkle_root."""
    p = wire.parse_proof(proof_bytes)
    op, _ = oracle.parse_proof(proof_bytes)
    positions = oracle.get_pseudorandom_indices(op.l_merkle_root, 80, 65536, 8)
    augmented = []
    for q in positions:
        augmented += [q, (q + 8) % 65536]
    g = p.main
    ok, _ = merkle.verify_branches_jit(
        jnp.asarray(p.merkle_root_words), jnp.asarray(np.array(augmented, np.uint32)),
        jnp.asarray(g.value_words), jnp.asarray(g.sibling_words),
        jnp.asarray(g.witness_words), g.depth)
    assert np.asarray(ok).all()


def test_merkle_branches_fri_all_levels(proof_bytes):
    """Column branches (embedded root2) and poly branches (previous root) of
    every FRI level verify; reproduces the verify_low_degree_proof walk
    (reference: src/main.rs:53-92)."""
    p = wire.parse_proof(proof_bytes)
    rou_deg = 65536
    prev_root = p.l_merkle_root_words
    for lvl in p.fri_levels:
        seed = jnp.asarray(lvl.root2_words)
        ys = prg.pseudorandom_indices_jit(seed, 40, rou_deg // 4, 8)
        okc, _ = merkle.verify_branches_jit(
            jnp.asarray(lvl.root2_words), ys,
            jnp.asarray(lvl.column.value_words),
            jnp.asarray(lvl.column.sibling_words),
            jnp.asarray(lvl.column.witness_words), lvl.column.depth)
        assert np.asarray(okc).all()
        poly_pos = (ys[:, None] + (rou_deg // 4) * np.arange(4, dtype=np.uint32)[None, :]
                    ).reshape(-1)
        okp, _ = merkle.verify_branches_jit(
            jnp.asarray(prev_root), poly_pos,
            jnp.asarray(lvl.poly.value_words),
            jnp.asarray(lvl.poly.sibling_words),
            jnp.asarray(lvl.poly.witness_words), lvl.poly.depth)
        assert np.asarray(okp).all()
        rou_deg //= 4
        prev_root = lvl.root2_words
