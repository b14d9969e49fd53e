"""Golden tests for the pure-Python oracle against known reference values.

Reference values were established by byte-parsing /root/reference/proof.bin and
cross-checking against the Rust sources (see SURVEY.md "ground truth").
"""

import oracle

MIMC_OUTPUT = 95224774355499767951968048714566316597785297695903697235130434363122555476056
G2_LITERAL = 41913712888260089065520476180880993127517355946012995597287997778376518235852
VAL_LITERAL = 56670364103764250102176604807203318908867195832872336813161821519223575486477
Q3_LITERAL = 80127877722526290441229381276271393407378829608771736609433200039324583025757


def test_modulus():
    assert oracle.MODULUS == int(
        "1157920892373161954235709850086879078532699846656405640394575840064055"
        "96119041")


def test_mimc_output():
    assert oracle.mimc(3, 8192, oracle.mimc_round_constants()) == MIMC_OUTPUT


def test_g2_and_minipoly_root():
    m = oracle.MODULUS
    G2 = pow(7, (m - 1) // 65536, m)
    assert G2 == G2_LITERAL
    assert pow(G2, 8 * 128, m) == VAL_LITERAL
    # quartic root literal asserted by the reference (main.rs:51)
    assert pow(G2, 65536 * 3 // 4, m) == Q3_LITERAL


def test_parse_structure(proof_bytes):
    proof, off = oracle.parse_proof(proof_bytes)
    assert off == len(proof_bytes) == 566508
    assert len(proof.fri_levels) == 5
    assert len(proof.points) == 64
    for lvl in proof.fri_levels:
        assert len(lvl.column_branches.branches) == 40
        assert len(lvl.poly_branches.branches) == 160
        assert all(len(b.value) == 32 for b in lvl.column_branches.branches)
    # witness depths descend by 2 per level
    col_depths = [len(l.column_branches.branches[0].witnesses)
                  for l in proof.fri_levels]
    poly_depths = [len(l.poly_branches.branches[0].witnesses)
                   for l in proof.fri_levels]
    assert col_depths == [13, 11, 9, 7, 5]
    assert poly_depths == [15, 13, 11, 9, 7]
    assert len(proof.merkle_branches.branches) == 160
    assert all(len(b.value) == 96 for b in proof.merkle_branches.branches)
    assert len(proof.linear_comb_branches.branches) == 80


def test_end_to_end_accept(proof_bytes):
    assert oracle.verify_proof_bytes(proof_bytes) is True


def test_reject_flipped_root(proof_bytes):
    b = bytearray(proof_bytes)
    b[0] ^= 1  # corrupt merkle_root
    assert oracle.verify_proof_bytes(bytes(b)) is False


def test_reject_flipped_value_byte(proof_bytes):
    b = bytearray(proof_bytes)
    b[100] ^= 0x80  # inside the first FRI column branch value
    assert oracle.verify_proof_bytes(bytes(b)) is False


def test_reject_wrong_output(proof_bytes):
    proof, _ = oracle.parse_proof(proof_bytes)
    constants = oracle.mimc_round_constants()
    try:
        ok = oracle.verify_mimc_proof(3, 8192, constants, MIMC_OUTPUT + 1, proof)
    except AssertionError:
        ok = False
    assert ok is False


def test_prg_excludes_multiples_of_8(proof_bytes):
    proof, _ = oracle.parse_proof(proof_bytes)
    idx = oracle.get_pseudorandom_indices(proof.l_merkle_root, 80, 65536, 8)
    assert len(idx) == 80
    assert all(i % 8 != 0 for i in idx)
    assert all(0 < i < 65536 for i in idx)
