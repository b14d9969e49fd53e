"""Native C parser vs the Python wire parser: identical arrays, same error
model, and a quick ingest-throughput sanity check."""

import time

import numpy as np
import pytest

from stark_verifier_tpu import native
from stark_verifier_tpu.proofio import wire


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("no C compiler available")
    return l


def _assert_same(a: wire.ProofArrays, b: wire.ProofArrays):
    assert (a.merkle_root_words == b.merkle_root_words).all()
    assert (a.l_merkle_root_words == b.l_merkle_root_words).all()
    assert (a.points_words == b.points_words).all()
    assert len(a.fri_levels) == len(b.fri_levels)
    for la, lb in zip(a.fri_levels, b.fri_levels):
        assert (la.root2_words == lb.root2_words).all()
        for ga, gb in ((la.column, lb.column), (la.poly, lb.poly)):
            assert (ga.value_words == gb.value_words).all()
            assert (ga.sibling_words == gb.sibling_words).all()
            assert (ga.witness_words == gb.witness_words).all()
    for ga, gb in ((a.main, b.main), (a.lincomb, b.lincomb)):
        assert (ga.value_words == gb.value_words).all()
        assert (ga.sibling_words == gb.sibling_words).all()
        assert (ga.witness_words == gb.witness_words).all()
        assert (ga.vsizes == gb.vsizes).all()
        assert (ga.depths == gb.depths).all()


def test_native_matches_python(lib, proof_bytes):
    _assert_same(native.parse_proof_native(proof_bytes),
                 wire.parse_proof(proof_bytes))


def test_native_error_model(lib, proof_bytes):
    with pytest.raises(wire.WireFormatError):
        native.parse_proof_native(proof_bytes[:100])
    b = bytearray(proof_bytes)
    b[64:68] = (7).to_bytes(4, "little")
    with pytest.raises(wire.WireFormatError):
        native.parse_proof_native(bytes(b))
    # trailing bytes tolerated by default (reference parity, main.rs:204);
    # rejected only on request -- matching the Python parser
    p = native.parse_proof_native(proof_bytes + b"\x00")
    assert p.consumed == len(proof_bytes)
    with pytest.raises(wire.WireFormatError):
        native.parse_proof_native(proof_bytes + b"\x00", allow_trailing=False)


def test_native_faster_than_python(lib, proof_bytes):
    n = 20
    t = time.perf_counter()
    for _ in range(n):
        native.parse_proof_native(proof_bytes)
    t_native = (time.perf_counter() - t) / n
    t = time.perf_counter()
    for _ in range(3):
        wire.parse_proof(proof_bytes)
    t_py = (time.perf_counter() - t) / 3
    # informational bound only -- the native path should win clearly
    assert t_native < t_py, (t_native, t_py)
