"""Ragged MultiProof support: per-branch value sizes and witness depths.

The reference reads value_size/witnesses_size per branch
(reference: src/deserializer.rs:104-119) and ProofBranch::verify walks each
branch's own depth (merkle_tree.rs:119-163).  These tests pin that
(a) the Python AND native parsers accept ragged groups and produce identical
    padded arrays + per-branch size vectors, and
(b) the device Merkle walk verifies a synthetic ragged group bit-identically
    to the oracle's per-branch walk -- mixed vsizes (32/64 B) and mixed
    depths (2..5) in ONE lockstep call.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from stark_verifier_tpu import native
from stark_verifier_tpu.proofio import wire
from stark_verifier_tpu.ops import merkle

rng = random.Random(0xA11)


def _rand(n):
    return bytes(rng.randrange(256) for _ in range(n))


def _make_branches():
    """Synthetic ragged branches: value sizes 32/64/32/96, depths 3/2/5/4."""
    specs = [(32, 3), (64, 2), (32, 5), (96, 4)]
    branches, indices = [], []
    for vsize, depth in specs:
        branches.append(oracle.Branch(
            value=_rand(vsize),
            sibling_value=_rand(vsize),
            witnesses=[_rand(32) for _ in range(depth)],
        ))
        indices.append(rng.randrange(2 ** (depth + 1)))
    return branches, indices


def _serialize_multiproof(branches):
    out = len(branches).to_bytes(4, "little")
    for br in branches:
        out += len(br.value).to_bytes(4, "little")
        out += br.value + br.sibling_value
        out += (32 * len(br.witnesses)).to_bytes(4, "little")
        out += b"".join(br.witnesses)
    return out


def _words(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<u4").astype(np.uint32)


def test_ragged_parse_python():
    branches, _ = _make_branches()
    blob = _serialize_multiproof(branches)
    g = wire._parse_multiproof(wire._Reader(blob))
    assert g.vsizes.tolist() == [32, 64, 32, 96]
    assert g.depths.tolist() == [3, 2, 5, 4]
    assert g.value_words.shape == (4, 24)       # padded to 96 B
    assert g.witness_words.shape == (4, 5, 8)   # padded to depth 5
    assert not g.rectangular
    assert g.vsize_classes == (32, 64, 96)
    for i, br in enumerate(branches):
        vw = len(br.value) // 4
        assert (g.value_words[i, :vw] == _words(br.value)).all()
        assert (g.value_words[i, vw:] == 0).all()
        assert (g.sibling_words[i, :vw] == _words(br.sibling_value)).all()
        for d, w in enumerate(br.witnesses):
            assert (g.witness_words[i, d] == _words(w)).all()
        assert (g.witness_words[i, len(br.witnesses):] == 0).all()


def _ragged_proof_bytes(branches):
    """Wrap a ragged group into a full minimal proof (1 FRI level using the
    ragged group for both column and poly, then main/lincomb)."""
    mp = _serialize_multiproof(branches)
    blob = _rand(32) + _rand(32)                       # roots
    blob += (1).to_bytes(4, "little") + _rand(32) + mp + mp   # MERKLE level
    blob += (2).to_bytes(4, "little") + (64 * 32).to_bytes(4, "little")
    blob += _rand(64 * 32)                             # POINTS
    blob += mp + mp                                    # main + lincomb
    return blob


def test_ragged_parse_native_matches_python():
    if native.get_lib() is None:
        pytest.skip("no C compiler available")
    branches, _ = _make_branches()
    blob = _ragged_proof_bytes(branches)
    a = native.parse_proof_native(blob)
    b = wire.parse_proof(blob)
    for ga, gb in ((a.main, b.main), (a.lincomb, b.lincomb),
                   (a.fri_levels[0].column, b.fri_levels[0].column),
                   (a.fri_levels[0].poly, b.fri_levels[0].poly)):
        assert (ga.value_words == gb.value_words).all()
        assert (ga.sibling_words == gb.sibling_words).all()
        assert (ga.witness_words == gb.witness_words).all()
        assert (ga.vsizes == gb.vsizes).all()
        assert (ga.depths == gb.depths).all()


def test_ragged_group_verifies_like_oracle():
    """One lockstep device call over mixed-vsize, mixed-depth branches ==
    the oracle's sequential per-branch walks."""
    branches, indices = _make_branches()
    blob = _serialize_multiproof(branches)
    g = wire._parse_multiproof(wire._Reader(blob))

    roots = [oracle.branch_root(i, br) for br, i in zip(branches, indices)]
    # oracle accepts each branch against its own root
    for br, i, r in zip(branches, indices, roots):
        assert oracle.verify_branch(r, i, br) == br.value

    root_words = jnp.asarray(np.stack([_words(r) for r in roots]))  # [n, 8]
    ok, _ = merkle.verify_branches(
        root_words,
        jnp.asarray(np.array(indices, dtype=np.uint32)),
        jnp.asarray(g.value_words), jnp.asarray(g.sibling_words),
        jnp.asarray(g.witness_words), jnp.asarray(g.depths),
        vsizes=jnp.asarray(g.vsizes), vsize_classes=g.vsize_classes)
    assert np.asarray(ok).all()

    # tampering any branch's value flips exactly that lane
    for k in range(len(branches)):
        bad = g.value_words.copy()
        bad[k, 0] ^= 1
        ok2, _ = merkle.verify_branches(
            root_words,
            jnp.asarray(np.array(indices, dtype=np.uint32)),
            jnp.asarray(bad), jnp.asarray(g.sibling_words),
            jnp.asarray(g.witness_words), jnp.asarray(g.depths),
            vsizes=jnp.asarray(g.vsizes), vsize_classes=g.vsize_classes)
        got = np.asarray(ok2)
        assert not got[k]
        assert got.sum() == len(branches) - 1

    # wrong per-branch depth (witness dropped) must reject that lane
    short = g.depths.copy()
    short[2] -= 1
    ok3, _ = merkle.verify_branches(
        root_words,
        jnp.asarray(np.array(indices, dtype=np.uint32)),
        jnp.asarray(g.value_words), jnp.asarray(g.sibling_words),
        jnp.asarray(g.witness_words), jnp.asarray(short),
        vsizes=jnp.asarray(g.vsizes), vsize_classes=g.vsize_classes)
    assert not np.asarray(ok3)[2]


def test_ragged_value_sizes_rejected_by_statement_layout():
    """Value-size raggedness cannot fit the MiMC statement's fixed trace
    slicing -- staging maps it to a structured reject (the reference's
    behavior on wrong-size values is a panic = reject, SURVEY 2.2.8)."""
    from stark_verifier_tpu.proofio import device
    branches, _ = _make_branches()
    blob = _ragged_proof_bytes(branches)
    parsed = wire.parse_proof(blob)
    with pytest.raises(wire.WireFormatError):
        device.proof_tree(parsed)
