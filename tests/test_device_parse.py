"""Device-side static-layout deserialization (proofio/static_layout.py).

For a rectangular family every wire offset is a compile-time constant
(SURVEY.md section 2.1), so deserialization becomes static slices inside
the verifier graph.  These tests pin:
  * the canonical layout's offsets against the real proof.bin (566,508
    bytes) and bit-identical tree equality with the host parser;
  * shape_ok lanes for every non-canonical blob class;
  * end-to-end verify_stream(device_parse=True) verdict equality with the
    host-parse path on a mixed adversarial schedule, including the host
    fallback rerouting (non-canonical blobs must get host-path verdicts,
    never fast-path rejects -- per-proof independence).
"""

import numpy as np
import pytest

import jax

from stark_verifier_tpu.config import StarkConfig
from stark_verifier_tpu.proofio import device, static_layout as SL, wire
from stark_verifier_tpu.parallel import mesh as M

from test_stream_independence import (_zero_level_proof,
                                      _synthetic_family_blob)


def test_canonical_layout_matches_wire(proof_bytes):
    lay = SL.canonical_layout(StarkConfig())
    assert lay.nbytes == len(proof_bytes) == 566508
    assert lay.col_depths == [13, 11, 9, 7, 5]
    assert lay.poly_depths == [15, 13, 11, 9, 7]
    assert lay.main_depth == 15


def test_device_parse_tree_bit_identical(proof_bytes):
    """lay.parse must produce the SAME treedef and bit-identical leaves as
    the host parser -- the verifier graph consumes either."""
    lay = SL.canonical_layout(StarkConfig())
    buf, lens = lay.pack([proof_bytes, proof_bytes[:999],
                          proof_bytes + b"trail"])
    assert lens.tolist() == [lay.nbytes, 999, lay.nbytes + 5]
    tree, shape_ok = jax.jit(lay.parse)(buf)
    assert np.asarray(shape_ok).tolist() == [True, False, True]

    want = device.proof_tree(wire.parse_proof(proof_bytes))
    got = jax.tree.map(lambda a: np.asarray(a[0]), tree)
    lw, tw = jax.tree.flatten(want)
    lg, tg = jax.tree.flatten(got)
    assert tw == tg
    for a, b in zip(lw, lg):
        assert a.shape == b.shape and (np.asarray(a) == b).all()


def test_shape_lanes_reject_noncanonical(proof_bytes):
    cfg = StarkConfig()
    lay = SL.canonical_layout(cfg)
    blobs = [
        proof_bytes,
        _zero_level_proof(),                  # wrong everything
        _synthetic_family_blob(cfg, 1),       # right counts, wrong depths
        b"\x00" * lay.nbytes,                 # all zeros
        proof_bytes[:-4] + b"\xff\xff\xff\xff",   # last witness word flipped
    ]
    buf, _ = lay.pack(blobs)
    _, shape_ok = jax.jit(lay.parse)(buf)
    # flipped VALUE bytes keep the canonical shape (verdict's job, not
    # shape_ok's); structural deviations all fail
    assert np.asarray(shape_ok).tolist() == [True, False, False, False, True]


def test_stream_device_parse_mixed_e2e(proof_bytes):
    """verify_stream(device_parse=True) == host-path verdicts on a schedule
    mixing canonical-valid, canonical-corrupt, and every fallback class."""
    cfg = StarkConfig()
    corrupt = bytearray(proof_bytes)
    corrupt[110] ^= 0x80
    blobs = [proof_bytes,                         # fast path, True
             bytes(corrupt),                      # fast path, False
             proof_bytes + b"trailing",           # truncated pack, True (parity)
             _zero_level_proof(),                 # shape fail -> host, False
             proof_bytes,                         # fast path, True
             _synthetic_family_blob(cfg, 1)]      # shape fail -> host, False
    mesh = M.make_mesh(2)
    got = dict(M.verify_stream(blobs, chunk=2, mesh=mesh, device_parse=True))
    want = dict(M.verify_stream(blobs, chunk=2, mesh=mesh))
    assert got == want == {0: True, 1: False, 2: True, 3: False,
                           4: True, 5: False}


def test_stream_device_parse_strict_trailing(proof_bytes):
    """Strict mode: the packed prefix cannot see trailing bytes, so
    non-exact lengths must reroute to the host parser and reject."""
    cfg = StarkConfig(strict=True)
    blobs = [proof_bytes + b"x", proof_bytes]
    got = dict(M.verify_stream(blobs, chunk=2, mesh=M.make_mesh(2),
                               cfg=cfg, device_parse=True))
    assert got == {0: False, 1: True}


def test_device_parse_small_family():
    """The canonical layout is a pure function of the family geometry: a
    freshly proven log_steps=9 proof must match its layout byte-for-byte
    and verify through the device parser (not just the bundled proof.bin)."""
    import prover
    consts = [(i ** 3) ^ 7 for i in range(16)]
    pb9, _out = prover.prove_to_bytes(5, 512, consts)
    cfg9 = StarkConfig(log_steps=9, num_constants=16)
    lay = SL.canonical_layout(cfg9)
    assert lay.nbytes == len(pb9)

    buf, lens = lay.pack([pb9, pb9[:500]])
    assert lens.tolist() == [lay.nbytes, 500]
    tree, shape_ok = jax.jit(lay.parse)(buf)
    assert np.asarray(shape_ok).tolist() == [True, False]
    want = device.proof_tree(wire.parse_proof(pb9))
    got = jax.tree.map(lambda a: np.asarray(a[0]), tree)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        assert a.shape == b.shape and (np.asarray(a) == b).all()


def test_chunked_blob_verifier_matches(proof_bytes):
    """The lax.map chunked form (prestage bench path) must equal the flat
    blob verifier's verdicts."""
    cfg = StarkConfig()
    mesh = M.make_mesh(1)
    corrupt = bytearray(proof_bytes)
    corrupt[200] ^= 2
    fn_flat, lay = M.make_sharded_blob_verifier(mesh, cfg)
    fn_chunk, _ = M.make_sharded_blob_verifier(mesh, cfg, chunk=2)
    buf, _ = lay.pack([proof_bytes, bytes(corrupt), proof_bytes,
                       proof_bytes[:100]])
    vf, sf = (np.asarray(x) for x in fn_flat(buf))
    vc, sc = (np.asarray(x) for x in fn_chunk(buf))
    assert vf.tolist() == vc.tolist() == [True, False, True, False]
    assert sf.tolist() == sc.tolist() == [True, True, True, False]


def test_short_blob_always_reroutes_to_host(proof_bytes, monkeypatch):
    """A truncated blob whose missing tail bytes were zero would be
    silently reconstructed by pack()'s zero padding and pass every shape
    lane -- the host parser rejects it as truncated, so short blobs must
    reroute to the host path in EVERY mode, not just strict (round-5
    self-review finding).  Stub the blob verifier to claim shape_ok=True
    for everything: the reroute must still hand short blobs to the host
    parser (which rejects), while full blobs keep the fast-path verdict."""
    cfg = StarkConfig()
    lay = SL.canonical_layout(cfg)

    def fake_blob_verifier(mesh, vcfg, inp=3, axis_name="data", chunk=None):
        def fn(words):
            n = np.asarray(words).shape[0]
            return np.ones(n, bool), np.ones(n, bool)   # lie: all canonical
        return fn, lay

    monkeypatch.setattr(M, "make_sharded_blob_verifier", fake_blob_verifier)
    blobs = [proof_bytes, proof_bytes[:-2]]      # truncated inside lincomb
    got = dict(M.verify_stream(blobs, chunk=2, mesh=M.make_mesh(1),
                               device_parse=True))
    # slot 0: fast path (stub says True); slot 1: SHORT -> host parse ->
    # truncated -> False, even though the stub claimed shape_ok
    assert got == {0: True, 1: False}
