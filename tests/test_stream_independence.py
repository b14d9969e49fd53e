"""Per-proof verdict independence of the batched ingest/stream path.

In the reference each verification is one process: parse -> verdict
(/root/reference/src/main.rs:199-227), so a malformed proof can only panic
its own run.  The batched ingest must give the same property: one
adversarial blob anywhere in a stream (including at a chunk head, where the
round-4 layout bugs lived -- VERDICT.md round 4, Weak #1/#2) must never
change any OTHER blob's verdict, crash the stream, or poison later chunks.

Contents:
  * the two round-4 judge probes, verbatim (zero-FRI-level blob at a chunk
    head; valid wrong-family blob at a chunk head), end-to-end through
    verify_stream with real verification;
  * ingest-level unit probes for every adversarial-head class including the
    layout-expansion path (family-valid blob with non-canonical witness
    padding) and strict-mode trailing bytes on the native fast path;
  * a randomized property test of the verify_stream pipelining state
    machine (double-buffered layouts / pending flush / manifest skips,
    parallel/mesh.py:160-225) against a naive one-blob-at-a-time reference,
    with a stubbed verifier so >=100 schedules run in seconds.
"""

import random
import struct

import numpy as np
import pytest

import jax

from stark_verifier_tpu.config import StarkConfig
from stark_verifier_tpu.proofio import device, ingest, wire
from stark_verifier_tpu.parallel import mesh as M

import prover


# ---------------------------------------------------------------------------
# adversarial blob constructors
# ---------------------------------------------------------------------------

def _mini_multiproof(n=1, vsize=32, depth=1) -> bytes:
    out = [struct.pack("<I", n)]
    for _ in range(n):
        out += [struct.pack("<I", vsize), b"\x11" * vsize, b"\x22" * vsize,
                struct.pack("<I", depth * 32), b"\x33" * (depth * 32)]
    return b"".join(out)


def _zero_level_proof() -> bytes:
    """Wire-valid blob with NO FRI MERKLE levels (tag-2 immediately)."""
    return (b"\x00" * 64 + struct.pack("<II", 2, 64) + b"\x44" * 64
            + _mini_multiproof() + _mini_multiproof())


def _synthetic_family_blob(cfg: StarkConfig, depth: int) -> bytes:
    """Structurally family-valid blob (correct level/branch counts, value
    sizes, POINTS size) whose witness chains all have `depth` entries --
    parses and fills, but its roots/values are garbage so it never verifies.
    Used as an adversarial chunk head with non-canonical witness padding."""
    q = cfg.fri_queries
    out = [b"\x00" * 64]
    for _ in range(cfg.fri_levels):
        out += [struct.pack("<I", 1), b"\x55" * 32,
                _mini_multiproof(q, 32, depth),
                _mini_multiproof(4 * q, 32, depth)]
    out += [struct.pack("<II", 2, cfg.fri_final_domain * 32),
            b"\x44" * (cfg.fri_final_domain * 32)]
    out += [_mini_multiproof(2 * cfg.spot_checks, 96, depth),
            _mini_multiproof(cfg.spot_checks, 32, depth)]
    return b"".join(out)


@pytest.fixture(scope="module")
def small_family_blob() -> bytes:
    """A valid 3-FRI-level proof (log_steps=9 square-ish family) -- the
    'valid proof of the WRONG family' adversarial blob for the default
    5-level stream (round-4 verdict Weak #2)."""
    pb9, _out = prover.prove_to_bytes(5, 512,
                                      [(i ** 3) ^ 7 for i in range(16)])
    return pb9


# ---------------------------------------------------------------------------
# round-4 judge probes, end-to-end (real verification)
# ---------------------------------------------------------------------------

def test_probe_zero_level_chunk_head(proof_bytes):
    """Round-4 probe 1: a wire-valid zero-FRI-level blob heading a chunk
    crashed the whole stream (IndexError in BatchLayout.__init__)."""
    blobs = [_zero_level_proof(), proof_bytes, proof_bytes]
    got = dict(M.verify_stream(blobs, chunk=2, mesh=M.make_mesh(2)))
    assert got == {0: False, 1: True, 2: True}


def test_probe_wrong_family_chunk_head(proof_bytes, small_family_blob):
    """Round-4 probe 2: a valid wrong-family blob heading chunk 0 poisoned
    the layout; valid proofs in chunks 0 and 2 (same parity lane) were
    silently rejected."""
    pb = proof_bytes
    blobs = [small_family_blob, pb, pb, pb, pb, pb]
    got = dict(M.verify_stream(blobs, chunk=2, mesh=M.make_mesh(2)))
    assert got == {0: False, 1: True, 2: True, 3: True, 4: True, 5: True}


# ---------------------------------------------------------------------------
# ingest-level unit probes (no verification graph -- fast)
# ---------------------------------------------------------------------------

def test_ingest_zero_level_head(proof_bytes):
    tree, ok, layout = ingest.ingest_chunk(
        [_zero_level_proof(), proof_bytes, proof_bytes], StarkConfig())
    assert ok.tolist() == [False, True, True]
    assert layout is not None and layout.family_ok(StarkConfig())


def test_ingest_all_garbage_chunk_keeps_layout(proof_bytes):
    cfg = StarkConfig()
    _t, _ok, layout = ingest.ingest_chunk([proof_bytes, proof_bytes], cfg)
    tree, ok, layout2 = ingest.ingest_chunk(
        [_zero_level_proof(), proof_bytes[:100]], cfg, layout)
    assert tree is None and ok.tolist() == [False, False]
    assert layout2 is layout           # a good layout survives a bad chunk


def test_ingest_wrong_family_head_no_poison(proof_bytes, small_family_blob):
    cfg = StarkConfig()
    tree, ok, layout = ingest.ingest_chunk(
        [small_family_blob, proof_bytes], cfg)
    assert ok.tolist() == [False, True]
    # the layout must be the golden family's, and reusable
    assert layout.family_ok(cfg)
    tree2, ok2, _ = ingest.ingest_chunk([proof_bytes, proof_bytes],
                                        cfg, layout)
    assert ok2.tolist() == [True, True]
    good = device.proof_tree(wire.parse_proof(proof_bytes))
    got0 = jax.tree.map(lambda a: a[0], tree2)
    for la, lb in zip(jax.tree.leaves(got0), jax.tree.leaves(good)):
        assert (np.asarray(la) == np.asarray(lb)).all()


def test_ingest_strict_trailing_native_path(proof_bytes):
    """Round-4 advisor item 3: the batched native fast path must enforce
    strict-mode trailing-byte rejection like parse_and_validate does."""
    strict = StarkConfig(strict=True)
    _t, ok, _l = ingest.ingest_chunk([proof_bytes + b"xx", proof_bytes],
                                     strict)
    assert ok.tolist() == [False, True]
    _t, ok, _l = ingest.ingest_chunk([proof_bytes + b"xx", proof_bytes],
                                     StarkConfig())     # parity mode accepts
    assert ok.tolist() == [True, True]


def test_ingest_shallow_synthetic_head_expands(proof_bytes):
    """Family-valid head with depth-1 witness padding: the layout is too
    shallow for the golden proofs -- they must EXPAND it (SlotShapeError
    path), not reject."""
    cfg = StarkConfig()
    syn = _synthetic_family_blob(cfg, depth=1)
    tree, ok, layout = ingest.ingest_chunk([syn, proof_bytes, proof_bytes],
                                           cfg)
    # syn is structurally valid (rejected later by verification itself)
    assert ok.tolist() == [True, True, True]
    good = device.proof_tree(wire.parse_proof(proof_bytes))
    slot1 = jax.tree.map(lambda a: a[1], tree)
    for la, lb in zip(jax.tree.leaves(slot1), jax.tree.leaves(good)):
        la, lb = np.asarray(la), np.asarray(lb)
        sl = tuple(slice(0, s) for s in lb.shape)
        assert (la[sl] == lb).all()
        pad = np.ones(la.shape, bool)
        pad[sl] = False
        assert (la[pad] == 0).all()


def test_ingest_deep_synthetic_head_then_rebuild(proof_bytes):
    """Family-valid head with depth-20 witness padding: golden proofs
    pad-copy into the deep layout; the NEXT all-honest chunk must rebuild a
    canonical layout instead of slow-pathing forever."""
    cfg = StarkConfig()
    syn = _synthetic_family_blob(cfg, depth=20)
    tree, ok, layout = ingest.ingest_chunk([syn, proof_bytes], cfg)
    assert ok.tolist() == [True, True]
    _t2, ok2, layout2 = ingest.ingest_chunk([proof_bytes, proof_bytes],
                                            cfg, layout)
    assert ok2.tolist() == [True, True]
    assert layout2 is not layout
    assert layout2.lv_meta[0] == (40, 32, 13, 160, 32, 15)


# ---------------------------------------------------------------------------
# randomized pipelining state-machine property test (stubbed verifier)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("device_parse", [False, True])
def test_stream_state_machine_randomized(proof_bytes, small_family_blob,
                                         monkeypatch, device_parse):
    """>=100 random schedules (blob mixes x chunk sizes x mesh widths x
    partial-manifest resumes) through verify_stream, with the device
    verifier stubbed by a root-comparison so the double-buffer / pending /
    manifest-skip interplay (parallel/mesh.py:160-225) is exercised at
    interactive speed -- in both host-parse and device-parse ingestion
    modes (the latter stubs the blob verifier with the REAL static-layout
    parse for shape_ok plus the root comparison, so the fallback rerouting
    is exercised too).  Expected verdicts come from a naive one-blob-at-a-
    time reference (= the reference's per-proof main(), main.rs:199-227)."""
    cfg = StarkConfig()
    golden_root = np.frombuffer(proof_bytes[:32], dtype="<u4")
    corrupt = bytearray(proof_bytes)
    corrupt[40] ^= 0x80                    # l_merkle_root flip: parses, fails
    categories = [
        proof_bytes,                       # valid
        proof_bytes + b"trail",            # valid + trailing (parity accepts)
        bytes(corrupt),                    # parses; stub verdict False
        proof_bytes[:1000],                # truncated
        _zero_level_proof(),               # wire-valid, zero levels
        small_family_blob,                 # valid proof, wrong family
        _synthetic_family_blob(cfg, 1),    # family-valid, shallow padding
        _synthetic_family_blob(cfg, 20),   # family-valid, deep padding
    ]

    def fake_make_sharded_verifier(mesh, vcfg, inp=3, shared_merkle=True):
        def fn(tree):
            roots = np.asarray(tree["merkle_root"])
            v = (roots == golden_root).all(axis=-1)
            return v, v.all()
        return fn

    monkeypatch.setattr(M, "make_sharded_verifier",
                        fake_make_sharded_verifier)

    if device_parse:
        from stark_verifier_tpu.proofio import static_layout as SL
        lay = SL.canonical_layout(cfg)
        parse_j = jax.jit(lay.parse)      # one jitted parse, cached by shape

        def fake_make_sharded_blob_verifier(mesh, vcfg, inp=3,
                                            axis_name="data"):
            def fn(words):
                w = np.asarray(words)
                _, shape_ok = parse_j(w)
                so = np.asarray(shape_ok)
                v = (w[:, :8] == golden_root).all(axis=1) & so
                return v, so
            return fn, lay

        monkeypatch.setattr(M, "make_sharded_blob_verifier",
                            fake_make_sharded_blob_verifier)

    def naive_verdict(blob):
        """One blob per 'process': ingest alone, stub-verify alone."""
        tree, ok, _ = ingest.ingest_chunk([blob], cfg)
        if not ok[0]:
            return False
        return bool((np.asarray(tree["merkle_root"][0])
                     == golden_root).all())

    expected_by_cat = [naive_verdict(b) for b in categories]
    rng = random.Random(1234)

    for trial in range(110):
        n = rng.randint(1, 9)
        picks = [rng.randrange(len(categories)) for _ in range(n)]
        blobs = [categories[p] for p in picks]
        want = {i: expected_by_cat[p] for i, p in enumerate(picks)}
        chunk = rng.randint(1, 5)
        mesh = M.make_mesh(rng.choice([1, 2]))
        manifest = {}
        got = dict(M.verify_stream(blobs, chunk=chunk, mesh=mesh,
                                   manifest=manifest,
                                   device_parse=device_parse))
        assert got == want, (trial, picks, chunk, got, want)
        # partial-manifest resume: keep a random subset of completed chunks
        # (breaks the strict parity alternation -> same-parity pending path)
        kept = {k: v for k, v in manifest.items() if rng.random() < 0.5}
        got2 = dict(M.verify_stream(blobs, chunk=chunk, mesh=mesh,
                                    manifest=kept,
                                    device_parse=device_parse))
        assert got2 == want, (trial, "resume", picks, chunk, got2, want)


def test_stream_mixed_adversarial_e2e(proof_bytes, small_family_blob):
    """One real-verification schedule mixing every adversarial class across
    chunk boundaries (state-machine coverage with the stub is above; this
    pins the end-to-end integration)."""
    cfg = StarkConfig()
    corrupt = bytearray(proof_bytes)
    corrupt[110] ^= 0x80
    blobs = [_zero_level_proof(), proof_bytes, small_family_blob,
             proof_bytes, bytes(corrupt), proof_bytes]
    got = dict(M.verify_stream(blobs, chunk=2, mesh=M.make_mesh(2)))
    assert got == {0: False, 1: True, 2: False, 3: True, 4: False, 5: True}


def test_ingest_slow_fallback_independence(proof_bytes, small_family_blob,
                                           monkeypatch):
    """The pure-Python fallback (_ingest_chunk_slow, used when no C
    compiler exists) must give the same per-proof verdict independence:
    adversarial blobs reject alone, and trees with differing witness
    padding pad-stack instead of crashing np.stack."""
    from stark_verifier_tpu import native
    monkeypatch.setattr(native, "get_lib", lambda: None)
    cfg = StarkConfig()
    blobs = [_zero_level_proof(), small_family_blob, proof_bytes,
             _synthetic_family_blob(cfg, 1), proof_bytes[:90], proof_bytes]
    tree, ok, _ = ingest.ingest_chunk(blobs, cfg, pad_to=8)
    # synthetic depth-1 blob is structurally valid (verification rejects it
    # later); its presence must not crash the ragged pad-stack
    assert ok.tolist() == [False, False, True, True, False, True]
    good = device.proof_tree(wire.parse_proof(proof_bytes))
    got2 = jax.tree.map(lambda a: a[2], tree)
    for la, lb in zip(jax.tree.leaves(got2), jax.tree.leaves(good)):
        la, lb = np.asarray(la), np.asarray(lb)
        sl = tuple(slice(0, s) for s in lb.shape)
        assert (la[sl] == lb).all()
