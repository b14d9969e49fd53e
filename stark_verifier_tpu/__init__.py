"""tpu-stark: a TPU-native STARK verification framework (JAX/XLA/Pallas).

Capability-parity rebuild of the Rust reference verifier
jwasinger/stark-verifier (see SURVEY.md), designed TPU-first: 256-bit field
elements as 16x16-bit limb vectors, batched Blake2s/Merkle kernels, jitted
FRI + constraint checks, and batch sharding over device meshes.
"""

from .fp import MODULUS, EXTENSION_FACTOR  # noqa: F401

__version__ = "0.1.0"


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Enable JAX's persistent compilation cache on CPU backends.

    Deliberately a no-op on TPU here: with the axon remote-compile plugin,
    deserializing a cached executable has been observed to hang, while a fresh
    compile completes -- so TPU processes pay one compile per process instead.

    Entries are written with zlib instead of zstd (the zstandard C extension
    segfaults compressing entries late in long multi-compile processes --
    tests/conftest.py history); reads sniff the zstd frame magic so caches
    written either way stay readable.
    """
    import jax
    if jax.default_backend() != "cpu":
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import zlib
    from jax._src import compilation_cache as _cc
    if getattr(_cc.decompress_executable, "_svt_zlib_shim", False):
        return
    zstd_magic = b"\x28\xb5\x2f\xfd"
    zstd_decompress = _cc.decompress_executable

    def _sniff(e):
        return zstd_decompress(e) if e[:4] == zstd_magic else zlib.decompress(e)

    _sniff._svt_zlib_shim = True
    _cc.compress_executable = zlib.compress
    _cc.decompress_executable = _sniff


def verify_proof_bytes(proof_bytes: bytes, inp: int = 3,
                       log_steps: int = 13, strict: bool = False) -> bool:
    """Parse + verify one serialized proof; malformed input rejects.

    Library facade mirroring the reference cdylib entry point
    (reference: /root/reference/src/lib.rs:99 pub verify_mimc_proof, plus the
    main() driver's parse/MiMC recompute, main.rs:199-227).  Malformed or
    family-shape-mismatched proofs return False (the reference panics =
    reject, SURVEY.md 2.2.8); trailing bytes after the proof are tolerated
    like the reference (main.rs:204) unless strict.  For batched verification
    use protocol.verify.make_verifier directly.
    """
    import numpy as np
    from .config import StarkConfig
    from .proofio import wire, device
    from .protocol import verify as V

    cfg = StarkConfig(log_steps=log_steps, strict=strict)
    try:
        host_tree = device.proof_tree(wire.parse_and_validate(proof_bytes, cfg))
    except wire.WireFormatError:
        return False
    tree = device.to_device(host_tree)
    fn, _ = V.make_verifier(cfg, inp=inp,
                            shared_merkle=device.is_rectangular(host_tree))
    return bool(np.asarray(fn(tree)))


def verify_mimc(inp, num_steps, round_constants, output, proofs,
                strict: bool = False):
    """Batched general verification -- the reference cdylib boundary
    (reference: /root/reference/src/lib.rs:99 pub verify_mimc_proof taking
    (inp, num_steps, round_constants, output, proof, modulus)).

    inp/output: ints; round_constants: list of ints (len a power of two);
    proofs: one `bytes` or a list of serialized proofs (same statement
    family, so one compiled graph covers the batch).  The modulus is the
    compile-time field prime (the limb arithmetic is specialized to it).
    Returns a numpy bool array [len(proofs)] (scalar bool for one proof);
    malformed proofs reject instead of panicking.
    """
    import numpy as np
    import jax.numpy as jnp
    from . import fp as _fp
    from .config import StarkConfig
    from .models.mimc import MimcStatement
    from .proofio import wire, device

    single = isinstance(proofs, (bytes, bytearray))
    blobs = [proofs] if single else list(proofs)
    cfg = StarkConfig(log_steps=num_steps.bit_length() - 1,
                      num_constants=len(round_constants), strict=strict)
    if cfg.num_steps != num_steps:
        raise ValueError("num_steps must be a power of two")

    trees, ok_parse = [], []
    golden_shape = None
    for b in blobs:
        try:
            t = device.proof_tree(wire.parse_and_validate(bytes(b), cfg))
            trees.append(t)
            ok_parse.append(True)
            golden_shape = t
        except wire.WireFormatError:
            trees.append(None)
            ok_parse.append(False)
    if golden_shape is None:
        out = np.zeros(len(blobs), dtype=bool)
        return bool(out[0]) if single else out
    trees = [t if t is not None else golden_shape for t in trees]
    shared = all(device.is_rectangular(t) for t in trees)
    fn, _ = MimcStatement(cfg).make_general_verifier(shared_merkle=shared)
    batch = device.to_device(device.stack_proofs(trees))

    verdicts = np.asarray(fn(
        batch,
        jnp.asarray(_fp.int_to_limbs(inp % MODULUS)),
        jnp.asarray(_fp.ints_to_limbs([c % MODULUS for c in round_constants])),
        jnp.asarray(_fp.int_to_limbs(output % MODULUS)),
    ))
    verdicts = verdicts & np.asarray(ok_parse)
    return bool(verdicts[0]) if single else verdicts
