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
    """
    import jax
    if jax.default_backend() != "cpu":
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def verify_proof_bytes(proof_bytes: bytes, inp: int = 3,
                       log_steps: int = 13) -> bool:
    """Parse + verify one serialized proof; malformed input rejects.

    Library facade mirroring the reference cdylib entry point
    (reference: /root/reference/src/lib.rs:99 pub verify_mimc_proof, plus the
    main() driver's parse/MiMC recompute, main.rs:199-227).  For batched
    verification use protocol.verify.make_verifier directly.
    """
    import numpy as np
    from .config import StarkConfig
    from .proofio import wire, device
    from .protocol import verify as V

    cfg = StarkConfig(log_steps=log_steps)
    try:
        tree = device.to_device(device.proof_tree(wire.parse_proof(proof_bytes)))
    except wire.WireFormatError:
        return False
    fn, _ = V.make_verifier(cfg, inp=inp)
    return bool(np.asarray(fn(tree)))
