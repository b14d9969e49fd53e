"""tpu-stark: a TPU-native STARK verification framework (JAX/XLA/Pallas).

Capability-parity rebuild of the Rust reference verifier
jwasinger/stark-verifier (see SURVEY.md), designed TPU-first: 256-bit field
elements as 16x16-bit limb vectors, batched Blake2s/Merkle kernels, jitted
FRI + constraint checks, and batch sharding over device meshes.
"""

from .fp import MODULUS, EXTENSION_FACTOR  # noqa: F401

__version__ = "0.1.0"
