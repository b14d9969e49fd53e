"""MiMC permutation on device (the statement's trace-output recompute).

Reference: /root/reference/src/utils.rs:8-16 -- note the reference iterates
steps-1 times (utils.rs:11), i.e. the trace has `steps` states and steps-1
transitions (SURVEY.md section 2.2.9).  Implemented as a lax.scan of the
cube-and-add round over the cycled round-constant sequence; this same scan is
the trace generator a future prover would batch.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .. import fp
from . import field as F


def mimc(inp: jnp.ndarray, steps: int, round_constants: jnp.ndarray,
         power: int = 3) -> jnp.ndarray:
    """inp: [..., 16] canonical; round_constants: [k, 16]. Returns [..., 16].

    Computes steps-1 rounds of x <- x^power + c_{i mod k} (mod p); power 3 is
    the reference MiMC family (utils.rs:8-16), power 2 the square family
    (models/square.py).
    """
    if power not in (2, 3):
        raise ValueError(f"unsupported transition power {power}")
    k = round_constants.shape[0]
    idx = np.arange(steps - 1, dtype=np.int32) % k
    ks = jnp.take(round_constants, jnp.asarray(idx), axis=0)   # [steps-1, 16]

    def round_(x, c):
        # x^(power-1) * x + c through one fold reduction (field.mul_sum_mod):
        # minimal folds per round (no stacked add normalization)
        pairs = [(F.sqr_mod(x), x)] if power == 3 else [(x, x)]
        nxt = F.mul_sum_mod(pairs, extra=[jnp.broadcast_to(c, x.shape)])
        return nxt, None

    out, _ = lax.scan(round_, inp, ks)
    return out


def round_constants_mimc(n: int = 64) -> np.ndarray:
    """(i^7) XOR 42 for i < n (reference: src/main.rs:209-212 -- BigInt pow
    then bitwise XOR).  Host-side; returns [n, 16] uint32 limbs."""
    return fp.ints_to_limbs([(i ** 7) ^ 42 for i in range(n)])


def mimc_host(inp: int, steps: int, constants: list[int] | None = None,
              modulus: int = fp.MODULUS, power: int = 3) -> int:
    """Host (exact-int) MiMC output -- the claimed output is a statement-level
    constant, so the batched verifier precomputes it once on host instead of
    re-running the 8191-step scan on device per jit invocation (the reference
    also computes it outside the verification timer, main.rs:214-218)."""
    if constants is None:
        constants = [(i ** 7) ^ 42 for i in range(64)]
    out = inp
    n = len(constants)
    for i in range(steps - 1):
        out = (out ** power + constants[i % n]) % modulus
    return out
