"""The square-permutation STARK statement family (x <- x^2 + k_i).

A second AIR over the same field/proof machinery as models/mimc.py --
identical wire format, Merkle/FRI structure, and spot-check skeleton, but a
quadratic transition constraint P(g1 x) == P(x)^2 + K(x) + Z(x) D(x) instead
of the reference's cubic (reference AIR: /root/reference/src/main.rs:163-182
with utils.rs:12's x^3).  It exists to keep the statement-family abstraction
(models/base.py) load-bearing: the protocol layer dispatches the transition
power through StarkConfig.power, and tests/prover.py generates real proofs
for it (prove_to_bytes(..., power=2)).

Note x -> x^2 is not a permutation of F_p (gcd(2, p-1) = 2), but a STARK
over the trace does not need one -- the statement is about the execution
trace, not invertibility.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import StarkConfig
from ..ops import field as F, mimc as mimc_ops
from ..protocol import verify as V
from .base import StatementFamily


class SquareStatement(StatementFamily):
    name = "square"

    def __init__(self, cfg: StarkConfig | None = None):
        cfg = cfg or StarkConfig(power=2)
        if cfg.power != 2:
            raise ValueError("SquareStatement requires cfg.power == 2")
        self._cfg = cfg

    def config(self) -> StarkConfig:
        return self._cfg

    def round_constants(self):
        return jnp.asarray(
            mimc_ops.round_constants_mimc(self._cfg.num_constants))

    def compute_output(self, inp: int):
        return mimc_ops.mimc(F.const(inp), self._cfg.num_steps,
                             self.round_constants(), power=2)

    def make_verifier(self, inp: int = 3, shared_merkle: bool = True):
        return V.make_verifier(self._cfg, inp=inp,
                               shared_merkle=shared_merkle)

    def make_general_verifier(self, shared_merkle: bool = True):
        """Runtime-parameter verifier (same boundary as models/mimc.py)."""
        return V.make_general_verifier(self._cfg, shared_merkle=shared_merkle)
