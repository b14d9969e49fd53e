"""The MiMC-permutation STARK statement family.

Statement (reference: /root/reference/src/main.rs:205-218, SURVEY.md section
0): "I know the execution trace of `num_steps` rounds of
x <- x^3 + k_{i mod 64} (mod p), starting at `inp` and ending at the claimed
output", with round constants k_i = (i^7) XOR 42 and steps-1 actual
transitions (utils.rs:11).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import fp
from ..config import StarkConfig, StatementTables
from ..ops import field as F, mimc as mimc_ops
from ..protocol import verify as V
from .base import StatementFamily


class MimcStatement(StatementFamily):
    name = "mimc"

    def __init__(self, cfg: StarkConfig | None = None):
        self._cfg = cfg or StarkConfig()

    def config(self) -> StarkConfig:
        return self._cfg

    def round_constants(self):
        return jnp.asarray(mimc_ops.round_constants_mimc(self._cfg.num_constants))

    def compute_output(self, inp: int):
        return mimc_ops.mimc(F.const(inp), self._cfg.num_steps,
                             self.round_constants())

    def make_verifier(self, inp: int = 3, shared_merkle: bool = True):
        return V.make_verifier(self._cfg, inp=inp,
                               shared_merkle=shared_merkle)

    def make_general_verifier(self, shared_merkle: bool = True):
        """Runtime-parameter verifier (cdylib boundary, lib.rs:99): see
        protocol.verify.make_general_verifier."""
        return V.make_general_verifier(self._cfg, shared_merkle=shared_merkle)
