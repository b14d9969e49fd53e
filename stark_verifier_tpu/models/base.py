"""Statement-family interface."""

from __future__ import annotations

import abc


class StatementFamily(abc.ABC):
    """A proof statement family: fixes constraints, trace shape, proof shape.

    Implementations provide the statement-level device constants and the
    claimed-output computation; the protocol layer (protocol/verify.py) is
    family-parameterized through StarkConfig/StatementTables today and will
    dispatch through this interface as more families land.
    """

    name: str

    @abc.abstractmethod
    def config(self):
        """The StarkConfig for this family."""

    @abc.abstractmethod
    def compute_output(self, inp):
        """Device computation of the claimed trace output ([..., 16] limbs)."""

    @abc.abstractmethod
    def make_verifier(self, inp):
        """(verify_fn, tables): jitted batched verifier for this family."""
