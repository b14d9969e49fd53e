"""Statement families ("models") verifiable by the framework.

A statement family fixes the AIR (transition/boundary constraints), the trace
parameters, and the proof shape; every proof of a family shares device-array
shapes, which is what makes batched jitted verification possible.  The
reference supports exactly one family -- the MiMC permutation STARK
(reference: /root/reference/src/main.rs:199-227) -- provided here as
models.mimc; new families plug in by subclassing StatementFamily.
"""

from .base import StatementFamily  # noqa: F401
from . import mimc  # noqa: F401
from . import square  # noqa: F401

FAMILIES = {
    "mimc": mimc.MimcStatement,        # the reference's AIR (x^3 + k)
    "square": square.SquareStatement,  # second family (x^2 + k)
}
