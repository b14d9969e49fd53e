"""Multi-chip / multi-host scaling of batched verification.

The reference is single-threaded, single-process (SURVEY.md section 5); this
module is genuinely new capability.  Design (SURVEY.md section 7 step 7):
proof verification is embarrassingly parallel over the batch axis, so the
clean decomposition is data-parallel: shard the leading (proof) axis of the
proof pytree over a 1-D device mesh with NamedSharding and let XLA partition
the jitted verifier; the only cross-chip communication is the final verdict
reduction (an AND == min over chips), which XLA compiles to a psum-style
collective over ICI.

Multi-host: jax.distributed.initialize() forms the process group over DCN;
each host stages its local shard of proofs via device_put to its addressable
devices, and the same jitted function runs SPMD.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import StarkConfig
from ..protocol import verify as V
from ..proofio import device as pdevice


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """device_put a batched proof tree with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_verifier(mesh: Mesh, cfg: StarkConfig | None = None,
                          inp: int = 3, axis_name: str = "data"):
    """Jitted batch verifier whose inputs/outputs are sharded over the mesh.

    Returns verify_fn(tree) -> (verdicts [batch] bool, all_ok scalar).  The
    scalar AND forces the cross-chip reduction collective.
    """
    cfg = cfg or StarkConfig()
    inner, _tables = V.make_verifier(cfg, inp)
    out_shardings = (NamedSharding(mesh, P(axis_name)),
                     NamedSharding(mesh, P()))

    def verify_fn(tree):
        verdicts = inner(tree)
        return verdicts, jnp.all(verdicts)

    return jax.jit(verify_fn, out_shardings=out_shardings)


def verify_batch(proof_trees: list, mesh: Mesh | None = None,
                 cfg: StarkConfig | None = None, inp: int = 3) -> np.ndarray:
    """Convenience: stack host proof trees, shard, verify; returns verdicts."""
    mesh = mesh or make_mesh()
    batch = pdevice.stack_proofs(proof_trees)
    batch = shard_batch(batch, mesh)
    fn = make_sharded_verifier(mesh, cfg, inp)
    verdicts, _ = fn(batch)
    return np.asarray(verdicts)
