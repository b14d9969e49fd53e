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


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Join a multi-host process group over DCN (jax.distributed).

    No-op when the env/args describe a single process.  After this,
    jax.devices() spans all hosts and the same jitted sharded verifier runs
    SPMD; each host device_puts only its addressable shard of the batch.
    Verification is stateless, so recovering a failed host = rerun its shard.
    """
    import os
    if coordinator is None:
        coordinator = os.environ.get("STARK_COORDINATOR")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ.get("STARK_NUM_PROCS", "1")),
        process_id=process_id if process_id is not None
        else int(os.environ.get("STARK_PROC_ID", "0")),
    )


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """device_put a batched proof tree with its leading axis sharded.

    Single-process form: every process must pass the identical global batch.
    Multi-host ingestion of per-host data goes through shard_batch_per_host.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch_per_host(local_tree, mesh: Mesh, axis_name: str = "data"):
    """Assemble a global sharded batch from PER-HOST local shards.

    Each process passes only the proofs it parsed ([local_n, ...] leading
    axis); the result is a global [n_processes * local_n, ...] array sharded
    over the mesh -- the multi-host ingestion path (each host device_puts
    only its addressable shard; no cross-host data movement happens until
    the verdict collective)."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, local_tree)


def make_sharded_verifier(mesh: Mesh, cfg: StarkConfig | None = None,
                          inp: int = 3, axis_name: str = "data",
                          shared_merkle: bool = True):
    """Jitted batch verifier whose inputs/outputs are sharded over the mesh.

    Returns verify_fn(tree) -> (verdicts [batch] bool, all_ok scalar).  The
    scalar AND forces the cross-chip reduction collective.
    """
    cfg = cfg or StarkConfig()
    inner, _tables = V.make_verifier(cfg, inp, shared_merkle=shared_merkle)
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
    shared = all(pdevice.is_rectangular(t) for t in proof_trees)
    batch = shard_batch(batch, mesh)
    fn = make_sharded_verifier(mesh, cfg, inp, shared_merkle=shared)
    verdicts, _ = fn(batch)
    return np.asarray(verdicts)


def verify_stream(proof_blobs, chunk: int | None = None, mesh: Mesh | None = None,
                  cfg: StarkConfig | None = None, inp: int = 3,
                  manifest: dict | None = None):
    """Chunked verification of an arbitrarily large proof stream.

    proof_blobs: iterable of serialized proof byte strings.  Proofs are
    parsed (native fast path), batched into fixed-size chunks (padded with
    the first proof so every chunk reuses one compiled shape), sharded over
    the mesh, and verified; yields (global_index, verdict) pairs.  Malformed
    proofs are rejected at parse time without aborting the stream
    (the reference would panic, SURVEY.md 2.2.8).

    `manifest`, if given, is a dict recording completed chunk ids -- rerunning
    with the same manifest skips finished chunks (verification is pure, so
    checkpoint/resume is just a completed-chunk set, SURVEY.md section 5).
    """
    from ..proofio import wire
    mesh = mesh or make_mesh()
    if chunk is None:
        chunk = 64 * mesh.devices.size
    d = mesh.devices.size
    chunk = -(-chunk // d) * d       # round up to a whole number per device
    # one compiled verifier per Merkle-walk flavor: rectangular chunks take
    # the shared-path walk, chunks containing a ragged proof the masked walk
    fns = {}

    def fn_for(rect: bool):
        if rect not in fns:
            fns[rect] = make_sharded_verifier(mesh, cfg, inp,
                                              shared_merkle=rect)
        return fns[rect]

    buf, idxs, pad_tree = [], [], None
    chunk_id = 0

    def flush():
        nonlocal buf, idxs, chunk_id
        if not buf:
            return []
        if manifest is not None and chunk_id in manifest:
            out = [(i, manifest[chunk_id][k]) for k, i in enumerate(idxs)]
            buf, idxs = [], []
            chunk_id += 1
            return out
        n = len(buf)
        rect = all(pdevice.is_rectangular(t) for t in buf)
        while len(buf) < chunk:
            buf.append(pad_tree)
        batch = shard_batch(pdevice.stack_proofs(buf), mesh)
        verdicts, _ = fn_for(rect)(batch)
        verdicts = np.asarray(verdicts)[:n]
        out = list(zip(idxs, (bool(v) for v in verdicts)))
        if manifest is not None:
            manifest[chunk_id] = [bool(v) for v in verdicts]
        buf, idxs = [], []
        chunk_id += 1
        return out

    parse_failures = []
    for gi, blob in enumerate(proof_blobs):
        try:
            tree = pdevice.proof_tree(wire.parse_proof_fast(blob))
        except wire.WireFormatError:
            parse_failures.append((gi, False))
            continue
        if pad_tree is None:
            pad_tree = tree
        buf.append(tree)
        idxs.append(gi)
        if len(buf) == chunk:
            yield from flush()
        while parse_failures:
            yield parse_failures.pop(0)
    yield from flush()
    yield from parse_failures
