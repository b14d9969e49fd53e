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

import functools

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
    scalar AND forces the cross-chip reduction collective.  MEMOIZED on
    (mesh, cfg, inp, axis_name, shared_merkle): jax.jit caches per function
    object, so a fresh closure per call recompiles the whole sharded graph
    (~7 min through the axon tunnel -- the round-3 stream bench spent its
    entire runtime recompiling, docs/PERF.md system-throughput section).
    """
    return _make_sharded_cached(mesh, cfg or StarkConfig(), inp, axis_name,
                                shared_merkle)


@functools.lru_cache(maxsize=8)
def _make_sharded_cached(mesh: Mesh, cfg: StarkConfig, inp: int,
                         axis_name: str, shared_merkle: bool):
    inner, _tables = V.make_verifier(cfg, inp, shared_merkle=shared_merkle)
    out_shardings = (NamedSharding(mesh, P(axis_name)),
                     NamedSharding(mesh, P()))

    def verify_fn(tree):
        verdicts = inner(tree)
        return verdicts, jnp.all(verdicts)

    return jax.jit(verify_fn, out_shardings=out_shardings)


def make_sharded_blob_verifier(mesh: Mesh, cfg: StarkConfig | None = None,
                               inp: int = 3, axis_name: str = "data",
                               chunk: int | None = None):
    """Sharded DEVICE-PARSE verifier: fn(words [B, layout.words] uint32) ->
    (verdict [B], shape_ok [B]) with deserialization fused into the graph
    (proofio.static_layout).  Returns (fn, layout).  Memoized.

    chunk: process the batch in fixed-size chunks INSIDE the graph
    (lax.map), amortizing the per-dispatch floor over arbitrarily large
    prestaged batches -- the blob analogue of make_chunked_verifier
    (single-chip oriented; batch must divide by chunk).

    Multi-host ingestion composes directly: each process packs its local
    blobs (CanonicalLayout.pack) and assembles the global sharded words
    array with shard_batch_per_host (it tree-maps, so a bare [local_n,
    words] array works) before calling the returned fn."""
    return _make_sharded_blob_cached(mesh, cfg or StarkConfig(), inp,
                                     axis_name, chunk)


@functools.lru_cache(maxsize=8)
def _make_sharded_blob_cached(mesh: Mesh, cfg: StarkConfig, inp: int,
                              axis_name: str, chunk: int | None):
    from ..proofio import static_layout as SL
    lay = SL.canonical_layout(cfg)
    inner, _tables = V.make_verifier(cfg, inp, shared_merkle=True)
    out_shardings = (NamedSharding(mesh, P(axis_name)),
                     NamedSharding(mesh, P(axis_name)))

    def one(words):
        tree, shape_ok = lay.parse(words)
        return inner(tree) & shape_ok, shape_ok

    def verify_fn(words):
        if chunk is None or words.shape[0] <= chunk:
            return one(words)
        batch = words.shape[0]
        if batch % chunk:
            raise ValueError(
                f"batch {batch} must be a multiple of chunk {chunk}")
        v, so = jax.lax.map(
            one, words.reshape(batch // chunk, chunk, words.shape[1]))
        return v.reshape(batch), so.reshape(batch)

    return jax.jit(verify_fn, out_shardings=out_shardings), lay


def shard_point_proof(tree, mesh: Mesh, axis_name: str = "data"):
    """device_put ONE proof tree with its branch/query/spot-check axes
    sharded over the mesh -- POINT parallelism (SURVEY.md section 5: the
    protocol's data-parallel axes inside a single proof are the 40 FRI
    queries x 4 row points per level, the 160 main / 80 lincomb branches,
    and the 80 spot checks).  The mesh size must divide every sharded
    axis length (8 divides 40/160/80 for the default family; raises on
    uneven meshes like 3 or 6).  Roots, POINTS, and the statement tables
    stay replicated; the only cross-chip communication in the compiled
    graph is the final verdict-AND reduction."""
    n_dev = mesh.devices.size
    q = tree["fri"]["col_value"].shape[-2]
    for ax_len in (q, tree["main"]["value"].shape[-2],
                   tree["lincomb"]["value"].shape[-2]):
        if ax_len % n_dev:
            raise ValueError(
                f"mesh size {n_dev} does not divide sharded axis {ax_len}; "
                f"use a mesh whose size divides the family's query/branch "
                f"counts")
    ax = axis_name
    rep = NamedSharding(mesh, P())
    row0 = NamedSharding(mesh, P(ax))            # branch-major leaves
    row1 = NamedSharding(mesh, P(None, ax))      # [level, branch, ...]

    def put(path, x):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "fri" in keys:
            if any(k in keys for k in ("col_witness", "poly_witness")):
                return jax.device_put(x, row0)   # per-level [q, d, 8] lists
            if any(k in keys for k in ("root2",)):
                return jax.device_put(x, rep)
            return jax.device_put(x, row1)       # [L, q, ...] stacked
        if any(k in keys for k in ("main", "lincomb")):
            return jax.device_put(x, row0)       # [n, ...] branch-major
        return jax.device_put(x, rep)            # roots, points

    return jax.tree_util.tree_map_with_path(put, tree)


def verify_point_parallel(tree, mesh: Mesh | None = None,
                          cfg: StarkConfig | None = None, inp: int = 3) -> bool:
    """Verify ONE proof with its internal axes sharded over the mesh
    (latency scaling, the dual of the batch-parallel path).  Uses the
    lockstep Merkle walk (shared_merkle=False): the shared-path dedup
    compares state ACROSS branches, which would turn every tree level into
    cross-chip collectives; the independent walk keeps each branch's chain
    chip-local so the only collective is the final verdict AND."""
    mesh = mesh or make_mesh()
    sharded = shard_point_proof(tree, mesh)
    fn, _ = V.make_verifier(cfg or StarkConfig(), inp, shared_merkle=False)
    return bool(np.asarray(fn(sharded)))


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
                  manifest: dict | None = None, threads: int = 4,
                  device_parse: bool = False):
    """Chunked verification of an arbitrarily large proof stream.

    proof_blobs: iterable of serialized proof byte strings.  Chunks of
    `chunk` blobs are batch-ingested (proofio.ingest: thread-parallel native
    scan/fill straight into reusable batch arrays -- no per-proof trees, no
    np.stack), sharded over the mesh, and verified; yields (global_index,
    verdict) pairs.  Malformed or family-mismatched proofs reject without
    aborting the stream (the reference would panic, SURVEY.md 2.2.8).

    device_parse=True switches ingestion to DEVICE-SIDE deserialization
    (proofio.static_layout): each blob uploads as one contiguous uint32 row
    and the proof pytree is built inside the verifier graph from static
    slices -- no host parsing, one H2D array per chunk.  Rerouted to the
    host parser chunk-wise: shape_ok=False rows, every blob SHORTER than
    the canonical length in every mode (zero padding could silently
    reconstruct a truncated proof whose missing tail bytes were zero), and
    any non-canonical length under strict mode (trailing bytes are
    invisible to the packed prefix) -- so verdicts are identical to the
    host path: a valid-but-oddly-padded proof still verifies, an
    adversarial blob still only rejects itself (per-proof independence,
    main.rs:199-227).  The host fallback graph compiles lazily on first
    use.

    `manifest`, if given, is a dict recording completed chunk ids -- rerunning
    with the same manifest skips finished chunks (verification is pure, so
    checkpoint/resume is just a completed-chunk set, SURVEY.md section 5).

    Ingestion is PIPELINED with device compute: a dispatched chunk's verdicts
    are fetched only when the NEXT chunk is ready (jax dispatch is async), so
    host-side parsing of chunk k+1 overlaps the device verifying chunk k --
    the system-throughput levers measured in docs/PERF.md.
    """
    from ..proofio import ingest
    vcfg = cfg or StarkConfig()
    mesh = mesh or make_mesh()
    if chunk is None:
        chunk = 64 * mesh.devices.size
    d = mesh.devices.size
    chunk = -(-chunk // d) * d       # round up to a whole number per device
    # make_sharded_verifier is memoized, so both Merkle-walk flavors
    # (rectangular -> shared-path walk, ragged -> masked lockstep) compile
    # at most once per process

    buf, idxs = [], []
    # DOUBLE-BUFFERED host-side buffers: chunk k fills slot [k % 2], so the
    # H2D copies of chunk k-1 (whose buffers are slot [(k-1) % 2]) overlap
    # chunk k's host packing/parsing.  Reusing slot [k % 2] for chunk k is
    # safe because chunk k-2's verdicts were already fetched in the previous
    # flush, which orders after its H2D.
    layouts = [None, None]           # host-parse mode: ingest BatchLayouts
    packs = [None, None]             # device-parse mode: [chunk, words] u32
    chunk_id = 0
    pending = None                   # in-flight chunk descriptor
    sharding = NamedSharding(mesh, P("data"))

    fb_layout = [None]               # persistent host-fallback ingest layout

    def host_verdicts(blobs):
        """Host-parse path for one chunk of blobs -> bool[n] (the fallback
        for non-canonical blobs in device-parse mode).  Synchronous, so the
        persistent fallback layout is free for reuse on return."""
        tree, ok, fb_layout[0] = ingest.ingest_chunk(
            blobs, vcfg, fb_layout[0], threads=threads, pad_to=chunk)
        if tree is None:
            return np.zeros(len(blobs), dtype=bool)
        rect = pdevice.is_rectangular(tree)
        fn = make_sharded_verifier(mesh, vcfg, inp, shared_merkle=rect)
        dv, _ = fn(shard_batch(tree, mesh))
        return np.asarray(dv)[:len(blobs)] & ok

    def collect(p):
        if p[0] == "host":
            _, cid, p_idxs, ok, dv = p
            verdicts = np.asarray(dv)[:len(p_idxs)] & ok  # blocks on device
        else:
            _, cid, p_idxs, p_blobs, lens, nbytes, dv, so = p
            n = len(p_idxs)
            verdicts = np.asarray(dv)[:n].copy()
            shape_ok = np.asarray(so)[:n]
            # reroute to the host parser: shape-lane failures; SHORT blobs
            # in every mode (zero-padding could silently reconstruct a
            # truncated proof whose missing tail bytes were zero, which the
            # host parser rejects); non-exact lengths under strict mode
            # (the packed prefix cannot see trailing bytes)
            fallback = ~shape_ok | (lens < nbytes)
            if vcfg.strict:
                fallback |= lens != nbytes
            fb = np.flatnonzero(fallback)
            if fb.size:
                verdicts[fb] = host_verdicts([p_blobs[j] for j in fb])
        if manifest is not None:
            manifest[cid] = [bool(v) for v in verdicts]
        return list(zip(p_idxs, (bool(v) for v in verdicts)))

    def dispatch_host(par):
        nonlocal layouts
        tree, ok, layouts[par] = ingest.ingest_chunk(
            buf, vcfg, layouts[par], threads=threads, pad_to=chunk)
        if tree is None:
            return None
        rect = pdevice.is_rectangular(tree)
        batch = shard_batch(tree, mesh)       # async H2D from layouts[par]
        fn = make_sharded_verifier(mesh, vcfg, inp, shared_merkle=rect)
        verdicts, _ = fn(batch)               # async dispatch
        return ("host", chunk_id, idxs, ok, verdicts)

    def dispatch_device(par):
        fn, lay = make_sharded_blob_verifier(mesh, vcfg, inp)
        if packs[par] is None:
            packs[par] = np.zeros((chunk, lay.words), dtype=np.uint32)
        packed, lens = lay.pack(buf, out=packs[par])
        words = jax.device_put(packed, sharding)   # ONE async H2D array
        verdicts, shape_ok = fn(words)             # async dispatch
        return ("dev", chunk_id, idxs, buf, lens, lay.nbytes,
                verdicts, shape_ok)

    def flush():
        nonlocal buf, idxs, chunk_id, pending
        if not buf:
            return []
        out = []
        if manifest is not None and chunk_id in manifest:
            out = [(i, manifest[chunk_id][k]) for k, i in enumerate(idxs)]
            buf, idxs = [], []
            chunk_id += 1
            return out
        par = chunk_id % 2
        if pending is not None and pending[1] % 2 == par:
            # same-parity in-flight chunk (manifest skips break the strict
            # alternation): its H2D may still be reading slot [par] --
            # fetch its verdicts before refilling those buffers
            out += collect(pending)
            pending = None
        p = dispatch_device(par) if device_parse else dispatch_host(par)
        if p is None:                         # nothing parseable (host path)
            # += not =: a same-parity pending chunk may have just been
            # collected into `out` above (manifest skips / tree-None chunks
            # break the parity alternation); overwriting dropped its
            # verdicts (caught by test_stream_state_machine_randomized)
            out += list(zip(idxs, [False] * len(idxs)))
            if manifest is not None:
                manifest[chunk_id] = [False] * len(idxs)
            buf, idxs = [], []
            chunk_id += 1
            return out
        if pending is not None:
            # fetching the PREVIOUS chunk's verdicts also orders after its
            # H2D, so its buffers (the ones the NEXT chunk fills) are free
            out += collect(pending)
        pending = p
        buf, idxs = [], []
        chunk_id += 1
        return out

    for gi, blob in enumerate(proof_blobs):
        buf.append(bytes(blob))
        idxs.append(gi)
        if len(buf) == chunk:
            yield from flush()
    yield from flush()
    if pending is not None:
        yield from collect(pending)
