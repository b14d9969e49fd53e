"""Multi-PROCESS distributed verification over jax.distributed (CPU).

The virtual 8-device single-process mesh is covered by test_parallel; this
spawns TWO real processes that form a process group over the loopback
coordinator, build a global 4-device mesh (2 local devices each), shard a
proof batch data-parallel, and reduce the verdict collective across
processes -- the true multi-host code path of parallel/mesh.py
(SURVEY.md section 5, distributed bullet)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tests")
    import stark_verifier_tpu as sv
    from stark_verifier_tpu.parallel import mesh as M
    from stark_verifier_tpu.proofio import wire, device
    from stark_verifier_tpu.ops import merkle
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    import oracle

    coord, pid = sys.argv[1], int(sys.argv[2])
    M.init_distributed(coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2
    sv.enable_compile_cache()

    # a real protocol component kept cheap to compile (seconds, not the full
    # verifier graph): the lincomb Merkle group verified data-parallel over
    # the GLOBAL 4-device mesh, with the verdict AND as the cross-process
    # collective
    with open("/root/reference/proof.bin", "rb") as f:
        proof = f.read()
    p = wire.parse_proof(proof)
    positions = oracle.get_pseudorandom_indices(
        bytes(np.asarray(p.l_merkle_root_words).view(np.uint8)),
        80, 65536, 8)
    g = p.lincomb
    batch = 4
    tree = {
        "root": np.broadcast_to(np.asarray(p.l_merkle_root_words), (batch, 8)).copy(),
        "idx": np.broadcast_to(np.array(positions, np.uint32), (batch, 80)).copy(),
        "value": np.broadcast_to(g.value_words, (batch,) + g.value_words.shape).copy(),
        "sibling": np.broadcast_to(g.sibling_words, (batch,) + g.sibling_words.shape).copy(),
        "witness": np.broadcast_to(g.witness_words, (batch,) + g.witness_words.shape).copy(),
        "depth": np.broadcast_to(g.depths, (batch,) + g.depths.shape).copy(),
    }
    mesh = M.make_mesh()                      # global 4-device mesh
    # per-host ingestion: each process stages only ITS local half (2 rows of
    # the global 4-row batch)
    local = {k: v[:2] for k, v in tree.items()}
    sharded = M.shard_batch_per_host(local, mesh)

    def fn(t):
        ok, _ = merkle.verify_branches(t["root"][:, None, :], t["idx"],
                                       t["value"], t["sibling"],
                                       t["witness"], t["depth"])
        verdicts = jnp.all(ok, axis=-1)
        return verdicts, jnp.all(verdicts)    # scalar AND = collective

    fn = jax.jit(fn, out_shardings=(NamedSharding(mesh, P("data")),
                                    NamedSharding(mesh, P())))
    verdicts, all_ok = fn(sharded)
    # all_ok is replicated (P()) -> addressable on every process
    assert bool(np.asarray(all_ok)), "golden branches rejected in distributed run"

    # negative path: corrupt THIS host's local shard only (process 1) -> the
    # collective must carry the rejection to every process
    bad = {k: v.copy() for k, v in local.items()}
    if pid == 1:
        bad["value"][:, 0, 0] ^= 1
    verdicts2, all_ok2 = fn(M.shard_batch_per_host(bad, mesh))
    assert not bool(np.asarray(all_ok2)), "corruption not seen across processes"
    print(f"process {pid}: distributed verify OK", flush=True)
""")


def test_two_process_distributed_verify(proof_bytes):
    if os.environ.get("STARK_SKIP_SUBPROCESS"):
        pytest.skip("subprocess spawning disabled")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "distributed verify OK" in out
