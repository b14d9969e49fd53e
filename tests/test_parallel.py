"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md section
4(e)): data-parallel batched verification with the verdict-AND collective."""

import numpy as np
import jax

import stark_verifier_tpu  # noqa: F401  (path setup)
from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.parallel import mesh as M


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_sharded_batch_verify(proof_bytes):
    good = device.proof_tree(wire.parse_proof(proof_bytes))
    b = bytearray(proof_bytes)
    b[110] ^= 0x40
    bad = device.proof_tree(wire.parse_proof(bytes(b)))

    mesh = M.make_mesh(8)
    trees = [good, good, good, bad, good, good, good, good]
    batch = M.shard_batch(device.stack_proofs(trees), mesh)
    fn = M.make_sharded_verifier(mesh)
    verdicts, all_ok = fn(batch)
    verdicts = np.asarray(verdicts)
    assert verdicts.tolist() == [True] * 3 + [False] + [True] * 4
    assert not bool(np.asarray(all_ok))
    # shard layout: verdicts sharded over the mesh
    assert len(verdicts) == 8


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_cli_bench_mesh(proof_bytes, tmp_path, capsys):
    """`cli bench --devices N` routes through the sharded verifier and emits
    an n_devices-aware report plus the scaling-efficiency line (the moment
    real multi-chip hardware exists this is the BASELINE >=80% entry point;
    numbers on the CPU mesh are meaningless -- this pins the plumbing)."""
    import json
    from stark_verifier_tpu import cli

    rc = cli.main(["bench", "/root/reference/proof.bin", "--batch", "8",
                   "--devices", "8", "--iters", "1",
                   "--ref-single-chip", "100"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    report = json.loads(lines[0])
    assert report["n_devices"] == 8 and report["batch"] == 8
    assert abs(report["proofs_per_s_per_chip"] * 8
               - report["proofs_per_s"]) <= 0.1 * report["proofs_per_s"]
    eff = json.loads(lines[1])
    assert eff["scaling_efficiency"] > 0


def test_point_parallel_single_proof(proof_bytes):
    """POINT parallelism (SURVEY.md section 5): ONE proof's internal axes
    (FRI queries, Merkle branches, spot checks) sharded over the 8-device
    mesh; the only collective is the verdict AND.  Accept and reject must
    match the unsharded verifier."""
    tree = device.proof_tree(wire.parse_proof(proof_bytes))
    mesh = M.make_mesh(8)
    sharded = M.shard_point_proof(tree, mesh)
    assert sharded["main"]["value"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert sharded["fri"]["col_value"].sharding.spec == jax.sharding.PartitionSpec(None, "data")
    assert M.verify_point_parallel(tree, mesh) is True
    corrupt = bytearray(proof_bytes)
    corrupt[110] ^= 0x80
    tbad = device.proof_tree(wire.parse_proof(bytes(corrupt)))
    assert M.verify_point_parallel(tbad, mesh) is False
