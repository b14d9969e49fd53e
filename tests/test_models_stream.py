"""Statement-family registry and the chunked streaming verifier."""

import numpy as np

from stark_verifier_tpu import fp
from stark_verifier_tpu.models import mimc as mimc_model
from stark_verifier_tpu.parallel import mesh as M

import oracle


def test_mimc_statement_family():
    fam = mimc_model.MimcStatement()
    assert fam.config().num_steps == 8192
    out = fam.compute_output(3)
    assert fp.limbs_to_int(np.asarray(out)) == oracle.mimc(
        3, 8192, oracle.mimc_round_constants())


def test_verify_stream_chunked_with_malformed(proof_bytes):
    bad_wire = proof_bytes[:1000]            # truncated -> parse failure
    corrupt = bytearray(proof_bytes)
    corrupt[110] ^= 0x80                      # constraint failure
    blobs = [proof_bytes, bytes(corrupt), bad_wire, proof_bytes, proof_bytes]
    manifest = {}
    mesh = M.make_mesh(2)
    got = dict(M.verify_stream(blobs, chunk=2, mesh=mesh, manifest=manifest))
    assert got == {0: True, 1: False, 2: False, 3: True, 4: True}
    # resume from manifest: same verdicts, no recomputation of completed chunks
    got2 = dict(M.verify_stream(blobs, chunk=2, mesh=mesh, manifest=manifest))
    assert got2 == got
