"""Omission profile: in-graph marginal cost of each verifier phase.

Standalone phase timings through the axon tunnel are polluted by the
~30 ms dispatch floor and device->host fetch, and in-graph XLA overlaps
phases; the honest attribution is OMISSION -- compile the full verifier
with one phase stubbed out and subtract.  Verdicts are garbage for the
stubbed variants (timing only).

Usage: python tools/prof_omit.py [batch] [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from stark_verifier_tpu.config import StarkConfig
from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.ops import field as F, merkle, prg, quartic
from stark_verifier_tpu.protocol import verify as V


def timeit(fn, tree, iters):
    np.asarray(fn(tree))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(tree))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    cfg = StarkConfig()
    pb = open("/root/reference/proof.bin", "rb").read()
    tree = device.to_device(device.replicate_proof(
        device.proof_tree(wire.parse_proof_fast(pb)), batch))
    print(f"batch={batch} device={jax.devices()[0]} "
          f"pallas={F.pallas_enabled()}", flush=True)

    real_branches = merkle.verify_branches
    real_shared = merkle.verify_groups_shared
    real_eval4 = quartic.eval4_even_odd
    real_prg = prg.pseudorandom_indices
    import stark_verifier_tpu.ops.fri_pallas as frip
    import stark_verifier_tpu.ops.spot_pallas as spotp
    real_rows = frip.eval4_rows
    real_spot = spotp.spot_checks

    def stub_branches(root, idx, value, sibling, witness, depth):
        return jnp.ones(idx.shape, bool), None

    def stub_shared(groups):
        return [jnp.ones(g["root"].shape[:-1], bool) for g in groups]

    def stub_eval4(x1i, x1sqi, ys, sx, ginv, inv4):
        return jnp.zeros(x1i.shape, jnp.uint32)

    def stub_rows(x1i, x1sqi, ys, sx, ginv, inv4, interpret=False):
        return jnp.zeros(x1i.shape[:-1] + (8,), jnp.uint32)   # BE word rows

    def stub_spot(raw5, tab5, ks4, ic1, ic0, interpret=False, power=3):
        return jnp.ones(raw5.shape[:-2] + (3,), bool)

    def stub_prg(seed_words, n, modulus, exclude_multiples_of=0):
        out = jnp.broadcast_shapes(seed_words.shape[:-1] + (n,),
                                   jnp.shape(jnp.asarray(modulus)))
        return jnp.ones(out, jnp.uint32)

    variants = {
        "full": {},
        "no merkle walks": {"branches": stub_branches, "shared": stub_shared},
        "no fri row math": {"eval4": stub_eval4, "rows": stub_rows},
        "no spot math": {"spot": stub_spot},
        "no index prgs": {"prg": stub_prg},
    }

    base = None
    for name, stubs in variants.items():
        merkle.verify_branches = stubs.get("branches", real_branches)
        merkle.verify_groups_shared = stubs.get("shared", real_shared)
        quartic.eval4_even_odd = stubs.get("eval4", real_eval4)
        frip.eval4_rows = stubs.get("rows", real_rows)
        spotp.spot_checks = stubs.get("spot", real_spot)
        prg.pseudorandom_indices = stubs.get("prg", real_prg)
        try:
            # make_verifier memoizes per (cfg, inp, shared) -- a stubbed
            # variant must NOT reuse the full graph's cached executable
            V._make_verifier_cached.cache_clear()
            fn, _ = V.make_verifier(cfg)
            p50 = timeit(fn, tree, iters)
        finally:
            merkle.verify_branches = real_branches
            merkle.verify_groups_shared = real_shared
            quartic.eval4_even_odd = real_eval4
            frip.eval4_rows = real_rows
            spotp.spot_checks = real_spot
            prg.pseudorandom_indices = real_prg
        delta = "" if base is None else f"   marginal {1e3*(base-p50):7.2f} ms"
        if base is None:
            base = p50
        print(f"{name:18s} {1e3*p50:8.2f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()
