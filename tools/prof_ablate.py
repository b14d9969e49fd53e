"""Ablation profile of the verifier: time each protocol phase as its own
jitted graph at a given batch size to find the hot spots.

Usage: python tools/prof_ablate.py [batch] [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from stark_verifier_tpu.config import StarkConfig, StatementTables
from stark_verifier_tpu.proofio import wire, device
from stark_verifier_tpu.ops import blake2s, field as F, merkle, mimc as mimc_ops, ntt, prg, quartic
from stark_verifier_tpu.protocol import verify as V
from stark_verifier_tpu import fp


def timeit(name, fn, *args, iters=5):
    np.asarray(jax.block_until_ready(fn(*args)))   # compile + warm
    ts = []
    for _ in range(iters):
        t = time.perf_counter()
        # force a device->host fetch: through the axon tunnel,
        # block_until_ready alone has been observed to return before the
        # computation finishes, reporting dispatch time only
        np.asarray(jax.block_until_ready(fn(*args)))
        ts.append(time.perf_counter() - t)
    p50 = float(np.percentile(ts, 50))
    print(f"{name:28s} {p50*1e3:9.2f} ms", flush=True)
    return p50


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cfg = StarkConfig()
    tables = StatementTables(cfg)

    pb = open("/root/reference/proof.bin", "rb").read()
    tree = device.to_device(device.replicate_proof(
        device.proof_tree(wire.parse_proof_fast(pb)), batch))
    print(f"batch={batch} device={jax.devices()[0]}", flush=True)

    lead_n = 1

    @jax.jit
    def full(tree):
        constants = jnp.asarray(mimc_ops.round_constants_mimc(64))
        out = mimc_ops.mimc(F.const(3), cfg.num_steps, constants)
        output = jnp.broadcast_to(out, tree["merkle_root"].shape[:-1] + (fp.NLIMBS,))
        return V.verify_mimc_proof(tree, 3, output, tables, cfg)

    @jax.jit
    def hashes_only(tree):
        """All Merkle groups + PRGs, no field math."""
        fri = tree["fri"]
        moduli = np.asarray(tables.level_moduli_np)
        root2 = fri["root2"]
        prev = jnp.concatenate([tree["l_merkle_root"][..., None, :],
                                root2[..., :-1, :]], axis=-2)
        ys = prg.pseudorandom_indices(root2, 40, jnp.asarray(moduli)[:, None], 8)
        i4 = jnp.arange(4, dtype=jnp.uint32)
        pp = (ys[..., None] + jnp.asarray(moduli)[:, None, None] * i4).reshape(
            *ys.shape[:-1], 160)
        oks_l = []
        for l in range(len(fri["col_witness"])):
            okc, _ = merkle.verify_branches(
                root2[..., l, :], ys[..., l, :], fri["col_value"][..., l, :, :],
                fri["col_sibling"][..., l, :, :], fri["col_witness"][l],
                fri["col_depth"][..., l, :])
            okp, _ = merkle.verify_branches(
                prev[..., l, :], pp[..., l, :], fri["poly_value"][..., l, :, :],
                fri["poly_sibling"][..., l, :, :], fri["poly_witness"][l],
                fri["poly_depth"][..., l, :])
            oks_l.append(jnp.all(okc, -1) & jnp.all(okp, -1))
        oks_l = jnp.stack(oks_l, axis=0)
        positions = prg.pseudorandom_indices(tree["l_merkle_root"], 80, 65536, 8)
        aug = jnp.stack([positions, (positions + 8) % 65536], -1).reshape(
            *positions.shape[:-1], 160)
        okm, _ = merkle.verify_branches(tree["merkle_root"], aug,
                                        tree["main"]["value"], tree["main"]["sibling"],
                                        tree["main"]["witness"], 15)
        okl, _ = merkle.verify_branches(tree["l_merkle_root"], positions,
                                        tree["lincomb"]["value"],
                                        tree["lincomb"]["sibling"],
                                        tree["lincomb"]["witness"], 15)
        return jnp.all(oks_l, 0) & jnp.all(okm, -1) & jnp.all(okl, -1)

    @jax.jit
    def fri_math_only(tree):
        """FRI field math, no Merkle -- the PRODUCTION row check (even/odd
        split with x1^-1/x1^-2 gathers, mirroring protocol/verify._fri_checks;
        Pallas kernel when STARK_PALLAS=1, like the live verifier)."""
        fri = tree["fri"]
        root2 = fri["root2"]
        prev = jnp.concatenate([tree["l_merkle_root"][..., None, :],
                                root2[..., :-1, :]], axis=-2)
        special_x = F.words_be_to_limbs(prev)
        mod_b = jnp.asarray(tables.level_moduli_np)[:, None]
        ys = prg.pseudorandom_indices(root2, 40, mod_b, 8)
        g2t = jnp.asarray(tables.g2_powers)
        mask = jnp.uint32(65535)
        lvl_mult = jnp.asarray(np.array([4 ** l for l in range(5)],
                                        dtype=np.uint32))[:, None]
        e1 = (ys * lvl_mult) & mask
        x1_inv = jnp.take(g2t, (jnp.uint32(0) - e1) & mask, axis=0)
        x1sq_inv = jnp.take(g2t, (jnp.uint32(0) - jnp.uint32(2) * e1) & mask,
                            axis=0)
        if F.pallas_enabled():
            from stark_verifier_tpu.ops import fri_pallas
            rows_w = fri["poly_value"].reshape(
                *fri["poly_value"].shape[:-2], 40, 4, 8)
            lhs = fri_pallas.eval4_rows(
                x1_inv, x1sq_inv, rows_w, special_x,
                np.asarray(tables.quartic_ginv), np.asarray(tables.inv4))
            cv = fri["col_value"]
        else:
            rows = F.words_be_to_limbs(fri["poly_value"]).reshape(
                *fri["poly_value"].shape[:-2], 40, 4, fp.NLIMBS)
            lhs = quartic.eval4_even_odd(
                x1_inv, x1sq_inv, rows, special_x,
                jnp.asarray(tables.quartic_ginv), jnp.asarray(tables.inv4))
            cv = F.words_be_to_limbs(fri["col_value"])
        return jnp.all(jnp.all(jnp.all(lhs == cv, -1), -1), -1)

    @jax.jit
    def spot_only(tree):
        """Constraint spot checks without Merkle/MiMC (table-gathered Z/Z2/K
        + multi-term zero combos, as the live verifier does)."""
        positions = prg.pseudorandom_indices(tree["l_merkle_root"], 80, 65536, 8)
        mv = tree["main"]["value"].reshape(*tree["main"]["value"].shape[:-2],
                                           80, 2, 3, 8)
        p_of_x = F.canon(F.words_be_to_limbs(mv[..., 0, 0, :]))
        p_of_g1x = F.canon(F.words_be_to_limbs(mv[..., 1, 0, :]))
        d_of_x = F.canon(F.words_be_to_limbs(mv[..., 0, 1, :]))
        b_of_x = F.canon(F.words_be_to_limbs(mv[..., 0, 2, :]))
        g2t = jnp.asarray(tables.g2_powers)
        mask = jnp.uint32(65535)
        x = jnp.take(g2t, positions, axis=0)
        x_to_steps = jnp.take(g2t, (positions << jnp.uint32(13)) & mask, axis=0)
        z = jnp.take(jnp.asarray(tables.z_table), positions, axis=0)
        z2 = jnp.take(jnp.asarray(tables.z2_table), positions, axis=0)
        k_of_x = jnp.take(jnp.asarray(tables.k_table),
                          positions & jnp.uint32(tables.k_period - 1), axis=0)
        p_sq = F.sqr_mod(p_of_x)
        rhs_t = F.mul_sum_mod([(p_sq, p_of_x), (z, d_of_x)], extra=[k_of_x])
        ok_t = jnp.all(p_of_g1x == rhs_t, -1)
        rhs_b = F.mul_sum_mod([(b_of_x, z2), (p_of_x, p_of_x)])
        ok_b = jnp.all(p_of_x == rhs_b, -1)
        p_xs = F.mul_mod_lazy(p_of_x, x_to_steps)
        b_xs = F.mul_mod_lazy(b_of_x, x_to_steps)
        rhs_l = F.mul_sum_mod([(p_of_x, p_xs), (b_of_x, b_xs)],
                              extra=[d_of_x])
        return ok_t & ok_b & jnp.all(p_xs == rhs_l, -1)

    @jax.jit
    def mimc_only(_tree):
        constants = jnp.asarray(mimc_ops.round_constants_mimc(64))
        return mimc_ops.mimc(F.const(3), cfg.num_steps, constants)

    t_full = timeit("full verify", full, tree, iters=iters)
    t_h = timeit("hashes (merkle+prg)", hashes_only, tree, iters=iters)
    t_f = timeit("fri field math", fri_math_only, tree, iters=iters)
    t_s = timeit("spot-check field math", spot_only, tree, iters=iters)
    t_m = timeit("mimc recompute", mimc_only, tree, iters=iters)
    print(f"sum of parts {1e3*(t_h+t_f+t_s+t_m):.2f} ms vs full {1e3*t_full:.2f} ms")
    print(f"proofs/s full: {batch/t_full:.1f}")


if __name__ == "__main__":
    main()
