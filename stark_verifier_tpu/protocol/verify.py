"""The jitted MiMC-STARK verifier: FRI + trace spot checks, batched.

TPU-native re-design of the reference's verify_mimc_proof /
verify_low_degree_proof (reference: /root/reference/src/main.rs:31-197).
Where the reference walks branches and positions one at a time with BigInt,
this builds one fixed-shape jitted graph per proof family:

  * Fiat-Shamir index PRGs: batched device hash chains       (ops/prg.py)
  * all Merkle branch groups: lockstep scan over tree depth  (ops/merkle.py)
  * FRI rows: fused 40-group quartic interp + eval           (ops/quartic.py)
  * 80 constraint spot checks: vectorized field algebra      (ops/field.py)
  * constants minipoly: device iNTT                          (ops/ntt.py)

Every assert of the reference becomes a boolean lane; the proof verdict is
their AND, so a batch returns per-proof verdicts instead of panicking
(SURVEY.md section 2.2.8).  Bit-exactness quirks preserved: raw (unreduced)
column values compared against canonical evaluations, raw special_x/k1..k4
fed to products, stale quartic roots, steps-1 MiMC (SURVEY.md section 2.2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .. import fp
from ..config import StarkConfig, StatementTables
from ..ops import blake2s, field as F, merkle, mimc as mimc_ops, ntt, prg, quartic


def _verify_group(root_words, indices, group, depth):
    ok, _ = merkle.verify_branches(
        root_words, indices, group["value"], group["sibling"],
        group["witness"], depth)
    return jnp.all(ok, axis=-1)


def _fri_pre(l_root_words, fri, tables: StatementTables, cfg: StarkConfig):
    """FRI low-degree check up to (but excluding) the batch inversion, so the
    caller can fold the inversion into one shared Fermat chain.

    Returns (ok_merkle [..., L], interp_pre, col_vals_raw, root2).
    """
    q = cfg.fri_queries
    quartic_rous = jnp.asarray(tables.quartic_rous)        # [4, 16] (stale)

    # Level-PARALLEL walk: nothing is sequential across FRI levels -- each
    # level's seed is its own root2 from the proof and its special_x is the
    # *previous* level's root, which is just a shifted stack.  All 5 levels'
    # Merkle walks, index PRGs, and row interpolations therefore run as one
    # extra vectorized axis, and the batch inversion's Fermat chain (the one
    # long sequential scan) executes once for every level at once.
    root2 = fri["root2"]                                   # [..., L, 8]
    prev = jnp.concatenate([l_root_words[..., None, :], root2[..., :-1, :]],
                           axis=-2)                        # [..., L, 8]
    # special_x = raw previous-root bytes as (unreduced) field elements
    # (main.rs:54; SURVEY 2.2.5)
    special_x = F.words_be_to_limbs(prev)                  # [..., L, 16]

    moduli = jnp.asarray(tables.level_moduli_np)           # [L] = rou_deg/4
    mod_b = moduli[:, None]                                # [L, 1]
    ys = prg.pseudorandom_indices(root2, q, mod_b,
                                  cfg.extension_factor)    # [..., L, q]

    # column branches verify against the proof's own embedded root2
    # (merkle_tree.rs:30-33 trust quirk, SURVEY 2.2.10)
    ok_col, _ = merkle.verify_branches(
        root2, ys, fri["col_value"], fri["col_sibling"], fri["col_witness"],
        fri["col_depth"][..., :, None])
    i4 = jnp.arange(4, dtype=jnp.uint32)
    poly_pos = (ys[..., None] + mod_b[..., None] * i4).reshape(
        *ys.shape[:-1], q * 4)
    ok_poly, _ = merkle.verify_branches(
        prev, poly_pos, fri["poly_value"], fri["poly_sibling"],
        fri["poly_witness"], fri["poly_depth"][..., :, None])

    # x-coords are quartic_rou[j] * rou_level^y with rou_level = G2^(4^l)
    # (stale quartic roots, main.rs:73-80): every node is a known power of G2,
    # so nodes and x1^3 come from the master power table by gather instead of
    # square-and-multiply chains (docs/PERF.md)
    g2t = jnp.asarray(tables.g2_powers)                    # [precision, 16]
    mask = jnp.uint32(cfg.precision - 1)
    lvl_mult = jnp.asarray(
        np.array([4 ** l for l in range(len(tables.level_rous))],
                 dtype=np.uint32))[:, None]                # [L, 1]
    e1 = (ys * lvl_mult) & mask                            # [..., L, q]
    offs = jnp.arange(4, dtype=jnp.uint32) * jnp.uint32(cfg.precision // 4)
    nodes = jnp.take(g2t, (e1[..., None] + offs) & mask, axis=0)  # [...,L,q,4,16]
    x1cb = jnp.take(g2t, (jnp.uint32(3) * e1) & mask, axis=0)     # [...,L,q,16]

    rows = F.words_be_to_limbs(fri["poly_value"])          # [..., L, 4q, 16]
    rows = rows.reshape(*rows.shape[:-2], q, 4, fp.NLIMBS)

    pre = quartic.interp4_nodes_pre(
        nodes, x1cb, jnp.asarray(tables.quartic_wconsts), rows, special_x)
    ok_merkle = jnp.logical_and(jnp.all(ok_col, axis=-1),
                                jnp.all(ok_poly, axis=-1))   # [..., L]
    col_vals_raw = F.words_be_to_limbs(fri["col_value"])
    return ok_merkle, pre, col_vals_raw, root2


def _fri_finish(ok_merkle, pre, col_vals_raw, root2, inv_total,
                cfg: StarkConfig, points_words=None):
    """Complete the FRI check given the inverted group products."""
    # canonical interpolated value compared to the RAW column value
    # (main.rs:84-86): a non-canonical committed value can never equal a
    # canonical lhs, exactly like the reference's unreduced BigInt equality
    lhs = quartic.interp4_nodes_finish(pre, inv_total)     # [..., L, q, 16]
    ok_val = jnp.all(jnp.all(lhs == col_vals_raw, axis=-1), axis=-1)
    ok = jnp.all(jnp.logical_and(ok_merkle, ok_val), axis=-1)

    if cfg.strict and points_words is not None:
        last_root = root2[..., -1, :]
        # strict mode closes the reference's open TODO (main.rs:94): bind the
        # parsed POINTS element to the final committed column root.  (A direct
        # low-degree test of the final layer would reject even the bundled
        # honest proof -- its last column interpolates to full degree 63 over
        # the 64-point domain -- so root binding is the meaningful check.)
        proot = merkle.merkle_root_permuted(points_words)
        ok = jnp.logical_and(ok, jnp.all(proot == last_root, axis=-1))
    return ok


def verify_low_degree_proof(l_root_words, fri, tables: StatementTables,
                            cfg: StarkConfig, points_words=None):
    """Standalone FRI low-degree check (reference: src/main.rs:31-97).

    fri: the stacked level arrays from proofio.device.proof_tree.  All levels
    verify in parallel (see _fri_pre).  Returns [...] bool.  The final direct
    check of the POINTS element is (faithfully) skipped in parity mode --
    main.rs:94 TODO; strict mode binds points to the last root.
    """
    ok_merkle, pre, col_vals_raw, root2 = _fri_pre(l_root_words, fri,
                                                   tables, cfg)
    inv_total = F.batch_inv(pre["total"].reshape(
        *pre["total"].shape[:-3], -1, fp.NLIMBS)).reshape(pre["total"].shape)
    return _fri_finish(ok_merkle, pre, col_vals_raw, root2, inv_total,
                       cfg, points_words)


def verify_mimc_proof(tree, inp: int, output_limbs, tables: StatementTables,
                      cfg: StarkConfig):
    """Full proof check; mirrors verify_mimc_proof (main.rs:99-197).

    tree: proof pytree ([..., ...] leading batch dims); output_limbs [..., 16]
    the claimed MiMC output.  Returns [...] bool verdicts.
    """
    m = cfg.modulus
    checks = []

    # FRI low-degree proof over the linear-combination tree (main.rs:127);
    # its batch inversion is deferred and merged with the spot-check Z(x)
    # denominators into one Fermat chain below
    fri_ok_merkle, fri_pre, fri_col_vals, fri_root2 = _fri_pre(
        tree["l_merkle_root"], tree["fri"], tables, cfg)

    # k1..k4 = Blake2s(merkle_root || i), raw 256-bit BE ints (main.rs:131-146)
    mroot = tree["merkle_root"]
    ks = [F.words_be_to_limbs(blake2s.hash_root_byte(mroot, i))
          for i in (1, 2, 3, 4)]

    # spot-check positions from l_merkle_root (main.rs:148-156)
    positions = prg.pseudorandom_indices(
        tree["l_merkle_root"], cfg.spot_checks, cfg.precision,
        cfg.extension_factor)                                   # [..., 80]
    aug = jnp.stack(
        [positions, (positions + jnp.uint32(cfg.skips)) % jnp.uint32(cfg.precision)],
        axis=-1)
    augmented = aug.reshape(*aug.shape[:-2], cfg.spot_checks * 2)  # interleaved

    main_depth = tree["main"]["witness"].shape[-2]
    lin_depth = tree["lincomb"]["witness"].shape[-2]
    checks.append(_verify_group(mroot, augmented, tree["main"], main_depth))
    checks.append(_verify_group(tree["l_merkle_root"], positions,
                                tree["lincomb"], lin_depth))

    # trace values: 96-byte leaves = P(x) || D(x) || B(x)  (main.rs:163-174)
    mv = tree["main"]["value"]                                  # [..., 160, 24]
    mv = mv.reshape(*mv.shape[:-2], cfg.spot_checks, 2, 3, 8)
    p_of_x = F.canon(F.words_be_to_limbs(mv[..., 0, 0, :]))     # [..., 80, 16]
    p_of_g1x = F.canon(F.words_be_to_limbs(mv[..., 1, 0, :]))
    d_of_x = F.canon(F.words_be_to_limbs(mv[..., 0, 1, :]))
    b_of_x = F.canon(F.words_be_to_limbs(mv[..., 0, 2, :]))
    l_of_x = F.canon(F.words_be_to_limbs(tree["lincomb"]["value"]))

    # x = G2^pos and x^steps = G2^(steps*pos mod precision): gathers from the
    # master power table replace square-and-multiply (main.rs:164-166)
    g2t = jnp.asarray(tables.g2_powers)
    mask = jnp.uint32(cfg.precision - 1)
    x = jnp.take(g2t, positions, axis=0)                   # [..., 80, 16]
    x_to_steps = jnp.take(
        g2t, (positions << jnp.uint32(cfg.log_steps)) & mask, axis=0)

    # Z(x) = (x^steps - 1) / (x - last_step_position)  (main.rs:175-176);
    # ONE merged batch inversion covers the FRI group products and these
    # denominators (a single Fermat chain for the whole proof)
    last = F.const(tables.last_step_position)
    denom = F.sub_mod(x, last)
    tot = fri_pre["total"]                                 # [..., L, q, 16]
    lq = tot.shape[-3] * tot.shape[-2]
    lead = tot.shape[:-3]
    dens = jnp.concatenate(
        [tot.reshape(lead + (lq, fp.NLIMBS)), denom], axis=-2)
    inv_all = F.batch_inv(dens)
    inv_total = inv_all[..., :lq, :].reshape(tot.shape)
    denom_inv = inv_all[..., lq:, :]
    checks.append(_fri_finish(fri_ok_merkle, fri_pre, fri_col_vals,
                              fri_root2, inv_total, cfg, tree.get("points")))
    one = F.const(1)
    z = F.mul_mod(F.sub_mod(x_to_steps, jnp.broadcast_to(one, x_to_steps.shape)),
                  denom_inv)

    # K(x) = minipoly(x^skips2) takes only precision/gcd(precision, skips2)
    # distinct values -- table lookup by pos mod period (main.rs:177-178)
    k_of_x = jnp.take(jnp.asarray(tables.k_table),
                      positions & jnp.uint32(tables.k_period - 1), axis=0)

    # transition: P(g1*x) - P(x)^3 - K(x) - Z(x)*D(x) == 0  (main.rs:179-182)
    p_cubed = F.mul_mod(F.mul_mod_lazy(p_of_x, p_of_x), p_of_x)
    t = F.sub_mod(F.sub_mod(F.sub_mod(p_of_g1x, p_cubed), k_of_x),
                  F.mul_mod(z, d_of_x))
    checks.append(jnp.all(jnp.all(t == 0, axis=-1), axis=-1))

    # boundary: P(x) - B(x)*Z2(x) - I(x) == 0  (main.rs:183-187)
    # I(x) interpolates (1, inp), (last, output); host-constant scaffolding,
    # device part only where the output enters (utils.rs:246-274)
    e0 = (1 - tables.last_step_position) % m
    e1 = (tables.last_step_position - 1) % m
    inv_e = pow(e0 * e1 % m, m - 2, m)
    iy0 = inp % m * inv_e % m * e1 % m                 # host scalar
    iy1_mult = F.const(inv_e * e0 % m)
    iy1 = F.mul_mod(output_limbs, iy1_mult)            # [..., 16] device
    i_c0 = F.add_mod(F.const((-tables.last_step_position * iy0) % m),
                     F.mul_mod(F.const(m - 1), iy1))   # -last*iy0 - iy1
    i_c1 = F.add_mod(F.const(iy0), iy1)
    interp_at_x = F.add_mod(i_c0[..., None, :],
                            F.mul_mod(i_c1[..., None, :], x))
    # Z2(x) = (x-1)(x-last) -- reuses the Z denominator (main.rs:185)
    z2_at_x = F.mul_mod_lazy(F.sub_mod(x, jnp.broadcast_to(one, x.shape)),
                             denom)
    bcheck = F.sub_mod(F.sub_mod(p_of_x, F.mul_mod(b_of_x, z2_at_x)),
                       interp_at_x)
    checks.append(jnp.all(jnp.all(bcheck == 0, axis=-1), axis=-1))

    # lincomb: L(x) = D + k1*P + k2*P*x^steps + k3*B + k4*B*x^steps
    # with raw unreduced k's (main.rs:188-192; SURVEY 2.2.3)
    p_xs = F.mul_mod_lazy(p_of_x, x_to_steps)
    b_xs = F.mul_mod_lazy(b_of_x, x_to_steps)
    lc = F.sub_mod(l_of_x, d_of_x)
    lc = F.sub_mod(lc, F.mul_mod(ks[0][..., None, :], p_of_x))
    lc = F.sub_mod(lc, F.mul_mod(ks[1][..., None, :], p_xs))
    lc = F.sub_mod(lc, F.mul_mod(ks[2][..., None, :], b_of_x))
    lc = F.sub_mod(lc, F.mul_mod(ks[3][..., None, :], b_xs))
    checks.append(jnp.all(jnp.all(lc == 0, axis=-1), axis=-1))

    ok = checks[0]
    for c in checks[1:]:
        ok = jnp.logical_and(ok, c)
    return ok


def make_verifier(cfg: StarkConfig | None = None, inp: int = 3):
    """Build the jitted end-to-end verifier for a statement family.

    Returns (verify_fn, tables) where verify_fn(tree) -> bool[...] checks
    proofs against the statement's precomputed MiMC output (the claimed
    output is a statement-level constant, computed once on host -- the
    reference also computes it outside the verification path, main.rs:205-218;
    ops.mimc.mimc is the device scan for trace generation).  Works for single
    proofs (no batch axis) and stacked batches.
    """
    from ..config import cached_tables
    cfg = cfg or StarkConfig()
    tables = cached_tables(cfg)
    if not cfg.sanity_ok():
        raise ValueError("statement fails reference sanity checks")
    out_limbs = fp.int_to_limbs(mimc_ops.mimc_host(inp, cfg.num_steps))

    @jax.jit
    def verify_fn(tree):
        lead = tree["merkle_root"].shape[:-1]
        output = jnp.broadcast_to(jnp.asarray(out_limbs), lead + (fp.NLIMBS,))
        return verify_mimc_proof(tree, inp, output, tables, cfg)

    return verify_fn, tables
