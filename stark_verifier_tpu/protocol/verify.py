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

from .. import debug, fp
from ..config import StarkConfig, StatementTables
from ..ops import blake2s, field as F, merkle, mimc as mimc_ops, ntt, prg, quartic


def _verify_group(root_words, indices, group):
    ok, _ = merkle.verify_branches(
        root_words, indices, group["value"], group["sibling"],
        group["witness"], group["depth"])
    return jnp.all(ok, axis=-1)


def _as_shared_group(root_words, indices, group, witness=None, depth=None):
    return {"root": root_words, "indices": indices, "value": group["value"],
            "sibling": group["sibling"],
            "witness": group["witness"] if witness is None else witness,
            "depth": group["depth"] if depth is None else depth}


def _fri_checks(l_root_words, fri, tables: StatementTables, cfg: StarkConfig,
                shared_merkle: bool = True, ys=None):
    """Complete FRI low-degree check, inversion-free.

    Returns (ok [...] bool over all levels, root2 [..., L, 8]).  ys may be
    the precomputed [..., L, q] column indices (verify_mimc_proof derives
    them from a FUSED Fiat-Shamir chain shared with the spot-check PRG);
    None computes them here (standalone FRI use).
    """
    q = cfg.fri_queries

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
    if ys is None:
        ys = prg.pseudorandom_indices(root2, q, mod_b,
                                      cfg.extension_factor)  # [..., L, q]
    debug.check_bounds(ys, cfg.precision // 4 + 1, "fri column indices")

    # column branches verify against the proof's own embedded root2
    # (merkle_tree.rs:30-33 trust quirk, SURVEY 2.2.10); each level's walk
    # runs as its own scan of EXACTLY its witness depth (witnesses are
    # per-level lists -- padding all levels to the deepest wasted ~20% of
    # the verifier's Blake2s compressions, docs/PERF.md)
    i4 = jnp.arange(4, dtype=jnp.uint32)
    poly_pos = (ys[..., None] + mod_b[..., None] * i4).reshape(
        *ys.shape[:-1], q * 4)
    nlv = len(fri["col_witness"])
    if shared_merkle:
        # shared-path walks: the converging upper-tree levels of all 2L
        # groups dedup to one compression per distinct node, stacked into
        # one Blake2s call per tree level (ops/merkle.py)
        groups = []
        for l in range(nlv):
            groups.append({
                "root": root2[..., l, :], "indices": ys[..., l, :],
                "value": fri["col_value"][..., l, :, :],
                "sibling": fri["col_sibling"][..., l, :, :],
                "witness": fri["col_witness"][l],
                "depth": fri["col_depth"][..., l, :]})
            groups.append({
                "root": prev[..., l, :], "indices": poly_pos[..., l, :],
                "value": fri["poly_value"][..., l, :, :],
                "sibling": fri["poly_sibling"][..., l, :, :],
                "witness": fri["poly_witness"][l],
                "depth": fri["poly_depth"][..., l, :],
                # the 4 row branches of a query are sibling quads (permuted
                # indices 4y+i); ops/merkle.py walks their shared subtree once
                "quad": True})
        oks = merkle.verify_groups_shared(groups)
        ok_merkle = jnp.stack(
            [jnp.logical_and(oks[2 * l], oks[2 * l + 1]) for l in range(nlv)],
            axis=-1)                                   # [..., L]
    else:
        ok_col_l, ok_poly_l = [], []
        for l in range(nlv):
            okc, _ = merkle.verify_branches(
                root2[..., l, :], ys[..., l, :], fri["col_value"][..., l, :, :],
                fri["col_sibling"][..., l, :, :], fri["col_witness"][l],
                fri["col_depth"][..., l, :])
            okp, _ = merkle.verify_branches(
                prev[..., l, :], poly_pos[..., l, :],
                fri["poly_value"][..., l, :, :],
                fri["poly_sibling"][..., l, :, :], fri["poly_witness"][l],
                fri["poly_depth"][..., l, :])
            ok_col_l.append(jnp.all(okc, axis=-1))
            ok_poly_l.append(jnp.all(okp, axis=-1))
        ok_merkle = jnp.logical_and(jnp.stack(ok_col_l, axis=-1),
                                    jnp.stack(ok_poly_l, axis=-1))  # [..., L]

    # row x-coords are quartic_rou[j] * x1 with x1 = rou_level^y,
    # rou_level = G2^(4^l) (stale quartic roots, main.rs:73-80): x1 is a known
    # power of G2, so the even/odd-split row evaluation's only denominators
    # x1^-1 / x1^-2 come from the master power table by gather -- no
    # square-and-multiply, no inversion, and no nodes gather at all
    # (ops/quartic.eval4_even_odd; docs/PERF.md)
    g2t = jnp.asarray(tables.g2_powers)                    # [precision, 16]
    mask = jnp.uint32(cfg.precision - 1)
    lvl_mult = jnp.asarray(
        np.array([4 ** l for l in range(len(tables.level_rous))],
                 dtype=np.uint32))[:, None]                # [L, 1]
    e1 = (ys * lvl_mult) & mask                            # [..., L, q]
    x1_inv = jnp.take(g2t, (jnp.uint32(0) - e1) & mask, axis=0)
    x1sq_inv = jnp.take(g2t, (jnp.uint32(0) - jnp.uint32(2) * e1) & mask,
                        axis=0)                            # [..., L, q, 16]

    # canonical interpolated value compared to the RAW column value
    # (main.rs:84-86): a non-canonical committed value can never equal a
    # canonical lhs, exactly like the reference's unreduced BigInt equality
    if F.pallas_enabled():
        # fused whole-chain kernel: all 7 multiplies of the even/odd-split
        # evaluation stay in VMEM, and the kernel speaks the wire's 8-word
        # BE encoding on both ends (ops/fri_pallas.py) -- the value equality
        # runs directly on the proof's word arrays (bijective encoding)
        from ..ops import fri_pallas
        rows_w = fri["poly_value"].reshape(
            *fri["poly_value"].shape[:-2], q, 4, 8)        # [..., L, q, 4, 8]
        lhs_w = fri_pallas.eval4_rows(
            x1_inv, x1sq_inv, rows_w, special_x,
            np.asarray(tables.quartic_ginv), np.asarray(tables.inv4))
        ok_val = jnp.all(jnp.all(lhs_w == fri["col_value"], axis=-1), axis=-1)
    else:
        rows = F.words_be_to_limbs(fri["poly_value"])      # [..., L, 4q, 16]
        rows = rows.reshape(*rows.shape[:-2], q, 4, fp.NLIMBS)
        lhs = quartic.eval4_even_odd(
            x1_inv, x1sq_inv, rows, special_x,
            jnp.asarray(tables.quartic_ginv), jnp.asarray(tables.inv4))
        col_vals_raw = F.words_be_to_limbs(fri["col_value"])
        ok_val = jnp.all(jnp.all(lhs == col_vals_raw, axis=-1), axis=-1)
    ok = jnp.all(jnp.logical_and(ok_merkle, ok_val), axis=-1)
    return ok, root2


def points_root_binding(points_words, last_root):
    """Bind the parsed POINTS element to the final committed column root
    (half of the reference's open TODO at main.rs:94)."""
    proot = merkle.merkle_root_permuted(points_words)
    return jnp.all(proot == last_root, axis=-1)


def points_direct_check(points_words, tables: StatementTables,
                        cfg: StarkConfig):
    """Direct low-degree test of the final FRI layer -- the other half of the
    reference's TODO (main.rs:94; POINTS parsed then discarded,
    deserializer.rs:47-59).

    Replicates upstream mimc_stark's verify_low_degree_proof tail check:
    interpolate the degree-(D-1) polynomial through the values at the first
    D = max_deg_plus_1 domain positions NOT divisible by extension_factor,
    then require every remaining such position to evaluate consistently.
    The interpolation nodes are host constants, so the whole check is one
    [held_out, D] evaluation-matrix product (see StatementTables).

    points_words: [..., final_domain, 8] word rows.  Returns [...] bool.
    """
    deg = cfg.fri_final_maxdeg_plus_1
    # deg = (2*num_steps) >> 2*fri_levels is 8 or 16 for every power-of-two
    # num_steps (folding by 4 stops at <= 16), so all D products of the
    # evaluation-matrix row always sum through ONE fold (field.mul_sum_mod;
    # D = 16 is exactly its exactness bound).  StarkConfig can never derive
    # deg > 16, so this guards only hand-built config stubs.
    if deg > 16:
        raise ValueError(f"unconstructible config: final FRI degree {deg}")
    pts = tables.points_pts
    data = F.words_be_to_limbs(points_words)               # [..., nd, 16]
    used = jnp.take(data, jnp.asarray(pts[:deg]), axis=-2)  # [..., D, 16]
    held = jnp.take(data, jnp.asarray(pts[deg:]), axis=-2)  # [..., H, 16]
    m = jnp.asarray(tables.points_eval_matrix)             # [H, D, 16]
    pred = F.mul_sum_mod(
        [(m[..., i, :], used[..., None, i, :]) for i in range(deg)])
    # canonical evaluation vs the RAW held-out value, like every other
    # committed-value comparison (a non-canonical byte encoding never equals
    # the canonical evaluation)
    return jnp.all(jnp.all(pred == held, axis=-1), axis=-1)


def verify_low_degree_proof(l_root_words, fri, tables: StatementTables,
                            cfg: StarkConfig, points_words=None,
                            shared_merkle: bool = True, ys=None):
    """Standalone FRI low-degree check (reference: src/main.rs:31-97).

    fri: the stacked level arrays from proofio.device.proof_tree.  All levels
    verify in parallel (see _fri_checks).  Returns [...] bool.  The final
    direct check of the POINTS element is (faithfully) skipped in parity
    mode -- main.rs:94 TODO; strict mode closes the TODO completely: it binds
    POINTS to the last committed root AND runs the real low-degree test.
    """
    ok, root2 = _fri_checks(l_root_words, fri, tables, cfg, shared_merkle,
                            ys=ys)
    if cfg.strict and points_words is not None:
        ok = jnp.logical_and(
            ok, points_root_binding(points_words, root2[..., -1, :]))
        ok = jnp.logical_and(ok, points_direct_check(points_words, tables, cfg))
    return ok


def verify_mimc_proof(tree, inp, output_limbs, tables: StatementTables,
                      cfg: StarkConfig, constants_limbs=None,
                      shared_merkle: bool = True):
    """Full proof check; mirrors verify_mimc_proof (main.rs:99-197 and the
    cdylib boundary lib.rs:99).

    tree: proof pytree ([..., ...] leading batch dims); output_limbs [..., 16]
    the claimed MiMC output.  inp: a host int (fast path: the boundary
    interpolant folds to host constants) or [..., 16] device limbs.
    constants_limbs: optional [k, 16] RUNTIME round constants -- when given,
    the constants mini-polynomial is recovered with a device iNTT
    (main.rs:125) and K(x) evaluated by Horner scan, instead of the
    statement-static K table.  The modulus stays compile-time (the limb
    reduction is specialized to p).  Returns [...] bool verdicts.
    """
    m = cfg.modulus
    checks = []

    # FUSED Fiat-Shamir chains: the per-level FRI column PRGs (seeded by
    # root2, main.rs:56) and the spot-check PRG (seeded by l_merkle_root,
    # main.rs:149) are independent chains of skinny latency-bound hashes;
    # stacking them on one lane axis steps them together -- max(nf, ns)-1
    # sequential links instead of (nf-1) + (ns-1) dispatches, bit-identical
    # per lane (the links never mix lanes)
    nf = -(-cfg.fri_queries // 8)
    ns = -(-cfg.spot_checks // 8)
    seeds = jnp.concatenate(
        [tree["fri"]["root2"], tree["l_merkle_root"][..., None, :]],
        axis=-2)                                           # [..., L+1, 8]
    entries = prg.chain_entries(seeds, max(nf, ns))        # [..., L+1, n, 8]
    moduli = jnp.asarray(tables.level_moduli_np)           # [L] = rou_deg/4
    ys = prg.indices_from_entries(
        entries[..., :-1, :nf, :], cfg.fri_queries, moduli[:, None],
        cfg.extension_factor)                              # [..., L, q]

    # FRI low-degree proof over the linear-combination tree (main.rs:127)
    checks.append(verify_low_degree_proof(
        tree["l_merkle_root"], tree["fri"], tables, cfg, tree.get("points"),
        shared_merkle, ys=ys))

    # k1..k4 = Blake2s(merkle_root || i), raw 256-bit BE ints
    # (main.rs:131-146) -- the four 33-byte hashes batch into ONE call
    mroot = tree["merkle_root"]
    kbytes = jnp.arange(1, 5, dtype=jnp.uint32)            # [4]
    kin = jnp.concatenate(
        [jnp.broadcast_to(mroot[..., None, :], mroot.shape[:-1] + (4, 8)),
         jnp.broadcast_to(kbytes[:, None], mroot.shape[:-1] + (4, 1))],
        axis=-1)                                           # [..., 4, 9]
    kh = blake2s.hash_words(kin, 33)                       # [..., 4, 8]
    ks = [F.words_be_to_limbs(kh[..., i, :]) for i in range(4)]

    # spot-check positions from l_merkle_root (main.rs:148-156)
    positions = prg.indices_from_entries(
        entries[..., -1, :ns, :], cfg.spot_checks, cfg.precision,
        cfg.extension_factor)                                   # [..., 80]
    debug.check_bounds(positions, cfg.precision, "spot-check positions")
    aug = jnp.stack(
        [positions, (positions + jnp.uint32(cfg.skips)) % jnp.uint32(cfg.precision)],
        axis=-1)
    augmented = aug.reshape(*aug.shape[:-2], cfg.spot_checks * 2)  # interleaved

    if shared_merkle:
        oks = merkle.verify_groups_shared([
            _as_shared_group(mroot, augmented, tree["main"]),
            _as_shared_group(tree["l_merkle_root"], positions,
                             tree["lincomb"])])
        checks.extend(oks)
    else:
        checks.append(_verify_group(mroot, augmented, tree["main"]))
        checks.append(_verify_group(tree["l_merkle_root"], positions,
                                    tree["lincomb"]))

    # trace values: 96-byte leaves = P(x) || D(x) || B(x)  (main.rs:163-174)
    mv = tree["main"]["value"]                                  # [..., 160, 24]
    mv = mv.reshape(*mv.shape[:-2], cfg.spot_checks, 2, 3, 8)
    p_raw = F.words_be_to_limbs(mv[..., 0, 0, :])               # [..., 80, 16]
    pg1_raw = F.words_be_to_limbs(mv[..., 1, 0, :])
    d_raw = F.words_be_to_limbs(mv[..., 0, 1, :])
    b_raw = F.words_be_to_limbs(mv[..., 0, 2, :])
    l_raw = F.words_be_to_limbs(tree["lincomb"]["value"])

    # x = G2^pos and x^steps = G2^(steps*pos mod precision): gathers from the
    # master power table replace square-and-multiply (main.rs:164-166)
    g2t = jnp.asarray(tables.g2_powers)
    mask = jnp.uint32(cfg.precision - 1)
    x = jnp.take(g2t, positions, axis=0)                   # [..., 80, 16]
    x_to_steps = jnp.take(
        g2t, (positions << jnp.uint32(cfg.log_steps)) & mask, axis=0)

    # Z(x) = (x^steps - 1) / (x - last_step_position)  (main.rs:175-176):
    # Z takes one value per domain position, so the division is a host-
    # precomputed table gather -- no inversion anywhere in the graph
    z = jnp.take(jnp.asarray(tables.z_table), positions, axis=0)

    # K(x) = minipoly(x^skips2) takes only precision/gcd(precision, skips2)
    # distinct values -- table lookup by pos mod period (main.rs:177-178);
    # with runtime constants the minipoly comes from a device iNTT instead
    if constants_limbs is None:
        k_of_x = jnp.take(jnp.asarray(tables.k_table),
                          positions & jnp.uint32(tables.k_period - 1), axis=0)
    else:
        minipoly = ntt.intt(constants_limbs, tables.minipoly_root)  # [k, 16]
        x_sk2 = jnp.take(
            g2t, (positions * jnp.uint32(cfg.skips2)) & mask, axis=0)
        k_of_x = F.eval_poly(minipoly, x_sk2)

    # boundary interpolant I(x) coefficients (main.rs:183-187): I(x)
    # interpolates (1, inp), (last, output); host-constant scaffolding,
    # device part only where the output enters (utils.rs:246-274)
    e0 = (1 - tables.last_step_position) % m
    e1 = (tables.last_step_position - 1) % m
    inv_e = pow(e0 * e1 % m, m - 2, m)
    iy1_mult = F.const(inv_e * e0 % m)
    iy1 = F.mul_mod(output_limbs, iy1_mult)            # [..., 16] device
    if isinstance(inp, int):
        # statement-static input: iy0 and its -last*iy0 term fold to host
        iy0 = inp % m * inv_e % m * e1 % m             # host scalar
        i_c0 = F.add_mod(F.const((-tables.last_step_position * iy0) % m),
                         F.mul_mod(F.const(m - 1), iy1))   # -last*iy0 - iy1
        i_c1 = F.add_mod(F.const(iy0), iy1)
    else:
        # runtime input (cdylib boundary, lib.rs:99): same algebra on device
        iy0 = F.mul_mod(inp, F.const(inv_e * e1 % m))  # [..., 16]
        i_c0 = F.add_mod(
            F.mul_mod(iy0, F.const((-tables.last_step_position) % m)),
            F.mul_mod(F.const(m - 1), iy1))
        i_c1 = F.add_mod(iy0, iy1)
    # Z2(x) = (x-1)(x-last) -- position-indexed host table (main.rs:185)
    z2_at_x = jnp.take(jnp.asarray(tables.z2_table), positions, axis=0)

    # the three constraint families (main.rs:179-192), each a single-fold
    # multi-term accumulation compared limb-exact against the canonicalized
    # committed value:
    #   transition  P(g1 x) == P^(power) + Z*D + K   (power = 3: the
    #               reference MiMC AIR; power = 2: models/square.py)
    #   boundary    P(x)    == B*Z2 + I1*x + I0
    #   lincomb     L(x)    == k1*P + k2*P*x^s + k3*B + k4*B*x^s + D
    # (raw unreduced k's -- main.rs:188-192; SURVEY 2.2.3)
    if F.pallas_enabled():
        # fused whole-chain kernel: all ~11 multiplies stay in VMEM
        # (ops/spot_pallas.py)
        from ..ops import spot_pallas
        raw5 = jnp.stack([p_raw, pg1_raw, d_raw, b_raw, l_raw], axis=-2)
        tab5 = jnp.stack([x, x_to_steps, z, z2_at_x, k_of_x], axis=-2)
        ks4 = jnp.stack(ks, axis=-2)                   # [..., 4, 16]
        oks = spot_pallas.spot_checks(
            raw5, tab5, ks4[..., None, :, :], i_c1[..., None, :],
            i_c0[..., None, :], power=cfg.power)       # [..., 80, 3]
        checks.append(jnp.all(jnp.all(oks, axis=-1), axis=-1))
    else:
        p_of_x = F.canon(p_raw)
        p_of_g1x = F.canon(pg1_raw)
        d_of_x = F.canon(d_raw)
        b_of_x = F.canon(b_raw)
        l_of_x = F.canon(l_raw)

        if cfg.power == 3:
            p_pow = [(F.sqr_mod(p_of_x), p_of_x)]
        elif cfg.power == 2:
            p_pow = [(p_of_x, p_of_x)]
        else:
            raise ValueError(f"unsupported transition power {cfg.power}")
        rhs_t = F.mul_sum_mod(p_pow + [(z, d_of_x)], extra=[k_of_x])
        t_ok = jnp.all(p_of_g1x == rhs_t, axis=-1)
        checks.append(jnp.all(t_ok, axis=-1))

        rhs_b = F.mul_sum_mod(
            [(b_of_x, z2_at_x), (i_c1[..., None, :], x)],
            extra=[jnp.broadcast_to(i_c0[..., None, :], x.shape)])
        b_ok = jnp.all(p_of_x == rhs_b, axis=-1)
        checks.append(jnp.all(b_ok, axis=-1))

        p_xs = F.mul_mod_lazy(p_of_x, x_to_steps)
        b_xs = F.mul_mod_lazy(b_of_x, x_to_steps)
        rhs_l = F.mul_sum_mod(
            [(ks[0][..., None, :], p_of_x),
             (ks[1][..., None, :], p_xs),
             (ks[2][..., None, :], b_of_x),
             (ks[3][..., None, :], b_xs)],
            extra=[d_of_x])
        lc_ok = jnp.all(l_of_x == rhs_l, axis=-1)
        checks.append(jnp.all(lc_ok, axis=-1))

    ok = checks[0]
    for c in checks[1:]:
        ok = jnp.logical_and(ok, c)
    return ok


def make_verifier(cfg: StarkConfig | None = None, inp: int = 3,
                  shared_merkle: bool = True):
    """Build the jitted end-to-end verifier for a statement family.

    Returns (verify_fn, tables) where verify_fn(tree) -> bool[...] checks
    proofs against the statement's precomputed MiMC output (the claimed
    output is a statement-level constant, computed once on host -- the
    reference also computes it outside the verification path, main.rs:205-218;
    ops.mimc.mimc is the device scan for trace generation).  Works for single
    proofs (no batch axis) and stacked batches.

    MEMOIZED on (cfg, inp, shared_merkle): jax.jit caches per function
    object, so a fresh closure per call would recompile the whole verifier
    graph (~4 min on TPU through the axon remote-compile tunnel) -- repeated
    library/stream calls must reuse one compiled fn.  (Debug-mode wrapping
    reads STARK_DEBUG at first-build time, like every other trace-time flag.)
    """
    return _make_verifier_cached(cfg or StarkConfig(), inp, shared_merkle)


@functools.lru_cache(maxsize=16)
def _make_verifier_cached(cfg: StarkConfig, inp: int, shared_merkle: bool):
    from ..config import cached_tables
    tables = cached_tables(cfg)
    if not cfg.sanity_ok():
        raise ValueError("statement fails reference sanity checks")
    out_limbs = fp.int_to_limbs(mimc_ops.mimc_host(
        inp, cfg.num_steps,
        constants=[(i ** 7) ^ 42 for i in range(cfg.num_constants)],
        power=cfg.power))

    @jax.jit
    def verify_fn(tree):
        lead = tree["merkle_root"].shape[:-1]
        output = jnp.broadcast_to(jnp.asarray(out_limbs), lead + (fp.NLIMBS,))
        return verify_mimc_proof(tree, inp, output, tables, cfg,
                                 shared_merkle=shared_merkle)

    return debug.checked(verify_fn), tables


def make_chunked_verifier(cfg: StarkConfig | None = None, inp: int = 3,
                          chunk: int = 1024, shared_merkle: bool = True):
    """Batched verifier that processes the batch in fixed-size chunks INSIDE
    one compiled graph (lax.map over [batch/chunk, chunk, ...]).

    Throughput peaks near batch 1024 and regresses beyond it (the
    level-parallel FRI holds every level's intermediates live, so bigger
    batches pressure VMEM/HBM working sets -- docs/PERF.md); chunking keeps
    arbitrarily large batches at the peak rate with a single dispatch.
    Batch must be a multiple of `chunk` (pad with any proof and ignore the
    verdicts, as verify_stream does).  Memoized like make_verifier.
    """
    return _make_chunked_cached(cfg or StarkConfig(), inp, chunk,
                                shared_merkle)


@functools.lru_cache(maxsize=16)
def _make_chunked_cached(cfg: StarkConfig, inp: int, chunk: int,
                         shared_merkle: bool):
    from ..config import cached_tables
    tables = cached_tables(cfg)
    if not cfg.sanity_ok():
        raise ValueError("statement fails reference sanity checks")
    out_limbs = fp.int_to_limbs(mimc_ops.mimc_host(
        inp, cfg.num_steps,
        constants=[(i ** 7) ^ 42 for i in range(cfg.num_constants)],
        power=cfg.power))

    @jax.jit
    def verify_fn(tree):
        batch = tree["merkle_root"].shape[0]
        if batch % chunk:
            raise ValueError(
                f"batch {batch} must be a multiple of chunk {chunk}")
        k = batch // chunk
        ctree = jax.tree.map(
            lambda x: x.reshape((k, chunk) + x.shape[1:]), tree)

        def body(t):
            output = jnp.broadcast_to(jnp.asarray(out_limbs),
                                      (chunk, fp.NLIMBS))
            return verify_mimc_proof(t, inp, output, tables, cfg,
                                     shared_merkle=shared_merkle)

        return lax.map(body, ctree).reshape(batch)

    return debug.checked(verify_fn), tables


def make_general_verifier(cfg: StarkConfig | None = None,
                          shared_merkle: bool = True):
    """The cdylib-shaped entry point (reference: src/lib.rs:99): every
    statement parameter except the modulus is a RUNTIME value.

    Returns (verify_fn, tables) where
        verify_fn(tree, inp_limbs, constants_limbs, output_limbs) -> bool[...]
    with inp_limbs/output_limbs [..., 16] device values (broadcast over the
    proof batch if unbatched) and constants_limbs [k, 16] runtime round
    constants (k must match cfg.num_constants; it shapes the device iNTT).
    The modulus stays compile-time: the limb arithmetic is specialized to
    p = 2^256 - 351*2^32 + 1.  Memoized like make_verifier.
    """
    return _make_general_cached(cfg or StarkConfig(), shared_merkle)


@functools.lru_cache(maxsize=16)
def _make_general_cached(cfg: StarkConfig, shared_merkle: bool):
    from ..config import cached_tables
    tables = cached_tables(cfg)
    if not cfg.sanity_ok():
        raise ValueError("statement fails reference sanity checks")

    @jax.jit
    def verify_fn(tree, inp_limbs, constants_limbs, output_limbs):
        lead = tree["merkle_root"].shape[:-1]
        inp_b = jnp.broadcast_to(inp_limbs, lead + (fp.NLIMBS,))
        out_b = jnp.broadcast_to(output_limbs, lead + (fp.NLIMBS,))
        return verify_mimc_proof(tree, inp_b, out_b, tables, cfg,
                                 constants_limbs=constants_limbs,
                                 shared_merkle=shared_merkle)

    return debug.checked(verify_fn), tables
