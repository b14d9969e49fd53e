"""Typed configuration for a STARK statement family.

The reference hardcodes every parameter (reference: /root/reference/src/
main.rs:28-29,113-123,205: modulus, extension factor 8, 2^13 steps, 64 round
constants, 80 spot checks, 40 FRI queries, plus literal guards pinning G2 and
the quartic root).  Here the same quantities live in one dataclass whose
defaults reproduce the reference exactly; derived device tables (power-of-two
tables for data-dependent exponents, FRI level roots, zeropoly) are
precomputed host-side once per statement family and reused across batches.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field as dfield

import numpy as np

from . import fp


@dataclass(frozen=True)
class StarkConfig:
    modulus: int = fp.MODULUS
    extension_factor: int = fp.EXTENSION_FACTOR
    log_steps: int = 13
    num_constants: int = 64
    spot_checks: int = 80          # reference: src/main.rs:148
    fri_queries: int = 40          # reference: src/main.rs:56
    strict: bool = False           # False = bit-exact parity with the
                                   # reference's soundness gaps (SURVEY 2.2.10)
    power: int = 3                 # transition x <- x^power + k_i: 3 is the
                                   # reference's MiMC family (utils.rs:12);
                                   # 2 is the square family (models/square.py)
                                   # -- the AIR parameter models/ dispatches on

    @property
    def num_steps(self) -> int:
        return 1 << self.log_steps

    @property
    def precision(self) -> int:
        return self.num_steps * self.extension_factor

    @property
    def skips(self) -> int:
        return self.precision // self.num_steps

    @property
    def skips2(self) -> int:
        return self.num_steps // self.num_constants

    @property
    def fri_levels(self) -> int:
        # the prover folds by 4 until degree <= 16: log4(num_steps*2/16)
        n, lv = self.num_steps * 2, 0
        while n > 16:
            n //= 4
            lv += 1
        return lv

    @property
    def fri_final_maxdeg_plus_1(self) -> int:
        """max_deg_plus_1 after all FRI folds (the reference threads this but
        never checks it -- src/main.rs:31,89; the strict-mode direct check
        makes it load-bearing)."""
        return (self.num_steps * 2) >> (2 * self.fri_levels)

    @property
    def fri_final_domain(self) -> int:
        """Evaluation-domain size of the final (POINTS) layer."""
        return self.precision >> (2 * self.fri_levels)

    def sanity_ok(self, num_constants: int | None = None) -> bool:
        """The reference's input prechecks (src/main.rs:101-111) -- the only
        failures that return false rather than panic."""
        nc = self.num_constants if num_constants is None else num_constants
        def pow2(x):
            return x != 0 and (x & (x - 1)) == 0
        return (self.num_steps <= 2**32 // self.extension_factor
                and pow2(self.num_steps) and pow2(nc)
                and nc <= self.num_steps
                and self.power in (2, 3))


class StatementTables:
    """Host-precomputed constants for one statement family (shared by every
    proof in a batch; all pure functions of StarkConfig)."""

    def __init__(self, cfg: StarkConfig):
        self.cfg = cfg
        m = cfg.modulus
        self.G2 = pow(7, (m - 1) // cfg.precision, m)   # main.rs:114
        # per-FRI-level root of unity (G2^(4^level)) and PRG modulus
        # rou_deg/4 (main.rs:56,73-80,88); all exponent arithmetic rides the
        # master g2_powers gather table below
        self.level_rous = []
        self.level_moduli = []     # rou_deg/4 per level (PRG domain + offset)
        rou = self.G2
        rd = cfg.precision
        for _ in range(cfg.fri_levels):
            self.level_rous.append(rou)
            self.level_moduli.append(rd // 4)
            rou = pow(rou, 4, m)
            rd //= 4
        self.level_moduli_np = np.array(self.level_moduli, dtype=np.uint32)
        # even/odd-split FRI row evaluation constants (the production row
        # path, ops/quartic.eval4_even_odd + ops/fri_pallas): the row nodes
        # are x1 * q_i with quartic roots q_i computed ONCE from the
        # top-level domain and (faithfully to the reference) stale for later
        # levels (main.rs:43-48; SURVEY 2.2.5); g^{-1} = g^3 since g^4 = 1,
        # plus 4^{-1} mod p.  (The barycentric-weight formulation is
        # test-side only since round 5: tests/oracle.quartic_weight_consts.)
        self.quartic_ginv = fp.int_to_limbs(
            pow(self.G2, cfg.precision * 3 // 4, m))
        self.inv4 = fp.int_to_limbs(pow(4, m - 2, m))
        self.last_step_position = pow(self.G2, (cfg.num_steps - 1) * cfg.skips, m)
        # constants mini-polynomial domain root: G2^(ext*skips2) (main.rs:124)
        self.minipoly_root = pow(self.G2, cfg.extension_factor * cfg.skips2, m)

        # ------- gather tables (see docs/PERF.md: pow chains -> one gather) --
        # master power table: G2 generates the whole evaluation domain, so
        # every exponentiation in the protocol is G2^(e mod precision);
        # TPU gathers run at GB-rows/s, far cheaper than square-and-multiply
        self.g2_powers = self._power_table(self.G2, cfg.precision)
        # K(x) = minipoly(x^skips2) depends only on pos mod (precision/skips2/
        # ext... ): x^skips2 = G2^(skips2*pos mod precision) has order
        # precision/skips2, so K takes that many distinct values
        self.k_period = cfg.precision // math.gcd(cfg.precision, cfg.skips2)
        minipoly = self._intt_host(
            [(i ** 7) ^ 42 for i in range(cfg.num_constants)],
            self.minipoly_root)
        kb = pow(self.G2, cfg.skips2, m)
        self.k_table = self._eval_table(minipoly, kb, self.k_period)

        # Z(x) = (x^steps - 1)/(x - last) and Z2(x) = (x-1)(x-last) take one
        # value per domain position x = G2^pos (main.rs:175-176,183-185):
        # precomputing them turns the spot-check divisions into gathers --
        # together with eval4_inv_free this removes EVERY inversion (and the
        # whole Fermat/batch-inversion machinery) from the verifier graph.
        pw = self._g2_powers_int
        mask = cfg.precision - 1
        last = self.last_step_position
        denoms = [(x - last) % m for x in pw]
        inv_den = _batch_inv_host(denoms, m)
        self.z_table = fp.ints_to_limbs_fast(
            [(pw[(j << cfg.log_steps) & mask] - 1) * inv_den[j] % m
             for j in range(cfg.precision)])
        self.z2_table = fp.ints_to_limbs_fast(
            [(pw[j] - 1) * denoms[j] % m for j in range(cfg.precision)])

        # Strict-mode direct low-degree check of the final FRI (POINTS) layer
        # (the TODO the reference leaves open, src/main.rs:94): upstream
        # mimc_stark interpolates the first max_deg_plus_1 positions NOT
        # divisible by extension_factor and re-evaluates the remaining ones.
        # The interpolation nodes are powers of the final-domain root (host
        # constants), so the whole check collapses to one precomputed
        # evaluation matrix: data[pts[k+D]] ?= sum_i M[k, i] * data[pts[i]].
        nd = cfg.fri_final_domain
        deg = cfg.fri_final_maxdeg_plus_1
        rou_last = pow(self.G2, 4 ** cfg.fri_levels, m)
        self.points_pts = np.array(
            [x for x in range(nd) if x % cfg.extension_factor], dtype=np.int64)
        pts = self.points_pts
        if len(pts) <= deg:
            raise ValueError("no held-out positions for the direct check")
        powl = [pow(rou_last, int(x), m) for x in range(nd)]
        nodes = [powl[int(x)] for x in pts[:deg]]
        # denominators prod_{k != i} (n_i - n_k), numerators via batch inv
        dens = [1] * deg
        for i in range(deg):
            for k in range(deg):
                if k != i:
                    dens[i] = dens[i] * (nodes[i] - nodes[k]) % m
        targets = [powl[int(x)] for x in pts[deg:]]
        diffs = [(t - n) % m for t in targets for n in nodes]
        inv_all = _batch_inv_host([d % m for d in dens] + diffs, m)
        inv_dens, inv_diffs = inv_all[:deg], inv_all[deg:]
        mat = []
        for j, t in enumerate(targets):
            nfull = 1
            for n in nodes:
                nfull = nfull * (t - n) % m
            mat.append([nfull * inv_diffs[j * deg + i] % m * inv_dens[i] % m
                        for i in range(deg)])
        self.points_eval_matrix = np.stack(
            [fp.ints_to_limbs_fast(row) for row in mat])   # [nd-e-deg, deg, 16]

    def _power_table(self, base: int, n: int) -> np.ndarray:
        m = self.cfg.modulus
        vals = [1] * n
        cur = 1
        for i in range(1, n):
            cur = cur * base % m
            vals[i] = cur
        self._g2_powers_int = vals          # kept for derived host tables
        return fp.ints_to_limbs_fast(vals)

    def _eval_table(self, coeffs: list, base: int, n: int) -> np.ndarray:
        """[n, 16]: poly(base^t) for t < n."""
        m = self.cfg.modulus
        out = np.zeros((n, fp.NLIMBS), dtype=np.uint32)
        x = 1
        for t in range(n):
            acc, pw = 0, 1
            for c in coeffs:
                acc = (acc + c * pw) % m
                pw = pw * x % m
            out[t] = fp.int_to_limbs(acc)
            x = x * base % m
        return out

    def _intt_host(self, vals: list, root: int) -> list:
        """Host inverse NTT matching the reference recursion (fft.rs:64-86)."""
        m = self.cfg.modulus

        def _fft(v, roots):
            if len(v) <= 4:
                n = len(roots)
                return [sum(v[j] * roots[(i * j) % n] for j in range(n)) % m
                        for i in range(n)]
            left = _fft(v[::2], roots[::2])
            right = _fft(v[1::2], roots[::2])
            out = [0] * len(v)
            for i, (a, b) in enumerate(zip(left, right)):
                br = b * roots[i]
                out[i] = (a + br) % m
                out[i + len(left)] = (a - br) % m
            return out

        roots = [1, root % m]
        while roots[-1] != 1:
            roots.append(roots[-1] * root % m)
        roots.reverse()
        roots.pop()
        inv_len = pow(len(vals), m - 2, m)
        return [x * inv_len % m for x in _fft(vals, roots)]


def _batch_inv_host(vals: list, m: int) -> list:
    """Montgomery-trick batch inversion over host ints; zeros map to 0
    (matching the reference's inv, src/utils.rs:139-167)."""
    n = len(vals)
    pre = [1] * (n + 1)
    for i, v in enumerate(vals):
        pre[i + 1] = pre[i] * (v if v else 1) % m
    inv_total = pow(pre[n], m - 2, m)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        v = vals[i]
        if v:
            out[i] = pre[i] * inv_total % m
            inv_total = inv_total * v % m
    return out


@functools.lru_cache(maxsize=8)
def cached_tables(cfg: StarkConfig) -> StatementTables:
    """Memoized table construction (the G2 power table costs ~1 s host time)."""
    return StatementTables(cfg)


def default_tables() -> StatementTables:
    return cached_tables(StarkConfig())
