"""Device kernels for 256-bit prime-field arithmetic (16x16-bit limbs in uint32).

TPU-native replacement for the reference's BigInt arithmetic
(reference: /root/reference/src/utils.rs:25-42,122-167 and the num-bigint fork).
All functions are shape-polymorphic over leading batch dims: a field element is
a [..., 16] uint32 array of little-endian 16-bit limbs (see fp.py).

Values are *not* required to be canonical (< p) on input to multiplication:
any x < 2^256 is accepted and the result is canonical.  This matters for the
reference's bit-exactness quirks (unreduced k1..k4 / special_x, SURVEY.md
section 2.2) -- modular products of unreduced inputs are homomorphically equal
to products of their residues, so reducing early is safe wherever a value is
only used inside mod-p algebra.  Raw (possibly >= p) values are compared
bit-for-bit where the reference compares unreduced integers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import fp
from .. import debug

NLIMBS = fp.NLIMBS
MASK = np.uint32(fp.LIMB_MASK)

_P = np.asarray(fp.P_LIMBS)           # [16]
_C = np.asarray(fp.FOLD_C_LIMBS)      # [3]  (2^256 mod p)
# NOTE: module-level constants stay numpy so importing the library never
# initializes the XLA backend (jax.distributed.initialize must run first
# in multi-process deployments); jnp ops convert them at trace time.


def const(x: int) -> jnp.ndarray:
    """Embed a host int as a device limb constant."""
    return jnp.asarray(fp.int_to_limbs(x))


# ---------------------------------------------------------------------------
# Word/byte views
# ---------------------------------------------------------------------------

def bswap32(w: jnp.ndarray) -> jnp.ndarray:
    """Byte-swap uint32 lanes (LE word <-> BE 4-byte read)."""
    return (((w & 0xFF) << 24) | ((w & 0xFF00) << 8)
            | ((w >> 8) & 0xFF00) | (w >> 24))


def words_be_to_limbs(words: jnp.ndarray) -> jnp.ndarray:
    """[..., 8] uint32 LE words of a 32-byte big-endian value -> [..., 16] limbs.

    Proof values are 32-byte big-endian ints (reference: src/main.rs:171-174);
    the hash view stores them as LE words.  bswap each word (making it the
    value of its 4-byte BE group), reverse group order, then split into
    16-bit limbs.
    """
    sw = bswap32(words)[..., ::-1]        # group 0 = least significant 32 bits
    lo = sw & MASK
    hi = sw >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(*words.shape[:-1], 16)


def limbs_to_words_be(limbs: jnp.ndarray) -> jnp.ndarray:
    """Inverse of words_be_to_limbs: [..., 16] limbs -> [..., 8] LE words of
    the 32-byte big-endian encoding."""
    pairs = limbs.reshape(*limbs.shape[:-1], 8, 2)
    sw = pairs[..., 0] | (pairs[..., 1] << 16)   # LE 32-bit groups
    return bswap32(sw[..., ::-1])


# ---------------------------------------------------------------------------
# Carry normalization
# ---------------------------------------------------------------------------

def _carry_fix(v: jnp.ndarray) -> jnp.ndarray:
    """Normalize limbs to < 2^16 (arithmetic mod 2^(16*n): carries off the top
    limb are dropped).  Input limbs must be < 2^27.

    Deterministic and control-flow-free: one reduction pass brings every limb
    to lo_i <= 0xFFFF with an incoming carry c_i < 2^11; the remaining
    two-vector add is resolved exactly with a Kogge-Stone generate/propagate
    prefix (log2(n) steps) -- the worst-case ...FFFF ripple chain that a
    fixed number of naive passes cannot close is handled by the propagate
    chain.  ~25 vector ops, no while_loop (compiles far faster and maps
    cleanly onto the VPU).
    """
    n = v.shape[-1]
    # pass 1: split into low parts and single-step carries
    c = v >> 16                      # < 2^11 given v < 2^27
    lo = v & MASK
    s = lo.at[..., 1:].add(c[..., :-1])     # s_i <= 0xFFFF + 2^11 - 1 < 2^17
    # exact finish: s_i = t_i + 2^16*g0_i; add carries via prefix
    g = (s >> 16).astype(jnp.bool_)         # generate (s_i >= 2^16)
    t = s & MASK
    p = t == MASK                           # propagate (t_i == 0xFFFF)
    # Kogge-Stone on (g, p): carry into limb i+1 = g_i | (p_i & carry_i)
    shift = 1
    while shift < n:
        g_prev = jnp.zeros_like(g).at[..., shift:].set(g[..., :-shift])
        p_prev = jnp.zeros_like(p).at[..., shift:].set(p[..., :-shift])
        g = g | (p & g_prev)
        p = p & p_prev
        shift *= 2
    carry_in = jnp.zeros_like(g).at[..., 1:].set(g[..., :-1])
    return (t + carry_in.astype(jnp.uint32)) & MASK


# ---------------------------------------------------------------------------
# Comparison / conditional subtract
# ---------------------------------------------------------------------------

def ge(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b as integers; a, b [..., n] normalized limbs. Returns [...] bool.

    Vectorized: locate the most-significant differing limb with argmax over the
    reversed inequality mask, then compare that limb.
    """
    n = a.shape[-1]
    ne = a != b                                   # [..., n]
    any_ne = jnp.any(ne, axis=-1)
    first_from_top = jnp.argmax(ne[..., ::-1], axis=-1)
    top = (n - 1 - first_from_top)[..., None]
    a_top = jnp.take_along_axis(a, top, axis=-1)[..., 0]
    b_top = jnp.take_along_axis(b, top, axis=-1)[..., 0]
    return jnp.where(any_ne, a_top > b_top, True)


def _sub_raw(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod 2^(16n) for normalized limb arrays of equal width."""
    n = a.shape[-1]
    comp = (MASK - b)
    s = a + comp
    s = s.at[..., 0].add(jnp.uint32(1))
    return _carry_fix(s)


def cond_sub(a: jnp.ndarray, b: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
    """Where cond, a - b (requires a >= b), else a."""
    d = _sub_raw(a, b)
    return jnp.where(cond[..., None], d, a)


def canon(a: jnp.ndarray) -> jnp.ndarray:
    """Reduce a value < 2^256 into canonical [0, p).

    Uses p = 2^256 - C:  a >= p  <=>  a + C >= 2^256, so one 17-limb add of
    the 3-limb constant C exposes the compare as its carry-out limb and the
    reduced value as its low limbs -- no multi-limb compare (argmax/gather)
    and no separate subtract.
    """
    t = jnp.zeros(a.shape[:-1] + (NLIMBS + 1,), jnp.uint32)
    t = t.at[..., :NLIMBS].set(a)
    t = t.at[..., :3].add(jnp.broadcast_to(_C, a.shape[:-1] + (3,)))
    t = _carry_fix(t)
    return jnp.where(t[..., NLIMBS:] > 0, t[..., :NLIMBS], a)


# ---------------------------------------------------------------------------
# Add / sub mod p
# ---------------------------------------------------------------------------

def add_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for canonical inputs.

    Computes s = a + b and u = s + C in one STACKED carry normalization
    ([..., 2, 17] -- one Kogge pass covers both), then selects: s >= p
    <=> u >= 2^256 <=> u's carry-out limb is set, in which case the answer
    is u's low limbs (s + C - 2^256 = s - p)."""
    debug.check_limbs(a, "add_mod lhs")
    debug.check_limbs(b, "add_mod rhs")
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    s = jnp.zeros(shape[:-1] + (2, NLIMBS + 1), jnp.uint32)
    s = s.at[..., 0, :NLIMBS].set(a + b)
    s = s.at[..., 1, :NLIMBS].set(a + b)
    s = s.at[..., 1, :3].add(jnp.broadcast_to(_C, shape[:-1] + (3,)))
    s = _carry_fix(s)
    takes = s[..., 1, NLIMBS:] > 0
    return jnp.where(takes, s[..., 1, :NLIMBS], s[..., 0, :NLIMBS])


_NOT_C16 = (np.full(16, fp.LIMB_MASK, dtype=np.uint32)
            - np.pad(fp.FOLD_C_LIMBS, (0, 13)))   # 2^256 - 1 - C (16 limbs)


def sub_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for canonical inputs, via complement adds.

    Both candidates are formed pre-normalization and share one stacked carry
    pass:  r0 = a + ~b + 1 (= a - b + 2^256; carry-out limb == 1 iff a >= b)
    and    r1 = a + ~b + ~C + 2 (= a - b + p + 2^256; its low limbs are
    a - b + p, the a < b answer).  No multi-limb compare, no conditional
    subtract."""
    debug.check_limbs(a, "sub_mod lhs")
    debug.check_limbs(b, "sub_mod rhs")
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    nb = MASK - b
    s = jnp.zeros(shape[:-1] + (2, NLIMBS + 1), jnp.uint32)
    s = s.at[..., 0, :NLIMBS].set(a + nb)
    s = s.at[..., 0, 0].add(jnp.uint32(1))
    s = s.at[..., 1, :NLIMBS].set(a + nb + _NOT_C16)
    s = s.at[..., 1, 0].add(jnp.uint32(2))
    s = _carry_fix(s)
    a_ge_b = s[..., 0, NLIMBS:] > 0
    return jnp.where(a_ge_b, s[..., 0, :NLIMBS], s[..., 1, :NLIMBS])


def neg_mod(a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod p for canonical input."""
    z = jnp.zeros_like(a)
    return sub_mod(z, a)


# ---------------------------------------------------------------------------
# Multiplication
# ---------------------------------------------------------------------------

def _diag_sum(mat: jnp.ndarray, out_limbs: int, shift: int) -> jnp.ndarray:
    """Anti-diagonal column sums of a product matrix, scatter-free.

    mat: [..., na, nb]; returns [..., out_limbs] where
    out[k] = sum_{i+j = k-shift} mat[..., i, j].

    Uses the pad/flatten/re-stride trick: pad rows to width na+nb, drop the
    trailing pad, and re-view with row stride na+nb-1 so row i lands shifted
    right by i; a plain axis sum then adds anti-diagonals.  All layout ops --
    compiles to reshapes, no scatters.
    """
    *lead, na, nb = mat.shape
    lead = tuple(lead)
    w = na + nb
    x = jnp.pad(mat, [(0, 0)] * len(lead) + [(0, 0), (0, na)])
    x = x.reshape(lead + (na * w,))[..., : na * (w - 1)]
    x = x.reshape(lead + (na, w - 1))
    cols = jnp.sum(x, axis=-2, dtype=jnp.uint32)        # [..., na+nb-1]
    out = jnp.zeros(lead + (out_limbs,), jnp.uint32)
    hi = min(out_limbs, shift + na + nb - 1)
    return out.at[..., shift:hi].set(cols[..., : hi - shift])


def _mul_acc(a: jnp.ndarray, b: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Schoolbook product columns of limb arrays a [..., na], b [..., nb]
    into an [..., out_limbs] uint32 accumulator (pre-carry, each < 2^22).

    Limb products are exact in uint32 (16-bit limbs); each product is split
    into 16-bit halves so anti-diagonal column sums of up to 2x16 terms stay
    below 2^21 without widening.
    """
    lead = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    prod = a[..., :, None] * b[..., None, :]            # [..., na, nb] exact
    prod = jnp.broadcast_to(prod, lead + prod.shape[-2:])
    lo = prod & MASK
    hi = prod >> 16
    return _diag_sum(lo, out_limbs, 0) + _diag_sum(hi, out_limbs, 1)


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 512-bit product of two 256-bit values: [..., 16]x[..., 16] -> [..., 32]."""
    if _USE_MXU_MUL:
        return _carry_fix(_mul_acc_mxu(a, b))
    acc = _mul_acc(a, b, 32)
    return _carry_fix(acc)


# --- MXU product path -------------------------------------------------------
#
# The schoolbook column sums are a contraction with a constant 0/1 matrix:
# flatten the limb product matrix to [..., 256] (entry 16i+j = a_i*b_j, split
# into 16-bit halves -> [..., 512]) and matmul with SEL[512, 32] where
# SEL[(half,i,j), k] = 1 iff i+j+half == k.  Every partial sum is < 2^21, far
# below f32's 2^24 integer-exact range, so the MXU computes the columns
# exactly -- turning the HBM-bound elementwise diagonal sums into systolic
# array work (the op the TPU is built around).

_USE_MXU_MUL = True


@functools.lru_cache(maxsize=1)
def _sel_matrices() -> tuple:
    lo = np.zeros((256, 32), dtype=np.float32)
    hi = np.zeros((256, 32), dtype=np.float32)
    for i in range(16):
        for j in range(16):
            lo[i * 16 + j, i + j] = 1.0
            hi[i * 16 + j, i + j + 1] = 1.0
    return lo, hi


def _mul_acc_mxu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lead = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    prod = (a[..., :, None] * b[..., None, :])          # [..., 16, 16] exact u32
    prod = jnp.broadcast_to(prod, lead + (16, 16)).reshape(lead + (256,))
    lo = (prod & MASK).astype(jnp.float32)
    hi = (prod >> 16).astype(jnp.float32)
    sel_lo, sel_hi = _sel_matrices()

    def dot(x, s):
        return jax.lax.dot_general(
            x, jnp.asarray(s), (((x.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    # two dots instead of one over a concatenated [..., 512] operand: skips
    # materializing the concat (2 KB/element of HBM traffic)
    cols = dot(lo, sel_lo) + dot(hi, sel_hi)            # [..., 32] exact ints
    return cols.astype(jnp.uint32)


_P17 = np.pad(fp.P_LIMBS, (0, 1))     # [17]


def _acc_mul_c(acc: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """acc[..., k:k+nm(+1)] += C * m for UNNORMALIZED m (limbs < 2^25).

    C's three 16-bit limbs multiply m's on-the-fly 16-bit split, so no carry
    normalization of m is needed first; every partial product is exact in
    uint32 and accumulator limbs stay < 2^27 (the _carry_fix input bound).
    """
    nm = m.shape[-1]
    m_lo = m & MASK
    m_hi = m >> 16
    for k in range(3):
        c = jnp.uint32(int(fp.FOLD_C_LIMBS[k]))
        p_lo = m_lo * c                       # < 2^32: split halves
        acc = acc.at[..., k:k + nm].add(p_lo & MASK)
        acc = acc.at[..., k + 1:k + nm + 1].add(p_lo >> 16)
        acc = acc.at[..., k + 1:k + nm + 1].add(m_hi * c)   # < 2^25: direct
    return acc


def _fold_cols(w: jnp.ndarray, canonical: bool = True) -> jnp.ndarray:
    """Reduce UNNORMALIZED 512-bit product columns [..., 32] (limbs < 2^21)
    to [..., 16] mod p.

    Carry-pass-minimal redesign of the fold chain: folds 1-2 run on
    unnormalized columns (the C multiplier splits its operand on the fly, see
    _acc_mul_c), so only TWO carry normalizations remain -- one after the
    folds, and one stacked [..., 2, 17] pass that simultaneously normalizes
    the last fold and its +C shifted copy, whose carry-out limb is the
    "value >= p" flag (p = 2^256 - C).  Canonical output is therefore as
    cheap as a lazy (< 2^256) residue.
    """
    lead = w.shape[:-1]
    # fold 1: lo + C * hi    (columns < 2^23.2, 20 limbs)
    acc = jnp.zeros(lead + (20,), jnp.uint32).at[..., :16].set(w[..., :16])
    acc = _acc_mul_c(acc, w[..., 16:32])
    # fold 2: + C * top-4    (columns < 2^25.3, 16 limbs, value < 2^270)
    acc2 = jnp.zeros(lead + (NLIMBS + 1,), jnp.uint32)
    acc2 = acc2.at[..., :NLIMBS].set(acc[..., :16])
    acc2 = _acc_mul_c(acc2, acc[..., 16:20])
    t = _carry_fix(acc2)                       # [..., 17]; t[16] < 2^14
    # fold 3: v = t[:16] + C * t[16]  (< 2^256 + 2^56), built pre-carry;
    # stacked with u = v + C so one Kogge pass yields both the normalized
    # residue and the canonical select
    t16 = t[..., 16:17]
    v = jnp.zeros(lead + (2, NLIMBS + 1), jnp.uint32)
    v = v.at[..., 0, :NLIMBS].set(t[..., :16])
    for k in range(3):
        c = jnp.uint32(int(fp.FOLD_C_LIMBS[k]))
        p = t16[..., 0] * c                   # < 2^30: split halves
        v = v.at[..., 0, k].add(p & MASK)
        v = v.at[..., 0, k + 1].add(p >> 16)
    v = v.at[..., 1, :].set(v[..., 0, :])
    v = v.at[..., 1, :3].add(jnp.broadcast_to(_C, lead + (3,)))
    v = _carry_fix(v)
    vn = v[..., 0, :]                          # normalized v, vn[16] in {0,1}
    un = v[..., 1, :]                          # normalized v + C
    if canonical:
        # v >= p  <=>  u >= 2^256  <=>  un[16] >= 1  (covers vn[16] == 1 too)
        r = jnp.where(un[..., NLIMBS:] > 0,
                      un[..., :NLIMBS], vn[..., :NLIMBS])
        debug.check_limbs(r, "_fold_cols canonical output")
        return r
    # lazy (< 2^256): clear vn's 2^256 bit with one final tiny fold
    top = vn[..., NLIMBS]
    r = vn[..., :NLIMBS]
    r = r.at[..., 0].add(top * _C[0])
    r = r.at[..., 1].add(top * _C[1])
    r = r.at[..., 2].add(top * _C[2])
    return _carry_fix(r)


def reduce_wide(w: jnp.ndarray, canonical: bool = True) -> jnp.ndarray:
    """Reduce [..., 32] (< 2^512, normalized or unnormalized limbs < 2^21)
    to [..., 16] using 2^256 === C (mod p) with C = 351*2^32 - 1."""
    return _fold_cols(w, canonical=canonical)


def pallas_enabled() -> bool:
    """Opt-in Pallas kernels (STARK_PALLAS=1, TPU backend only).

    Enables the fused whole-chain protocol kernels (ops/fri_pallas.py).
    The Mosaic toolchain pays a ~10-minute one-time warmup per process
    through the axon remote-compile tunnel (docs/PERF.md), so the default
    stays on the XLA path; long-running servers/benches can flip it on.
    """
    import os
    if os.environ.get("STARK_PALLAS", "0") != "1":
        return False
    return jax.default_backend() == "tpu"


def _pallas_mul_enabled() -> bool:
    """Per-op fused mul swap (STARK_PALLAS=1 + STARK_PALLAS_MUL=1).

    Separate switch from the fused protocol kernels: a per-op swap pays
    limb-major transpose adapters on every call, which can cost more than
    the VMEM fusion saves (the whole-chain kernels amortize one adapter
    over ~13 multiplies instead)."""
    import os
    if os.environ.get("STARK_PALLAS_MUL", "0") != "1":
        return False
    return pallas_enabled()


def mul_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod p, canonical; inputs may be any values < 2^256.

    Fused path: the MXU column accumulator feeds the fold chain directly
    (no intermediate 32-limb carry normalization).  STARK_PALLAS_MUL=1 swaps in
    the VMEM-resident Pallas kernel (ops/field_pallas.py)."""
    if _pallas_mul_enabled():
        from . import field_pallas
        return field_pallas.mul_mod(a, b)
    if _USE_MXU_MUL:
        return _fold_cols(_mul_acc_mxu(a, b))
    return _fold_cols(_mul_acc(a, b, 32))


def mul_sum_mod(pairs, extra=(), canonical: bool = True) -> jnp.ndarray:
    """sum_i a_i * b_i  +  sum_j extra_j   (mod p), with ONE fold reduction.

    pairs: iterable of (a, b) [..., 16] limb arrays (values < 2^256, limbs
    normalized < 2^16; broadcastable leads).  extra: iterable of [..., 16]
    plain addends (same domain).  The per-product column accumulators are
    summed in uint32 BEFORE the fold chain, so a k-term product sum pays a
    single _fold_cols instead of k of them -- the dominant per-multiply cost
    (the reference pays a full reduce per BigInt op, src/utils.rs:122-167).

    Bound analysis (why one fold stays exact up to n = 16 products):
      * each product's 32 columns are < 2^21 (16 limb-products split in
        halves), exact in the f32 MXU dots individually; the uint32 column
        sum is < n*2^21 + n_extra*2^16 < 2^25.
      * _fold_cols tolerates that: fold-1/2 intermediates stay < 2^29 << 2^32
        and _carry_fix is exact for ANY uint32 limbs (its per-limb
        carry < 2^16 keeps the Kogge generate bit single-bit); the conserva-
        tive 2^21 figure in its docstring is the single-product case.
    Canonical output.  Covered by test_field.test_mul_sum_mod incl. the
    all-0xFFFF worst case at n = 16.
    """
    pairs = list(pairs)
    extra = list(extra)
    n = len(pairs)
    if not (1 <= n <= 16 and len(extra) <= 8):
        # EXACTNESS bound, not a debug check: more terms overflow the single
        # shared fold (see the bound analysis above) -- must survive python -O
        raise ValueError(
            f"mul_sum_mod exactness bound: 1 <= n_pairs <= 16 (got {n}), "
            f"n_extra <= 8 (got {len(extra)})")
    for a, b in pairs:
        debug.check_limbs(a, "mul_sum_mod lhs")
        debug.check_limbs(b, "mul_sum_mod rhs")
    mk = (_mul_acc_mxu if _USE_MXU_MUL
          else (lambda a, b: _mul_acc(a, b, 32)))
    acc = mk(*pairs[0])
    for a, b in pairs[1:]:
        acc = acc + mk(a, b)
    for t in extra:
        debug.check_limbs(t, "mul_sum_mod extra")
        pad = jnp.zeros(t.shape[:-1] + (32,), jnp.uint32)
        acc = acc + pad.at[..., :NLIMBS].set(t)
    return _fold_cols(acc, canonical=canonical)


def mul_mod_lazy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod p.  Historically a cheaper < 2^256 residue; with the
    stacked-normalization fold the canonical result is just as cheap, so
    this is now an alias kept for call-site intent."""
    return mul_mod(a, b)


# --- squaring ---------------------------------------------------------------
# a^2's product matrix is symmetric: only the 136 (i <= j) limb pairs are
# multiplied and the off-diagonal doubling folds into the selection matmul
# weights (2.0 entries; column sums stay < 2^22, exact in f32).

_SQR_I = np.array([i for i in range(16) for j in range(i, 16)], dtype=np.int32)
_SQR_J = np.array([j for i in range(16) for j in range(i, 16)], dtype=np.int32)


@functools.lru_cache(maxsize=1)
def _sqr_sel_matrices() -> tuple:
    lo = np.zeros((136, 32), dtype=np.float32)
    hi = np.zeros((136, 32), dtype=np.float32)
    for t in range(136):
        i, j = int(_SQR_I[t]), int(_SQR_J[t])
        wgt = 1.0 if i == j else 2.0
        lo[t, i + j] = wgt
        hi[t, i + j + 1] = wgt
    return lo, hi


def _sqr_acc_mxu(a: jnp.ndarray) -> jnp.ndarray:
    ai = a[..., _SQR_I]
    aj = a[..., _SQR_J]
    prod = ai * aj                             # [..., 136] exact u32
    lo = (prod & MASK).astype(jnp.float32)
    hi = (prod >> 16).astype(jnp.float32)
    sel_lo, sel_hi = _sqr_sel_matrices()

    def dot(x, s):
        return jax.lax.dot_general(
            x, jnp.asarray(s), (((x.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    cols = dot(lo, sel_lo) + dot(hi, sel_hi)   # [..., 32] exact ints < 2^22
    return cols.astype(jnp.uint32)


def sqr_mod(a: jnp.ndarray) -> jnp.ndarray:
    """a^2 mod p, canonical; input any value < 2^256.  ~47% less elementwise
    prep than mul_mod(a, a) via the triangular product."""
    if _USE_MXU_MUL:
        return _fold_cols(_sqr_acc_mxu(a))
    return _fold_cols(_mul_acc(a, a, 32))


# ---------------------------------------------------------------------------
# Exponentiation
# ---------------------------------------------------------------------------

def pow_const(x: jnp.ndarray, e: int) -> jnp.ndarray:
    """x^e mod p for a static Python exponent (unrolled square-and-multiply)."""
    if e == 0:
        return jnp.broadcast_to(const(1), x.shape).astype(jnp.uint32)
    bits = bin(e)[2:]
    r = x
    for bchar in bits[1:]:
        r = sqr_mod(r)
        if bchar == "1":
            r = mul_mod(r, x)
    return r


def pow2k(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x^(2^k) mod p (k squarings under fori_loop -- one squaring in the
    compiled graph)."""
    if k == 0:
        return x
    return lax.fori_loop(0, k, lambda _, v: sqr_mod(v), x)


def inv_mod(x: jnp.ndarray) -> jnp.ndarray:
    """x^(p-2) mod p (Fermat); maps 0 -> 0, matching the reference's inv
    semantics at its call sites (reference: src/utils.rs:139-167).

    Addition chain exploiting the sparse prime: p - 2 = 2^256 - 351*2^32 - 1
    is, in binary, 215 ones ++ 010100000 ++ 32 ones.  x^(2^k - 1) building
    blocks (doubling ladder) cover the one-runs, so the chain costs 255
    squarings (cheap: sqr_mod's triangular product) + 15 multiplies, versus
    ~495 multiply-equivalents for scanned square-and-multiply.  The long
    squaring runs sit in fori_loops, keeping the compiled graph ~30 ops.
    """
    x = canon(x)

    def sm(r, k, t):
        return mul_mod(pow2k(r, k), t)     # r^(2^k) * t

    r1 = x
    r2 = sm(r1, 1, r1)                     # x^(2^2 - 1)
    r4 = sm(r2, 2, r2)
    r8 = sm(r4, 4, r4)
    r16 = sm(r8, 8, r8)
    r32 = sm(r16, 16, r16)
    r64 = sm(r32, 32, r32)
    r128 = sm(r64, 64, r64)
    u = sm(r128, 64, r64)                  # x^(2^192 - 1)
    u = sm(u, 16, r16)                     # 208 ones
    u = sm(u, 4, r4)                       # 212
    u = sm(u, 2, r2)                       # 214
    u = sm(u, 1, r1)                       # x^(2^215 - 1)
    # tail block: 2^224 - 352 = (2^215 - 1)*2^9 + 160, 160 = 0b010100000
    u = sqr_mod(u)
    u = mul_mod(sqr_mod(u), x)
    u = sqr_mod(u)
    u = mul_mod(sqr_mod(u), x)
    u = pow2k(u, 5)                        # x^(2^224 - 352)
    # low word: e = (2^224 - 352)*2^32 + (2^32 - 1) = p - 2
    return sm(u, 32, r32)


def pow_table(table: jnp.ndarray, e: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """base^e with host-precomputed table[i] = base^(2^i) (see fp.pow2_table).

    table: [nbits, 16]; e: [...] uint32 exponent (< 2^nbits). Returns [..., 16].
    Scanned over bits -- one multiply in the compiled graph.
    """
    r = jnp.broadcast_to(const(1), e.shape + (NLIMBS,)).astype(jnp.uint32)
    bits = jnp.stack([((e >> i) & 1).astype(bool) for i in range(nbits)])

    def step(r, xs):
        bit, tab = xs
        m = mul_mod(r, tab)
        return jnp.where(bit[..., None], m, r), None

    r, _ = lax.scan(step, r, (bits, table[:nbits]))
    return r


# ---------------------------------------------------------------------------
# Batch inversion (Montgomery's trick; reference: src/utils.rs:169-194)
# ---------------------------------------------------------------------------

def batch_inv(v: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Invert many field elements with one Fermat inversion.

    v: [..., n, 16] canonical values along `axis` (default second-to-last).
    Zeros map to 0 (matching reference multi_inv).  Uses inclusive prefix and
    suffix modular-product scans: inv_i = prefix_{i-1} * suffix_{i+1} * inv(total).
    """
    if axis != -2:
        v = jnp.moveaxis(v, axis, -2)
    one = jnp.broadcast_to(const(1), v.shape).astype(jnp.uint32)
    is_zero = jnp.all(v == 0, axis=-1, keepdims=True)
    vv = jnp.where(is_zero, one, v)

    def combine(a, b):
        # lazy residues are fine inside the product scans (only fed to muls;
        # inv_mod canonicalizes its input)
        return mul_mod_lazy(a, b)

    scan_axis = vv.ndim - 2  # positive axis (negative axes break lax.rev inside)
    pre = lax.associative_scan(combine, vv, axis=scan_axis)                # inclusive prefix
    suf = lax.associative_scan(combine, vv, axis=scan_axis, reverse=True)  # inclusive suffix
    total = pre[..., -1, :]
    itot = inv_mod(total)

    n = v.shape[-2]
    pre_excl = jnp.concatenate(
        [jnp.broadcast_to(const(1), v.shape[:-2] + (1, NLIMBS)).astype(jnp.uint32),
         pre[..., :-1, :]], axis=-2)
    suf_excl = jnp.concatenate(
        [suf[..., 1:, :],
         jnp.broadcast_to(const(1), v.shape[:-2] + (1, NLIMBS)).astype(jnp.uint32)],
        axis=-2)
    out = mul_mod(mul_mod_lazy(pre_excl, suf_excl), itot[..., None, :])
    out = jnp.where(is_zero, jnp.zeros_like(out), out)
    if axis != -2:
        out = jnp.moveaxis(out, -2, axis)
    return out


# ---------------------------------------------------------------------------
# Polynomial helpers
# ---------------------------------------------------------------------------

def eval_poly(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sum_i coeffs[i] * x^i mod p (Horner scan over coefficients).

    coeffs: [n, 16] (shared); x: [..., 16] canonical.  Same residue as the
    reference's power-accumulation loop (src/utils.rs:126-136 eval_poly_at);
    one multiply in the compiled graph.
    """
    rev = coeffs[::-1]
    acc = jnp.broadcast_to(canon(rev[0]), x.shape).astype(jnp.uint32)

    def step(acc, c):
        # acc*x + c through one fold (mul_sum_mod) per Horner step
        nxt = mul_sum_mod([(acc, x)],
                          extra=[jnp.broadcast_to(canon(c), x.shape)])
        return nxt, None

    acc, _ = lax.scan(step, acc, rev[1:])
    return acc


def _powers(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[..., n, 16] with entry i = x^i mod p (log-depth doubling)."""
    xs = canon(x)
    one = jnp.broadcast_to(const(1), xs.shape).astype(jnp.uint32)
    out = jnp.stack([one, xs], axis=-2)  # [..., 2, 16]
    while out.shape[-2] < n:
        k = out.shape[-2]
        top = out[..., k - 1:k, :]           # x^(k-1)
        ext = mul_mod(out[..., 1:, :], top)  # x^k .. x^(2k-2)
        out = jnp.concatenate([out, ext], axis=-2)
    return out[..., :n, :]


def _sum_mod(terms: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Modular sum along an axis (tree reduction of add_mod)."""
    if axis != -2:
        terms = jnp.moveaxis(terms, axis, -2)
    while terms.shape[-2] > 1:
        k = terms.shape[-2]
        half = k // 2
        a = terms[..., :half, :]
        b = terms[..., half:2 * half, :]
        s = add_mod(a, b)
        if k % 2:
            s = jnp.concatenate([s, terms[..., -1:, :]], axis=-2)
        terms = s
    return terms[..., 0, :]
