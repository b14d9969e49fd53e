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

NLIMBS = fp.NLIMBS
MASK = jnp.uint32(fp.LIMB_MASK)

_P = jnp.asarray(fp.P_LIMBS)          # [16]
_C = jnp.asarray(fp.FOLD_C_LIMBS)     # [3]  (2^256 mod p)


def const(x: int) -> jnp.ndarray:
    """Embed a host int as a device limb constant."""
    return jnp.asarray(fp.int_to_limbs(x))


# ---------------------------------------------------------------------------
# Carry normalization
# ---------------------------------------------------------------------------

def _carry_fix(v: jnp.ndarray) -> jnp.ndarray:
    """Normalize limbs to < 2^16, rippling carries upward.

    Input limbs may hold up to 32-bit values; the total value must fit in the
    buffer (carries off the top limb are dropped, i.e. arithmetic is mod
    2^(16*n)).  Runs a data-dependent number of vectorized passes via
    while_loop -- typically 2, worst case n for a full ripple chain.
    """
    def cond(v):
        return jnp.any(v > MASK)

    def body(v):
        c = v >> 16
        v = v & MASK
        return v.at[..., 1:].add(c[..., :-1])

    return lax.while_loop(cond, body, v)


def _carry_fix_fixed(v: jnp.ndarray, passes: int) -> jnp.ndarray:
    """Statically-unrolled carry passes (when a bound on passes is provable)."""
    for _ in range(passes):
        c = v >> 16
        v = (v & MASK).at[..., 1:].add(c[..., :-1])
    return v


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
    """Reduce a value < 2^256 into canonical [0, p) (single conditional subtract,
    valid because 2^256 < 2p)."""
    bp = jnp.broadcast_to(_P, a.shape)
    return cond_sub(a, bp, ge(a, bp))


# ---------------------------------------------------------------------------
# Add / sub mod p
# ---------------------------------------------------------------------------

def add_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for canonical inputs."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    s = jnp.zeros(shape[:-1] + (NLIMBS + 1,), jnp.uint32)
    s = s.at[..., :NLIMBS].set(a + b)
    s = _carry_fix(s)
    p17 = jnp.zeros((NLIMBS + 1,), jnp.uint32).at[:NLIMBS].set(_P)
    bp = jnp.broadcast_to(p17, s.shape)
    s = cond_sub(s, bp, ge(s, bp))
    return s[..., :NLIMBS]


def sub_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for canonical inputs: computed as (a + p) - b, then one
    conditional subtract of p (per-limb p_i - b_i can underflow, so b is
    subtracted after the a+p carry fix, with full borrow handling)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    s = jnp.zeros(shape[:-1] + (NLIMBS + 1,), jnp.uint32)
    s = s.at[..., :NLIMBS].set(a + _P)
    s = _carry_fix(s)
    b17 = jnp.zeros(shape[:-1] + (NLIMBS + 1,), jnp.uint32)
    b17 = b17.at[..., :NLIMBS].set(b)
    s = _sub_raw(s, b17)
    p17 = jnp.zeros((NLIMBS + 1,), jnp.uint32).at[:NLIMBS].set(_P)
    bp = jnp.broadcast_to(p17, s.shape)
    s = cond_sub(s, bp, ge(s, bp))
    return s[..., :NLIMBS]


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
    acc = _mul_acc(a, b, 32)
    return _carry_fix(acc)


def reduce_wide(w: jnp.ndarray) -> jnp.ndarray:
    """Reduce [..., 32] (< 2^512) to canonical [..., 16] in [0, p).

    Uses 2^256 === C (mod p) with C = 351*2^32 - 1: three folds then one
    conditional subtract (see fp.py docstring for the bound analysis).
    """
    lo, hi = w[..., :16], w[..., 16:]
    # fold 1: hi (16 limbs) * C (3 limbs) -> <= 19 limbs; + lo -> < 2^298
    acc = _mul_acc(hi, _C, 19)
    acc = acc.at[..., :16].add(lo)
    t = _carry_fix(acc)
    # fold 2: hi2 = t[16:19] (< 2^42); * C -> 6 limbs; + t[:16] -> < 2^256 + 2^84
    acc2 = _mul_acc(t[..., 16:19], _C, 17)
    acc2 = acc2.at[..., :16].add(t[..., :16])
    t2 = _carry_fix(acc2)
    # fold 3: hi3 = t2[16] in {0,1}
    acc3 = jnp.zeros(t2.shape[:-1] + (17,), jnp.uint32)
    acc3 = acc3.at[..., :16].set(t2[..., :16])
    acc3 = acc3.at[..., :3].add(t2[..., 16:17] * _C)
    t3 = _carry_fix(acc3)
    # fold 4: t3 < 2^256 + 2^42, top limb again in {0,1}; after this < 2^256
    acc4 = jnp.zeros_like(acc3)
    acc4 = acc4.at[..., :16].set(t3[..., :16])
    acc4 = acc4.at[..., :3].add(t3[..., 16:17] * _C)
    t4 = _carry_fix(acc4)[..., :16]
    return canon(t4)


def mul_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod p; inputs may be any values < 2^256 (not necessarily < p)."""
    return reduce_wide(mul_wide(a, b))


def sqr_mod(a: jnp.ndarray) -> jnp.ndarray:
    return mul_mod(a, a)


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
    """x^(2^k) mod p (k static squarings)."""
    for _ in range(k):
        x = sqr_mod(x)
    return x


def pow_bits(x: jnp.ndarray, bits_msb_first) -> jnp.ndarray:
    """x^e where e's bits are a static sequence (MSB first), via lax.scan of
    square-and-multiply -- keeps the compiled graph small for 256-bit exponents."""
    bits = jnp.asarray(np.array(bits_msb_first, dtype=np.uint32))
    r = jnp.broadcast_to(const(1), x.shape).astype(jnp.uint32)
    base = canon(x)

    def step(r, bit):
        r = sqr_mod(r)
        rm = mul_mod(r, base)
        r = jnp.where((bit == 1), rm, r)
        return r, None

    r, _ = lax.scan(step, r, bits)
    return r


def inv_mod(x: jnp.ndarray) -> jnp.ndarray:
    """x^(p-2) mod p (Fermat); maps 0 -> 0, matching the reference's inv
    semantics at its call sites (reference: src/utils.rs:139-167)."""
    bits = [int(b) for b in bin(fp.MODULUS - 2)[2:]]
    return pow_bits(x, bits)


def pow_table(table: jnp.ndarray, e: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """base^e with host-precomputed table[i] = base^(2^i) (see fp.pow2_table).

    table: [nbits, 16]; e: [...] uint32 exponent (< 2^nbits). Returns [..., 16].
    """
    r = jnp.broadcast_to(const(1), e.shape + (NLIMBS,)).astype(jnp.uint32)
    for i in range(nbits):
        bit = ((e >> i) & 1).astype(bool)
        m = mul_mod(r, table[i])
        r = jnp.where(bit[..., None], m, r)
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
        return mul_mod(a, b)

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
    out = mul_mod(mul_mod(pre_excl, suf_excl), itot[..., None, :])
    out = jnp.where(is_zero, jnp.zeros_like(out), out)
    if axis != -2:
        out = jnp.moveaxis(out, -2, axis)
    return out


# ---------------------------------------------------------------------------
# Polynomial helpers
# ---------------------------------------------------------------------------

def eval_poly(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sum_i coeffs[i] * x^i mod p.

    coeffs: [n, 16] (shared); x: [..., 16].  Powers are built with log-depth
    doubling (6 batched muls for n=64) then a product+tree-sum; matches the
    reference's sequential accumulation mathematically
    (reference: src/utils.rs:126-136 eval_poly_at).
    """
    n = coeffs.shape[0]
    # powers[..., i, :] = x^i
    pows = _powers(x, n)
    terms = mul_mod(pows, coeffs)          # [..., n, 16]
    return _sum_mod(terms, axis=-2)


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
