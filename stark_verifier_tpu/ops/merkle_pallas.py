"""Pallas TPU kernel for the fused Merkle branch walk.

The XLA formulation (ops/merkle.verify_branches) runs one batched Blake2s
compression per tree level under lax.scan: every level round-trips the
[branches, 8] running digests and the level's witnesses through HBM, and the
compression itself is fused by XLA with whatever register allocation it
picks.  This kernel walks a whole branch -- leaf hash plus all witness
levels -- inside ONE kernel: the 16 Blake2s state words live as [T]-lane
vector registers, witnesses stream from VMEM, and nothing touches HBM
between levels.

Layout: word-major [words, S, 128] tiles -- each message/digest word is a
full 2-D (sublane x lane) vector tile of S*128 independent branches, so
every elementwise op uses the whole 8x128 VPU (a 1-D [T] lane vector would
occupy a single sublane: measured 6.7x slower).

Mosaic constraints honored (tools/pallas_repro.py, docs/PERF.md):
  * no boolean vectors -- selects are arithmetic on uint32 0/1 lanes
    (m = 0 - bit gives the all-ones mask);
  * no scatter-adds;
  * per-step witness rows are loaded with a dynamic sublane slice, which
    Mosaic supports (contiguous leading-axis load).

Bit-exact semantics of merkle.verify_branches for the uniform-value-size
case, including the reference quirks: permute-4 leaf shuffle, 2^(w+2) start
index, index-parity pairing, and per-lane (traced) depths for the stacked
FRI levels (reference: /root/reference/src/merkle_tree.rs:101-172).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blake2s

# Default sublane rows per grid step.  Round-4 finding: the whole-walk
# kernel's cost is LATENCY-bound, not throughput-bound -- each compression is
# a ~1,200-op dependency chain, and with a small tile every op only covers
# SUB_TILE*128/1024 vregs of independent work, so the VPU pipeline stalls
# between dependent ops.  Bigger tiles amortize the latency (see
# tools/microbench_walk.py sweep in docs/PERF.md).
SUB_TILE = 32

_IV = [int(v) for v in blake2s.IV]
_H0 = [int(v) for v in blake2s.H0]
_SIGMA = blake2s.SIGMA
_DIAG = ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))


def _rotr(x, r: int):
    return (x >> r) | (x << (32 - r))


def _g(a, b, c, d, x, y):
    a = a + b + x
    d = _rotr(d ^ a, 16)
    c = c + d
    b = _rotr(b ^ c, 12)
    a = a + b + y
    d = _rotr(d ^ a, 8)
    c = c + d
    b = _rotr(b ^ c, 7)
    return a, b, c, d


def _compress(h: list, m: list, t: int, last: bool) -> list:
    """One Blake2s compression on scalar-word lane vectors.

    h: 8 [T] uint32 arrays; m: 16 [T] uint32 arrays; t/last static.
    Returns the 8 new digest word arrays.
    """
    T = h[0].shape
    consts = [_IV[0], _IV[1], _IV[2], _IV[3],
              _IV[4] ^ (t & 0xFFFFFFFF), _IV[5] ^ (t >> 32),
              _IV[6] ^ (0xFFFFFFFF if last else 0), _IV[7]]
    v = list(h) + [jnp.full(T, np.uint32(cv), jnp.uint32) for cv in consts]
    for r in range(10):
        s = [m[j] for j in _SIGMA[r]]
        for k in range(4):
            v[k], v[4 + k], v[8 + k], v[12 + k] = _g(
                v[k], v[4 + k], v[8 + k], v[12 + k], s[2 * k], s[2 * k + 1])
        for k, (ia, ib, ic, id_) in enumerate(_DIAG):
            v[ia], v[ib], v[ic], v[id_] = _g(
                v[ia], v[ib], v[ic], v[id_], s[8 + 2 * k], s[9 + 2 * k])
    return [h[i] ^ v[i] ^ v[8 + i] for i in range(8)]


def _hash_words(words: list, nbytes: int) -> list:
    """Blake2s-256 of a static-size message given as word lane vectors."""
    T = words[0].shape
    nblocks = max(1, -(-nbytes // 64))
    if len(words) * 4 < nbytes:
        raise ValueError(f"{len(words)} words cannot hold {nbytes} bytes")
    h = [jnp.full(T, np.uint32(hv), jnp.uint32) for hv in _H0]
    zero = jnp.zeros(T, jnp.uint32)
    for blk in range(nblocks):
        m = [words[i] if i < len(words) else zero
             for i in range(blk * 16, blk * 16 + 16)]
        is_last = blk == nblocks - 1
        t = nbytes if is_last else (blk + 1) * 64
        h = _compress(h, m, t, is_last)
    return h


def _sel(bit, a, b):
    """bit ? a : b with bit a uint32 0/1 lane vector (no boolean vectors)."""
    m = jnp.uint32(0) - bit          # 0xFFFFFFFF when bit == 1
    return (a & m) | (b & ~m)


def _make_walk_kernel(vw: int, max_depth: int):
    def kernel(value_ref, sibling_ref, witness_ref, tidx_ref, depth_ref,
               out_ref):
        # value/sibling [vw, S, 128]; witness [max_depth*8, S, 128];
        # tidx/depth [1, S, 128]; every per-word value is a 2-D [S, 128]
        # (sublane x lane) tile
        ti = tidx_ref[0]
        d = depth_ref[0]
        val = [value_ref[i] for i in range(vw)]
        sib = [sibling_ref[i] for i in range(vw)]

        odd = ti & 1
        first = ([_sel(odd, s, v) for s, v in zip(sib, val)]
                 + [_sel(odd, v, s) for s, v in zip(sib, val)])
        res = _hash_words(first, 8 * vw)
        ti = ti >> 1

        def step(k, carry):
            res, ti = carry
            wit = [witness_ref[pl.dslice(k * 8 + i, 1), :, :][0]
                   for i in range(8)]
            odd = ti & 1
            m = ([_sel(odd, w, r) for w, r in zip(wit, res)]
                 + [_sel(odd, r, w) for w, r in zip(wit, res)])
            nres = _hash_words(m, 64)
            # k < d as a uint32 0/1 lane vector (no boolean vectors): both
            # are < 2^31, so the subtraction's top bit is the comparison
            active = (k.astype(jnp.uint32) - d) >> 31
            res = [_sel(active, n, r) for n, r in zip(nres, res)]
            ti = _sel(active, ti >> 1, ti)
            return res, ti

        res, ti = jax.lax.fori_loop(0, max_depth, step, (res, ti))
        for i in range(8):
            out_ref[i] = res[i]

    return kernel


# ---------------------------------------------------------------------------
# Round-4 production variants: STATIC-depth partial walks for the shared-path
# bottom (ops/merkle._shared_bottom).  Rectangular groups walk every lane to
# the same (static) level count, so the per-level activity select of the
# masked kernel above disappears; the walk stops after `levels` witness
# levels and hands the running digests to the XLA dense-tail machinery.
# Measured 1.45x faster in-graph than the XLA lockstep scan at the main-walk
# shapes (tools/microbench_walk.py; docs/PERF.md round-4 section).
# ---------------------------------------------------------------------------

def _chain_steps(res, ti, witness_ref, levels: int):
    def step(k, carry):
        res, ti = carry
        wit = [witness_ref[pl.dslice(k * 8 + i, 1), :, :][0]
               for i in range(8)]
        odd = ti & 1
        m = ([_sel(odd, w, r) for w, r in zip(wit, res)]
             + [_sel(odd, r, w) for w, r in zip(wit, res)])
        res = _hash_words(m, 64)
        return res, ti >> 1

    return jax.lax.fori_loop(0, levels, step, (res, ti))


def _make_leaf_walk_kernel(vw: int, levels: int):
    """Leaf pair-hash + `levels` static witness levels, no depth masking."""

    def kernel(value_ref, sibling_ref, witness_ref, tidx_ref, out_ref):
        ti = tidx_ref[0]
        val = [value_ref[i] for i in range(vw)]
        sib = [sibling_ref[i] for i in range(vw)]
        odd = ti & 1
        first = ([_sel(odd, s, v) for s, v in zip(sib, val)]
                 + [_sel(odd, v, s) for s, v in zip(sib, val)])
        res = _hash_words(first, 8 * vw)
        res, _ = _chain_steps(res, ti >> 1, witness_ref, levels)
        for i in range(8):
            out_ref[i] = res[i]

    return kernel


def _make_chain_kernel(levels: int):
    """`levels` static witness levels from a given running digest (the
    quad-subtree groups enter here after the XLA pair+combine hashes)."""

    def kernel(h_ref, witness_ref, tidx_ref, out_ref):
        ti = tidx_ref[0]
        res = [h_ref[i] for i in range(8)]
        res, _ = _chain_steps(res, ti, witness_ref, levels)
        for i in range(8):
            out_ref[i] = res[i]

    return kernel


def _tile_call(kernel, ins, row_counts, nr, sub_tile, interpret):
    grid = (nr // sub_tile,)

    def spec(rows):
        return pl.BlockSpec((rows, sub_tile, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, nr, 128), jnp.uint32),
        grid=grid,
        in_specs=[spec(r) for r in row_counts],
        out_specs=spec(8),
        interpret=interpret,
    )(*ins)


class _Tiler:
    """[N, rows] <-> [rows, N/128, 128] word-major adapters with padding."""

    def __init__(self, lead, sub_tile: int):
        self.lead = lead
        self.n = int(np.prod(lead)) if lead else 1
        lane = sub_tile * 128
        self.npad = -(-self.n // lane) * lane
        self.nr = self.npad // 128

    def to(self, x, rows: int):
        x = x.reshape((self.n, rows))
        if self.npad != self.n:
            x = jnp.concatenate(
                [x, jnp.zeros((self.npad - self.n, rows), jnp.uint32)])
        return x.T.reshape(rows, self.nr, 128)

    def back(self, out):
        return out.reshape(8, self.npad).T[:self.n].reshape(self.lead + (8,))


@functools.partial(jax.jit, static_argnames=("vw", "levels", "interpret",
                                             "sub_tile"))
def _leaf_walk_t(value_t, sibling_t, witness_t, tidx, vw: int, levels: int,
                 interpret: bool = False, sub_tile: int = SUB_TILE):
    nr = value_t.shape[1]
    return _tile_call(_make_leaf_walk_kernel(vw, levels),
                      (value_t, sibling_t, witness_t, tidx),
                      (vw, vw, max(levels, 1) * 8, 1), nr, sub_tile,
                      interpret)


@functools.partial(jax.jit, static_argnames=("levels", "interpret",
                                             "sub_tile"))
def _chain_t(h_t, witness_t, tidx, levels: int, interpret: bool = False,
             sub_tile: int = SUB_TILE):
    nr = h_t.shape[1]
    return _tile_call(_make_chain_kernel(levels),
                      (h_t, witness_t, tidx),
                      (8, max(levels, 1) * 8, 1), nr, sub_tile, interpret)


def walk_leaf_levels(value_words, sibling_words, witness_words, tree_index,
                     levels: int, interpret: bool = False):
    """Leaf hash + the first `levels` witness levels of a RECTANGULAR group.

    value/sibling [..., vw]; witness_words [..., >=levels, 8]; tree_index
    [...] the 2^(w+2)+permuted start index.  Returns the [..., 8] digests
    after `levels` halvings past the leaf (caller continues with
    ti >> (levels+1))."""
    lead = value_words.shape[:-1]
    vw = value_words.shape[-1]
    t = _Tiler(lead, SUB_TILE)
    wit = witness_words[..., :levels, :] if levels else (
        jnp.zeros(lead + (1, 8), jnp.uint32))
    out = _leaf_walk_t(
        t.to(value_words, vw), t.to(sibling_words, vw),
        t.to(wit.reshape(lead + (-1,)), max(levels, 1) * 8),
        t.to(tree_index.reshape(lead + (1,)).astype(jnp.uint32), 1),
        vw=vw, levels=levels, interpret=interpret, sub_tile=SUB_TILE)
    return t.back(out)


def chain_levels(h, witness_words, tree_index, levels: int,
                 interpret: bool = False):
    """`levels` witness levels from running digests h [..., 8]; tree_index is
    the CURRENT (already-halved) index.  Returns the [..., 8] digests."""
    lead = h.shape[:-1]
    t = _Tiler(lead, SUB_TILE)
    wit = witness_words[..., :levels, :] if levels else (
        jnp.zeros(lead + (1, 8), jnp.uint32))
    out = _chain_t(
        t.to(h, 8), t.to(wit.reshape(lead + (-1,)), max(levels, 1) * 8),
        t.to(tree_index.reshape(lead + (1,)).astype(jnp.uint32), 1),
        levels=levels, interpret=interpret, sub_tile=SUB_TILE)
    return t.back(out)


@functools.partial(jax.jit,
                   static_argnames=("vw", "max_depth", "interpret", "sub_tile"))
def _walk_t(value_t, sibling_t, witness_t, tidx, depth, vw: int,
            max_depth: int, interpret: bool = False,
            sub_tile: int = SUB_TILE):
    """Word-major fused walk on [rows, N/128, 128] operands: returns the
    final digests [8, N/128, 128]."""
    nr = value_t.shape[1]
    if nr % sub_tile:
        raise ValueError(f"rows={nr} must be a sub_tile multiple")
    grid = (nr // sub_tile,)

    def spec(rows):
        return pl.BlockSpec((rows, sub_tile, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_walk_kernel(vw, max_depth),
        out_shape=jax.ShapeDtypeStruct((8, nr, 128), jnp.uint32),
        grid=grid,
        in_specs=[spec(vw), spec(vw), spec(max_depth * 8), spec(1), spec(1)],
        out_specs=spec(8),
        interpret=interpret,
    )(value_t, sibling_t, witness_t, tidx, depth)


def walk_branches(value_words, sibling_words, witness_words, tree_index,
                  depth, interpret: bool = False, sub_tile: int | None = None):
    """Fused leaf-hash + witness walk.

    value_words/sibling_words: [..., vw] uint32; witness_words
    [..., max_depth, 8]; tree_index [...] uint32 (the POST-permutation
    2^(w+2)+idx start index); depth [...] uint32 broadcastable.  Returns the
    final [..., 8] digests (compare against the root outside).
    """
    sub_tile = sub_tile or SUB_TILE
    lane_tile = sub_tile * 128
    lead = value_words.shape[:-1]
    vw = value_words.shape[-1]
    max_depth = witness_words.shape[-2]
    depth = jnp.broadcast_to(jnp.asarray(depth, jnp.uint32), lead)
    n = int(np.prod(lead)) if lead else 1
    npad = -(-n // lane_tile) * lane_tile
    nr = npad // 128

    def flat(x, tail):
        x = x.reshape((n,) + tail)
        if npad != n:
            x = jnp.concatenate(
                [x, jnp.zeros((npad - n,) + tail, jnp.uint32)])
        return x

    def wordmajor(x, rows):
        # [N, rows] -> [rows, N/128, 128]
        return x.T.reshape(rows, nr, 128)

    v = wordmajor(flat(value_words, (vw,)), vw)
    s = wordmajor(flat(sibling_words, (vw,)), vw)
    w = flat(witness_words, (max_depth, 8)).reshape(npad, max_depth * 8)
    w = wordmajor(w, max_depth * 8)
    ti = wordmajor(flat(tree_index.reshape(lead + (1,)), (1,)), 1)
    dp = wordmajor(flat(depth.reshape(lead + (1,)), (1,)), 1)
    out = _walk_t(v, s, w, ti, dp, vw=vw, max_depth=max_depth,
                  interpret=interpret, sub_tile=sub_tile)
    return out.reshape(8, npad).T[:n].reshape(lead + (8,))
