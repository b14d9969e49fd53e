"""Device-side static-layout deserialization: raw wire blobs -> verdicts.

For a rectangular statement family every byte offset in the serialized
proof is a COMPILE-TIME CONSTANT: the wire format
(/root/reference/src/deserializer.rs:16-144; SURVEY.md section 2.1) nests
fixed branch counts, fixed 32/96-byte values, and per-level witness depths
that are pure functions of the family geometry.  So instead of parsing on
the host (0.8 ms/proof native scan + a ~25-array H2D transfer per proof,
the round-4 system-throughput ceiling -- docs/PERF.md), upload each blob
as ONE contiguous [ceil(len/4)] uint32 row and let the device build the
proof pytree with static slices/reshapes, which XLA folds into the
verifier's own gathers.  Every wire field is 4-byte aligned (all sizes are
multiples of 32 plus u32 prefixes), so the uint32 view needs no byte
shuffling; values stay in the Blake2s LE-word view the verifier consumes.

Tag/count/size sanity becomes boolean lanes ANDed into a per-proof
`shape_ok`: a blob that is not a canonical-layout proof of this family
simply reports shape_ok=False and the caller reroutes it through the host
parser (it may still be a valid proof with non-canonical witness padding
-- verdict independence is preserved, never decided by the fast path).

Reference timing comparison point: the reference's verify time INCLUDES
deserialization (/root/reference/src/main.rs:200-204); this path is the
honest equivalent on TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import StarkConfig


class CanonicalLayout:
    """Static word-offset map of the canonical rectangular wire blob for a
    statement family, plus the device parser built from it."""

    def __init__(self, cfg: StarkConfig):
        self.cfg = cfg
        log_p = cfg.precision.bit_length() - 1
        q, s, L = cfg.fri_queries, cfg.spot_checks, cfg.fri_levels
        self.col_depths = [log_p - 2 * l - 3 for l in range(L)]
        self.poly_depths = [log_p - 2 * l - 1 for l in range(L)]
        self.main_depth = self.lin_depth = log_p - 1
        self.n_points = cfg.fri_final_domain
        if min(self.col_depths) < 1:
            raise ValueError("family too small for the canonical layout")

        off = 16                     # merkle_root[0:8] l_merkle_root[8:16]
        self.levels = []             # (tag_off, root2_off, col_group, poly_group)

        def group(n, vw, d):
            """Returns (group descriptor, words consumed)."""
            nonlocal off
            g = {"n_off": off, "start": off + 1, "n": n, "vw": vw, "d": d,
                 "rec": 1 + 2 * vw + 1 + 8 * d}
            off += 1 + n * g["rec"]
            return g

        for l in range(L):
            tag_off, root2_off = off, off + 1
            off += 9
            cg = group(q, 8, self.col_depths[l])
            pg = group(4 * q, 8, self.poly_depths[l])
            self.levels.append((tag_off, root2_off, cg, pg))
        self.points_tag_off = off
        self.points_off = off + 2
        off += 2 + 8 * self.n_points
        self.main = group(2 * s, 24, self.main_depth)
        self.lincomb = group(s, 8, self.lin_depth)
        self.words = off
        self.nbytes = 4 * off

    # -- device parser ------------------------------------------------------

    def parse(self, words: jnp.ndarray):
        """words [B, self.words] uint32 -> (proof pytree, shape_ok [B]).

        The tree has exactly the structure of proofio.device.proof_tree for
        a canonical proof (same treedef), so the standard verifier graph
        consumes it unchanged.  shape_ok ANDs every tag/count/size lane; a
        False lane means 'not a canonical blob of this family', NOT
        'invalid proof'."""
        B = words.shape[0]
        checks = []

        def eq(col, const):
            checks.append(col == jnp.uint32(const))

        def parse_group(g, depth):
            region = jax.lax.slice_in_dim(
                words, g["start"], g["start"] + g["n"] * g["rec"], axis=1
            ).reshape(B, g["n"], g["rec"])
            eq(words[:, g["n_off"]], g["n"])
            vw = g["vw"]
            checks.append((region[:, :, 0] == jnp.uint32(4 * vw)).all(axis=1))
            checks.append(
                (region[:, :, 1 + 2 * vw] == jnp.uint32(32 * depth))
                .all(axis=1))
            return {
                "value": region[:, :, 1:1 + vw],
                "sibling": region[:, :, 1 + vw:1 + 2 * vw],
                "witness": region[:, :, 2 + 2 * vw:].reshape(
                    B, g["n"], depth, 8),
                "depth": jnp.broadcast_to(jnp.uint32(depth), (B, g["n"])),
            }

        col_groups, poly_groups, root2s = [], [], []
        for l, (tag_off, root2_off, cg, pg) in enumerate(self.levels):
            eq(words[:, tag_off], 1)
            root2s.append(words[:, root2_off:root2_off + 8])
            col_groups.append(parse_group(cg, self.col_depths[l]))
            poly_groups.append(parse_group(pg, self.poly_depths[l]))
        eq(words[:, self.points_tag_off], 2)
        eq(words[:, self.points_tag_off + 1], 32 * self.n_points)
        points = words[:, self.points_off:
                       self.points_off + 8 * self.n_points].reshape(
            B, self.n_points, 8)
        main = parse_group(self.main, self.main_depth)
        lincomb = parse_group(self.lincomb, self.lin_depth)

        tree = {
            "merkle_root": words[:, 0:8],
            "l_merkle_root": words[:, 8:16],
            "fri": {
                "root2": jnp.stack(root2s, axis=1),
                "col_value": jnp.stack([g["value"] for g in col_groups], 1),
                "col_sibling": jnp.stack(
                    [g["sibling"] for g in col_groups], 1),
                "col_witness": [g["witness"] for g in col_groups],
                "col_depth": jnp.stack([g["depth"] for g in col_groups], 1),
                "poly_value": jnp.stack([g["value"] for g in poly_groups], 1),
                "poly_sibling": jnp.stack(
                    [g["sibling"] for g in poly_groups], 1),
                "poly_witness": [g["witness"] for g in poly_groups],
                "poly_depth": jnp.stack([g["depth"] for g in poly_groups], 1),
            },
            "points": points,
            "main": main,
            "lincomb": lincomb,
        }
        shape_ok = checks[0]
        for c in checks[1:]:
            shape_ok = shape_ok & c
        return tree, shape_ok

    # -- host packing -------------------------------------------------------

    def pack(self, blobs: list, out: np.ndarray | None = None):
        """Pack wire blobs into a [len(blobs) or out.shape[0], words] uint32
        batch buffer (reusable across chunks).

        Returns (buf, lens [n] int64 byte lengths).  Long blobs truncate to
        the canonical prefix (the reference tolerates trailing garbage,
        main.rs:204; strict mode reroutes lens != nbytes to the host
        parser).  Short blobs zero-pad, but callers MUST reroute every
        lens < nbytes blob to the host parser in ALL modes: the shape
        lanes usually catch truncation, except when the missing trailing
        bytes happened to be zero -- the zero-padding would silently
        reconstruct the full proof the host parser rejects as truncated."""
        n = len(blobs)
        if out is None:
            out = np.zeros((n, self.words), dtype=np.uint32)
        lens = np.zeros(n, dtype=np.int64)
        nb = self.nbytes
        for i, b in enumerate(blobs):
            ln = len(b)
            lens[i] = ln
            if ln >= nb:
                out[i] = np.frombuffer(b, dtype="<u4", count=self.words)
            else:
                out[i, :] = 0
                lw = ln // 4
                out[i, :lw] = np.frombuffer(b, dtype="<u4", count=lw)
                rem = ln - 4 * lw
                if rem:
                    tail = b[4 * lw:] + b"\x00" * (4 - rem)
                    out[i, lw] = np.frombuffer(tail, dtype="<u4", count=1)[0]
        return out, lens


@functools.lru_cache(maxsize=8)
def canonical_layout(cfg: StarkConfig) -> CanonicalLayout:
    return CanonicalLayout(cfg)


def make_blob_verifier(cfg: StarkConfig | None = None, inp: int = 3):
    """Jitted end-to-end fn(words [B, layout.words]) -> (verdict [B],
    shape_ok [B]): device-side deserialization fused into the verifier
    graph.  verdict is already ANDed with shape_ok; callers MUST reroute
    through the host parser (a) shape_ok=False rows (may be
    non-canonical-but-valid proofs), (b) every row whose blob was SHORTER
    than layout.nbytes regardless of shape_ok (pack()'s zero padding can
    silently reconstruct a truncated proof whose missing tail bytes were
    zero -- the host parser rejects it as truncated), and (c) under
    strict cfg, every row with length != layout.nbytes (trailing bytes
    are invisible to the packed prefix).  Memoized like make_verifier
    (fresh closures would recompile ~4-min graphs)."""
    return _make_blob_verifier_cached(cfg or StarkConfig(), inp)


@functools.lru_cache(maxsize=8)
def _make_blob_verifier_cached(cfg: StarkConfig, inp: int):
    from ..protocol import verify as V
    lay = canonical_layout(cfg)
    inner, _tables = V.make_verifier(cfg, inp, shared_merkle=True)

    @jax.jit
    def fn(words):
        tree, shape_ok = lay.parse(words)
        return inner(tree) & shape_ok, shape_ok

    return fn, lay
