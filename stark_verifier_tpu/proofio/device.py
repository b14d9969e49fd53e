"""Host->device staging of parsed proofs: pytrees + batch stacking.

A proof becomes a nested dict of uint32 arrays (the Blake2s word view only;
field-limb views are derived on device, see ops.field.words_be_to_limbs).
All proofs of one statement family share shapes, so a batch is the same tree
with a leading axis -- the unit the verifier vmaps/shards over.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .wire import ProofArrays, BranchGroup


def _group_tree(g: BranchGroup) -> dict:
    return {
        "value": np.asarray(g.value_words),
        "sibling": np.asarray(g.sibling_words),
        "witness": np.asarray(g.witness_words),
        "depth": np.asarray(g.depths),      # per-branch (ragged ok)
    }


def proof_tree(p: ProofArrays) -> dict:
    """One proof -> pytree of numpy arrays (no leading batch axis).

    FRI levels are stacked along a leading level axis EXCEPT the witness
    arrays, which stay per-level lists with their exact depths (each level's
    Merkle walk scans its own depth; cross-level padding would waste ~20% of
    all Blake2s compressions).  Witness depths may be ragged per branch
    within a level (traced through to the masked Merkle walk); value sizes
    must be uniform per group -- the statement family's constraint algebra
    slices fixed trace-column layouts, and the reference's behavior on
    wrong-size values is a panic (= reject), which mapping ragged-value
    proofs to a parse reject reproduces (merkle-layer raggedness itself is
    fully supported, see ops/merkle.py + wire.BranchGroup)."""
    lv = p.fri_levels
    if not lv:
        from .wire import WireFormatError
        raise WireFormatError("proof has no FRI levels")
    for g in ([l.column for l in lv] + [l.poly for l in lv]
              + [p.main, p.lincomb]):
        if len(set(g.vsizes.tolist())) != 1:
            from .wire import WireFormatError
            raise WireFormatError(
                "ragged value sizes do not fit the statement family's "
                "fixed trace layout")
    fri = {
        "root2": np.stack([np.asarray(l.root2_words) for l in lv]),
        "col_value": np.stack([np.asarray(l.column.value_words) for l in lv]),
        "col_sibling": np.stack([np.asarray(l.column.sibling_words) for l in lv]),
        # witnesses stay per-level (lists, NOT padded to the deepest level):
        # each level's Merkle walk then scans exactly its own depth -- the
        # cross-level padding was ~20% of all Blake2s compressions
        # (docs/PERF.md omission profile)
        "col_witness": [np.asarray(l.column.witness_words) for l in lv],
        "col_depth": np.stack([np.asarray(l.column.depths) for l in lv]),
        "poly_value": np.stack([np.asarray(l.poly.value_words) for l in lv]),
        "poly_sibling": np.stack([np.asarray(l.poly.sibling_words) for l in lv]),
        "poly_witness": [np.asarray(l.poly.witness_words) for l in lv],
        "poly_depth": np.stack([np.asarray(l.poly.depths) for l in lv]),
    }
    return {
        "merkle_root": np.asarray(p.merkle_root_words),
        "l_merkle_root": np.asarray(p.l_merkle_root_words),
        "fri": fri,
        "points": np.asarray(p.points_words),
        "main": _group_tree(p.main),
        "lincomb": _group_tree(p.lincomb),
    }


def is_rectangular(tree: dict) -> bool:
    """True when every branch group's depths equal its witness array depth.

    Rectangular proofs (proof.bin and everything the bundled prover emits)
    take the shared-path Merkle walk (ops/merkle.verify_groups_shared);
    ragged proofs (per-branch witness sizes, deserializer.rs:104-119) route
    to the masked lockstep walk.  Works on single proofs and stacked batches.
    """
    def rect(depth, wit):
        return bool((np.asarray(depth) == wit.shape[-2]).all())

    fri = tree["fri"]
    return (rect(tree["main"]["depth"], tree["main"]["witness"])
            and rect(tree["lincomb"]["depth"], tree["lincomb"]["witness"])
            and all(rect(fri["col_depth"][..., l, :], w)
                    for l, w in enumerate(fri["col_witness"]))
            and all(rect(fri["poly_depth"][..., l, :], w)
                    for l, w in enumerate(fri["poly_witness"])))


def stack_proofs(trees: list) -> dict:
    """Stack single-proof trees into a batch tree with leading axis."""
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def replicate_proof(tree: dict, batch: int) -> dict:
    """Tile one proof tree to a batch (benchmarking/synthetic loads)."""
    import jax
    return jax.tree.map(
        lambda x: np.broadcast_to(x[None], (batch,) + x.shape).copy(), tree)


def to_device(tree: dict, sharding=None) -> dict:
    import jax
    if sharding is None:
        return jax.tree.map(jnp.asarray, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
