"""Fiat-Shamir pseudorandom index derivation, batched on device.

Replicates the reference PRG bit-for-bit (reference: /root/reference/src/
utils.rs:53-94; quirk list SURVEY.md section 2.2.2):

  * the seed (a Merkle root) is used raw as the first 32 bytes of the stream
    -- it is NOT hashed first (utils.rs:67)
  * the stream extends by chaining Blake2s over the previous 32-byte entry
  * each index consumes 4 stream bytes read BIG-endian (utils.rs:79-85)
  * with exclude_multiples_of = e: reduce mod real_modulus = m*(e-1)/e, then
    remap x -> 1 + x + x/(e-1) to skip multiples of e (utils.rs:89-91)

The chain is sequential per seed (<= 10 links for this protocol) but runs
batched across proofs; links are unrolled statically into the jit graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import blake2s
from .field import bswap32


def chain_entries(seed_words: jnp.ndarray, n_entries: int) -> jnp.ndarray:
    """seed_words [..., 8] -> [..., n_entries, 8]: the raw seed followed by
    n_entries-1 Blake2s chain links (the seed itself is the first stream
    entry, NOT hashed first -- utils.rs:67-70).  Chains with different
    seeds batch along the leading dims: the links are sequential, so
    stacking every chain the protocol needs into one lane axis turns many
    skinny latency-bound dispatches into one per link (docs/PERF.md
    round-5 PRG note)."""
    entries = [seed_words]
    cur = seed_words
    for _ in range(n_entries - 1):
        cur = blake2s.hash_chain(cur)
        entries.append(cur)
    return jnp.stack(entries, axis=-2)


def indices_from_entries(entries: jnp.ndarray, count: int, modulus,
                         exclude_multiples_of: int | None = None) -> jnp.ndarray:
    """entries [..., n_entries, 8] (from chain_entries) -> [..., count]
    uint32 indices: 4 stream bytes per index read big-endian, reduced mod
    real_modulus = m*(e-1)/e, remapped to skip multiples of e
    (utils.rs:79-91)."""
    m = jnp.asarray(modulus, dtype=jnp.uint32)
    if exclude_multiples_of is not None:
        e = exclude_multiples_of
        real_modulus = (m // jnp.uint32(e)) * jnp.uint32(e - 1)
    else:
        real_modulus = m
    stream = entries.reshape(*entries.shape[:-2], -1)[..., :count]
    x = bswap32(stream) % real_modulus
    if exclude_multiples_of is not None:
        x = jnp.uint32(1) + x + x // jnp.uint32(exclude_multiples_of - 1)
    return x


def pseudorandom_indices(seed_words: jnp.ndarray, count: int, modulus,
                         exclude_multiples_of: int | None = None) -> jnp.ndarray:
    """seed_words: [..., 8] uint32 -> [..., count] uint32 indices.

    `modulus` may be a python int or a traced uint32 scalar (must be divisible
    by exclude_multiples_of when excluding, true for every protocol domain);
    count and the exclusion factor are static.
    """
    entries = chain_entries(seed_words, -(-count // 8))
    return indices_from_entries(entries, count, modulus, exclude_multiples_of)


pseudorandom_indices_jit = jax.jit(pseudorandom_indices,
                                   static_argnums=(1, 2, 3))
