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


def pseudorandom_indices(seed_words: jnp.ndarray, count: int, modulus,
                         exclude_multiples_of: int | None = None) -> jnp.ndarray:
    """seed_words: [..., 8] uint32 -> [..., count] uint32 indices.

    `modulus` may be a python int or a traced uint32 scalar (must be divisible
    by exclude_multiples_of when excluding, true for every protocol domain);
    count and the exclusion factor are static.
    """
    m = jnp.asarray(modulus, dtype=jnp.uint32)
    if exclude_multiples_of is not None:
        e = exclude_multiples_of
        real_modulus = (m // jnp.uint32(e)) * jnp.uint32(e - 1)
    else:
        real_modulus = m

    n_entries = -(-count // 8)  # 8 indices per 32-byte stream entry
    entries = [seed_words]
    cur = seed_words
    for _ in range(n_entries - 1):
        cur = blake2s.hash_chain(cur)
        entries.append(cur)
    stream = jnp.concatenate(entries, axis=-1)[..., :count]  # [..., count] words

    x = bswap32(stream) % real_modulus
    if exclude_multiples_of is not None:
        x = jnp.uint32(1) + x + x // jnp.uint32(exclude_multiples_of - 1)
    return x


pseudorandom_indices_jit = jax.jit(pseudorandom_indices,
                                   static_argnums=(1, 2, 3))
