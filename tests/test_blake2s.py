"""Device Blake2s vs hashlib.blake2s golden vectors (SURVEY.md section 4(b))."""

import hashlib
import random

import jax.numpy as jnp
import numpy as np

from stark_verifier_tpu import fp
from stark_verifier_tpu.ops import blake2s

rng = random.Random(42)


def msgs_to_words(msgs: list[bytes], nwords: int) -> jnp.ndarray:
    out = np.zeros((len(msgs), nwords * 4), dtype=np.uint8)
    for i, m in enumerate(msgs):
        out[i, :len(m)] = np.frombuffer(m, dtype=np.uint8)
    return jnp.asarray(fp.bytes_to_le_words(out))


def digest_words(msgs: list[bytes]) -> np.ndarray:
    return np.stack([
        fp.bytes_to_le_words(np.frombuffer(hashlib.blake2s(m).digest(), np.uint8))
        for m in msgs])


def rand_msgs(n, size):
    return [bytes(rng.randrange(256) for _ in range(size)) for _ in range(n)]


def test_hash_32():
    msgs = rand_msgs(33, 32) + [b"\x00" * 32, b"\xff" * 32]
    got = np.asarray(blake2s.hash_words(msgs_to_words(msgs, 8), 32))
    assert (got == digest_words(msgs)).all()


def test_hash_33():
    roots = rand_msgs(9, 32)
    for b in (1, 2, 3, 4, 0, 255):
        msgs = [r + bytes([b]) for r in roots]
        got = np.asarray(blake2s.hash_root_byte(msgs_to_words(roots, 8), b))
        assert (got == digest_words(msgs)).all()


def test_hash_64_pair():
    a = rand_msgs(17, 32)
    b = rand_msgs(17, 32)
    got = np.asarray(blake2s.hash_pair(msgs_to_words(a, 8), msgs_to_words(b, 8)))
    assert (got == digest_words([x + y for x, y in zip(a, b)])).all()


def test_hash_192_leaf():
    v = rand_msgs(7, 96)
    s = rand_msgs(7, 96)
    got = np.asarray(blake2s.hash_leaf_pair(msgs_to_words(v, 24), msgs_to_words(s, 24)))
    assert (got == digest_words([x + y for x, y in zip(v, s)])).all()


def test_multiblock_vs_hashlib_odd_sizes():
    # general multi-block path (not used by protocol but keeps hash_words honest)
    for size in (1, 63, 64, 65, 127, 128, 129, 200):
        msgs = rand_msgs(3, size)
        nwords = -(-size // 4)
        got = np.asarray(blake2s.hash_words(msgs_to_words(msgs, nwords), size))
        assert (got == digest_words(msgs)).all(), size
