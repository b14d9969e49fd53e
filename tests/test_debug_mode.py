"""STARK_DEBUG=1 sanitizer mode (SURVEY.md section 5): limb-normalization
invariants and index bounds become checkify assertions baked into the graph;
violations raise host-side.  Off by default with zero graph overhead."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stark_verifier_tpu import debug, fp
from stark_verifier_tpu.ops import field


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("STARK_DEBUG", raising=False)
    assert not debug.enabled()
    # checked() is the identity when disabled
    f = lambda x: x
    assert debug.checked(f) is f


def test_limb_invariant_check_fires(monkeypatch):
    """A denormalized limb (>= 2^16) fed to add_mod must raise in debug
    mode -- silently corrupting neighbouring limbs otherwise."""
    monkeypatch.setenv("STARK_DEBUG", "1")
    good = jnp.asarray(fp.int_to_limbs(12345))
    bad = good.at[3].set(jnp.uint32(0x2000F))      # limb >= 2^16

    fn = debug.checked(jax.jit(field.add_mod))
    out = np.asarray(fn(good, good))               # clean inputs: fine
    assert fp.limbs_to_int(out) == 24690
    with pytest.raises(Exception, match="limb invariant"):
        fn(good, bad)


def test_index_bounds_check_fires(monkeypatch):
    monkeypatch.setenv("STARK_DEBUG", "1")

    def gather(idx):
        debug.check_bounds(idx, 16, "test gather")
        return idx

    fn = debug.checked(jax.jit(gather))
    np.asarray(fn(jnp.arange(4, dtype=jnp.uint32)))
    with pytest.raises(Exception, match="out of bounds"):
        fn(jnp.asarray([3, 99], dtype=jnp.uint32))


def test_checks_absent_when_disabled(monkeypatch):
    """The compiled graph carries no checks when STARK_DEBUG is unset: the
    same denormalized input silently wraps instead of raising (documented
    contract -- canonical inputs are the caller's invariant)."""
    monkeypatch.delenv("STARK_DEBUG", raising=False)
    good = jnp.asarray(fp.int_to_limbs(1))
    bad = good.at[3].set(jnp.uint32(0x2000F))
    field.add_mod(good, bad)                       # no raise
