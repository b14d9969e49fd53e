"""Debug / sanitizer mode (SURVEY.md section 5, race-detection bullet).

There is nothing to data-race in pure-functional JAX; the analogue of a
sanitizer here is checking the representation invariants the kernels rely
on: every limb < 2^16 post-normalization (the carry machinery's contract --
a wide limb silently corrupts neighbouring limbs via uint32 overflow in the
next product) and gather indices in bounds.

Enabled by STARK_DEBUG=1 in the environment, read at TRACE time: the checks
are baked into the compiled graph via jax.experimental.checkify, so the
production graph carries zero overhead when disabled.  Wrap jitted entry
points with `checked(fn)`; inside kernels call `check_limbs` /
`check_bounds` (no-ops unless enabled).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enabled() -> bool:
    return os.environ.get("STARK_DEBUG", "") == "1"


def check_limbs(x: jnp.ndarray, name: str) -> None:
    """Assert every limb is a normalized 16-bit value (trace-time no-op
    unless STARK_DEBUG=1)."""
    if enabled():
        checkify.check(jnp.all(x <= jnp.uint32(0xFFFF)),
                       "limb invariant violated (>= 2^16) in " + name)


def check_bounds(idx: jnp.ndarray, n: int, name: str) -> None:
    """Assert gather indices are in [0, n)."""
    if enabled():
        checkify.check(jnp.all(idx < jnp.uint32(n)),
                       "index out of bounds in " + name)


def checked(fn):
    """Wrap a jittable function so debug-mode checks raise on violation.

    With STARK_DEBUG=1 the function is checkify-transformed and the error
    (if any) thrown host-side after execution; otherwise fn is returned
    unchanged.
    """
    if not enabled():
        return fn

    cfn = checkify.checkify(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
