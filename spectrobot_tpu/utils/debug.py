"""Numerical-safety helpers (SURVEY.md section 6 "race detection/sanitizers":
``jax.debug.print``/``checkify`` for NaN/OOB).

``checked(fn)`` wraps a jittable function with jax.checkify NaN/div/OOB
checks: call the wrapped function to get (error, value) and ``error.throw()``
to raise with location info.  ``assert_finite`` is a lightweight in-graph
guard for production paths (aborts with a payload instead of propagating
silent NaNs into a retrieval).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, *, errors=None) -> Callable:
    """checkify-wrap ``fn``: returns g(*a, **k) -> (error, out)."""
    sets = errors if errors is not None else (
        checkify.float_checks | checkify.index_checks)
    return checkify.checkify(fn, errors=sets)


def assert_finite(name: str, x: jnp.ndarray) -> jnp.ndarray:
    """In-graph finiteness guard: logs through jax.debug.print when any
    non-finite value appears (works under jit; zero cost when clean isn't
    required — the check itself is a cheap reduction)."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.lax.cond(
        bad,
        lambda: jax.debug.print(
            "[spectrobot_tpu] NON-FINITE values in {n}", n=name),
        lambda: None)
    return x
