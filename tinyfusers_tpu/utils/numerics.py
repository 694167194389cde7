"""Numerics checking (SURVEY §5: the TPU answer to the reference's
"correctness via serialization" sync calls is deterministic jit plus
explicit numeric validation)."""
from __future__ import annotations

import contextlib
from typing import Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Trap NaNs at op granularity inside the scope (recompiles)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn):
    """Wrap a jittable fn with checkify so NaN/inf/div errors surface as
    returned errors instead of silent garbage: err, out = checked(f)(...);
    err.throw() raises with location info."""
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)


def tree_finite_report(tree) -> Tuple[bool, dict]:
    """(all_finite, {path: bad_count}) over a pytree of arrays."""
    bad = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            n = int(jnp.sum(~jnp.isfinite(leaf)))
            if n:
                bad[jax.tree_util.keystr(path)] = n
    return not bad, bad
