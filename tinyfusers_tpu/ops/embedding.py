"""Embedding lookup.

The reference implements embedding as a host-built one-hot matrix times the
weight via cublasSgemm (ff/embedding.py:6-23) — a deliberate inefficiency.
On TPU the idiomatic op is a gather (`jnp.take`), which XLA lowers to an
efficient dynamic-gather; no host round-trip, no O(vocab) FLOPs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def embedding(ids: jax.Array, weight: jax.Array) -> jax.Array:
    """ids (...,) int -> (..., dim) rows of weight (vocab, dim)."""
    return jnp.take(weight, ids.astype(jnp.int32), axis=0)
