"""Parameter initializers.

Models are pure functions over param pytrees; these helpers build the
leaves. Kaiming-uniform fan-in init matches the reference's conv init
(vision/conv2d.py:52-54); linear/embedding use standard scaled-normal.
Real checkpoints overwrite everything — init only matters for tests and
benchmarks with synthetic weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_params(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    kw, _ = jax.random.split(key)
    std = (1.0 / in_dim) ** 0.5
    p = {"weight": jax.random.normal(kw, (in_dim, out_dim), dtype) * std}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def conv_params(key, in_ch: int, out_ch: int, k: int, bias: bool = True, dtype=jnp.float32):
    kw, _ = jax.random.split(key)
    fan_in = in_ch * k * k
    bound = (6.0 / fan_in) ** 0.5
    p = {"weight": jax.random.uniform(kw, (k, k, in_ch, out_ch), dtype, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def norm_params(dim: int, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def embedding_params(key, vocab: int, dim: int, dtype=jnp.float32):
    return {"weight": jax.random.normal(key, (vocab, dim), dtype) * 0.02}
