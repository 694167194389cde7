"""Elementwise activations.

Semantics match the reference's Tensor static methods
(reference storage/tensor.py:64-86): ``quick_gelu`` is x*sigmoid(1.702x)
(used by CLIP MLP), ``gelu`` is the tanh approximation (used by GEGLU),
``silu``/``swish`` are x*sigmoid(x). On TPU these are VPU ops that XLA
fuses into neighbouring matmuls/convs — no custom kernels needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


# The reference's "swish" is the same function as silu (storage/tensor.py:84-86).
swish = silu


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's fast GELU: x * sigmoid(1.702 * x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """Tanh-approximated GELU (reference storage/tensor.py:80-82)."""
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608 * x * (1.0 + 0.044715 * x * x)))


def geglu(x: jax.Array, gate: jax.Array) -> jax.Array:
    """GEGLU combine: x * gelu(gate) (reference ff/nn.py:10-12)."""
    return x * gelu_tanh(gate)
