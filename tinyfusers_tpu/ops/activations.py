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
    """Tanh-approximated GELU (reference storage/tensor.py:80-82; also
    what DiT / SD3-MMDiT MLPs use: nn.GELU(approximate='tanh'))."""
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608 * x * (1.0 + 0.044715 * x * x)))


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU. What real SD checkpoints were trained with in
    the UNet's GEGLU (CompVis/diffusers use torch F.gelu default = erf)
    and in OpenCLIP text towers (nn.GELU default). The reference's tanh
    shortcut (storage/tensor.py:80-82) differs by up to ~1e-3 — inside
    its own 1e-2 parity bar but a systematic error against real weights."""
    return jax.nn.gelu(x, approximate=False)


def geglu(x: jax.Array, gate: jax.Array) -> jax.Array:
    """GEGLU combine: x * gelu(gate) (reference ff/nn.py:10-12), with
    exact gelu to match real SD checkpoints (see gelu_erf)."""
    return x * gelu_erf(gate)
