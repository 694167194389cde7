"""Weight-only quantization containers (INT8 / FP8).

The reference has no quantization; this implements the north-star
requirement (BASELINE.json: "INT8/FP8 weight-only ... dequant fused into
every matmul/conv"). A quantized weight is a pytree of
(packed values, per-channel scales); matmuls consume it either via the
fused Pallas dequant-matmul kernel (kernels/quant_matmul.py) or the XLA
fallback here, which applies scales on the matmul *output* — exact for
per-output-channel scaling and lets the MXU see a plain dense matmul.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedTensor(NamedTuple):
    """Weight-only quantized array.

    values: int8 or float8_e4m3fn array with the logical weight shape.
    scales: float32 scales, broadcastable against ``values`` along the
            channel axis the weight was quantized over (kept as a
            keepdims axis so dequantization is `values * scales`).
    """

    values: jax.Array
    scales: jax.Array

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return (self.values.astype(jnp.float32) * self.scales).astype(dtype)


def quantize(w: jax.Array, dtype=jnp.int8, axis: int = -1) -> QuantizedTensor:
    """Symmetric per-channel quantization along ``axis``.

    ``axis`` is the channel axis that *keeps* its resolution — every other
    axis is reduced over when computing the scale. For a (in, out) linear
    weight use axis=-1 (per-output-channel) so the dequant scale can be
    folded into the matmul epilogue.
    """
    w = w.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    if dtype == jnp.int8:
        qmax = 127.0
    elif dtype == jnp.float8_e4m3fn:
        qmax = 448.0
    elif dtype == jnp.float8_e5m2:
        qmax = 57344.0
    else:
        raise ValueError(f"unsupported quant dtype {dtype}")
    scale = jnp.maximum(absmax / qmax, 1e-12)
    q = w / scale
    if dtype == jnp.int8:
        q = jnp.clip(jnp.round(q), -127.0, 127.0)
    values = q.astype(dtype)
    return QuantizedTensor(values=values, scales=scale)


def is_quantized(x) -> bool:
    return isinstance(x, QuantizedTensor)
