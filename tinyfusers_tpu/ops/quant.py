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


@jax.tree_util.register_pytree_node_class
class Int4Tensor:
    """Packed INT4 weight-only container (BASELINE config 5, stretch).

    Two 4-bit values per uint8 byte, packed pairwise along ``axis`` (the
    contraction/input-channel axis), with symmetric per-group fp32 scales
    (``group_size`` input channels share one scale, per every other
    coordinate). Halves weight HBM footprint/traffic vs int8; dequant is
    a nibble unpack + scale multiply fused into the consumer's matmul
    epilogue region by XLA.
    """

    def __init__(self, packed: jax.Array, scales: jax.Array, *, axis: int,
                 group_size: int, orig_dim: int):
        self.packed = packed      # uint8, axis dim = orig_dim // 2
        self.scales = scales      # fp32,  axis dim = orig_dim // group_size
        self.axis = axis
        self.group_size = group_size
        self.orig_dim = orig_dim

    def tree_flatten(self):
        return (self.packed, self.scales), (self.axis, self.group_size,
                                            self.orig_dim)

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scales = children
        axis, group_size, orig_dim = aux
        return cls(packed, scales, axis=axis, group_size=group_size,
                   orig_dim=orig_dim)

    @property
    def shape(self):
        s = list(self.packed.shape)
        s[self.axis] = self.orig_dim
        return tuple(s)

    @property
    def ndim(self):
        return self.packed.ndim

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        ax = self.axis % self.packed.ndim
        lo = (self.packed & 0xF).astype(jnp.int8)
        hi = (self.packed >> 4).astype(jnp.int8)
        lo = jnp.where(lo > 7, lo - 16, lo)
        hi = jnp.where(hi > 7, hi - 16, hi)
        q = jnp.stack([lo, hi], axis=ax + 1)  # (..., K/2, 2, ...)
        shape = self.shape
        q = q.reshape(shape).astype(jnp.float32)
        g = self.group_size
        grouped = shape[:ax] + (shape[ax] // g, g) + shape[ax + 1:]
        q = q.reshape(grouped) * jnp.expand_dims(self.scales, ax + 1)
        return q.reshape(shape).astype(dtype)


def quantize_int4(w: jax.Array, axis: int = 0,
                  group_size: int = 64) -> Int4Tensor:
    """Symmetric per-group INT4 quantization, packed along ``axis``.

    ``axis`` should be the contraction (input-channel) axis so each scale
    group shares one dequant multiply: axis=0 for (in, out) linear
    weights, axis=2 for HWIO conv weights. group_size is clipped to the
    axis length; the axis length must be even and divisible by the
    effective group size.
    """
    w = w.astype(jnp.float32)
    ax = axis % w.ndim
    k = w.shape[ax]
    if k % 2:
        raise ValueError(f"int4 pack axis must be even, got {k}")
    g = min(group_size, k)
    while k % g:
        g //= 2
    grouped = w.shape[:ax] + (k // g, g) + w.shape[ax + 1:]
    wg = w.reshape(grouped)
    absmax = jnp.max(jnp.abs(wg), axis=ax + 1)  # (..., K/g, ...)
    scale = jnp.maximum(absmax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wg / jnp.expand_dims(scale, ax + 1)), -7.0, 7.0)
    q = q.reshape(w.shape).astype(jnp.int8)
    pairs = w.shape[:ax] + (k // 2, 2) + w.shape[ax + 1:]
    qp = q.reshape(pairs)
    lo = jnp.take(qp, 0, axis=ax + 1)
    hi = jnp.take(qp, 1, axis=ax + 1)
    packed = ((lo & 0xF) | (hi << 4)).astype(jnp.uint8)
    return Int4Tensor(packed, scale, axis=ax, group_size=g, orig_dim=k)


def is_quantized(x) -> bool:
    return isinstance(x, (QuantizedTensor, Int4Tensor))
