"""Quantize a param tree's matmul/conv weights in place (weight-only).

Policy: 2D linear weights (in, out) quantize per-output-channel (axis -1);
4D conv weights (H, W, I, O) per-output-channel (axis -1). Norm
weights/biases, embeddings and scalar leaves stay full precision —
norms are numerically sensitive and tiny, embeddings are gathers.

qdtype "int4" selects packed INT4 with per-group scales along the input
channel axis (ops/quant.Int4Tensor; BASELINE config 5 stretch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quant import QuantizedTensor, quantize, quantize_int4

_MIN_QUANT_SIZE = 4096  # don't bother quantizing tiny tensors


def quantize_params(params, qdtype=jnp.int8, *, group_size: int = 64):
    """Returns a tree where eligible 'weight' leaves become
    QuantizedTensor (or Int4Tensor for qdtype="int4"); structure
    otherwise unchanged."""

    def quantize_leaf(v):
        if qdtype == "int4":
            # pack along the contraction axis: 0 for (in, out) linears,
            # 2 (input channels) for HWIO convs
            axis = 0 if v.ndim == 2 else 2
            return quantize_int4(v, axis=axis, group_size=group_size)
        return quantize(v, qdtype, axis=-1)

    def visit(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k == "weight"
                    and hasattr(v, "ndim")
                    and v.ndim in (2, 4)
                    and v.size >= _MIN_QUANT_SIZE
                ):
                    out[k] = quantize_leaf(v)
                else:
                    out[k] = visit(v)
            return out
        if isinstance(node, list):
            return [visit(v) for v in node]
        if isinstance(node, tuple) and not isinstance(node, QuantizedTensor):
            return tuple(visit(v) for v in node)
        return node

    return visit(params)
