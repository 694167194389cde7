"""Dense layers.

Replaces the reference's three GEMM paths — cuDNN pygraph, cublasSgemm_v2
with a separate add_bias kernel, and batched cublas (reference
ff/linear.py:8-110) — with a single jnp matmul that XLA tiles onto the MXU
and fuses the bias add into. Weights are stored **(in_features,
out_features)** so `x @ w` needs no transpose (checkpoint weights, which
are (out, in) torch-style, are transposed once at load time).

Quantized weights (ops/quant.QuantizedTensor) are consumed by applying the
per-output-channel scale to the matmul output — mathematically identical to
dequantize-then-matmul, but the MXU sees a plain dense matmul and XLA fuses
the scale+bias epilogue. The Pallas fused kernel (kernels/quant_matmul.py)
replaces this on TPU for the hot shapes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .policy import accum_dtype
from .quant import Int4Tensor, QuantizedTensor


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def linear(
    x: jax.Array,
    w,
    b: Optional[jax.Array] = None,
    *,
    compute_dtype=None,
) -> jax.Array:
    """y = x @ w + b with w of shape (in, out).

    ``w`` may be a jax.Array or a QuantizedTensor quantized along the
    output axis (axis=-1).
    """
    if compute_dtype is None:
        compute_dtype = x.dtype
    acc = accum_dtype(compute_dtype)
    if isinstance(w, Int4Tensor):
        from .policy import quant_kernel

        if (quant_kernel() and w.packed.ndim == 2 and w.axis == 0
                and _on_tpu()):
            from ..kernels.quant_matmul import quant_matmul_int4

            return quant_matmul_int4(x.astype(compute_dtype), w, b)
        # XLA fallback: unpack+scale in-graph (XLA keeps the packed bytes
        # as the HBM-resident form), then a plain dense matmul.
        w = w.dequantize(compute_dtype)
    if isinstance(w, QuantizedTensor):
        from .policy import quant_kernel

        if quant_kernel() and w.values.ndim == 2 and _on_tpu():
            from ..kernels.quant_matmul import quant_matmul

            return quant_matmul(x.astype(compute_dtype), w, b)
        y = jnp.dot(
            x.astype(compute_dtype),
            w.values.astype(compute_dtype),
            preferred_element_type=acc,
        )
        # scales shape (1, out) -> broadcast over leading dims of y.
        y = y * w.scales.reshape((1,) * (y.ndim - 1) + (-1,)).astype(acc)
    else:
        y = jnp.dot(
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            preferred_element_type=acc,
        )
    if b is not None:
        y = y + b.astype(acc)
    return y.astype(compute_dtype)


def geglu_linear(
    gx: jax.Array,
    gate: jax.Array,
    w,
    b: Optional[jax.Array] = None,
    *,
    compute_dtype=None,
) -> jax.Array:
    """The transformer FF tail: (gx * gelu_erf(gate)) @ w + b.

    Dispatches to the Pallas fused kernel (kernels/geglu_ff.py) on TPU
    when the measured policy enables it (ops.policy.ff_kernel); falls
    back to ops.geglu + linear (XLA fuses the GELU into the GEMM feed).
    Only plain (non-quantized) 2D weights take the kernel path.
    """
    from .activations import geglu
    from .policy import ff_kernel

    if (ff_kernel() and _on_tpu() and isinstance(w, jax.Array)
            and w.ndim == 2):
        from ..kernels.geglu_ff import geglu_matmul_diff

        if compute_dtype is None:
            compute_dtype = gx.dtype
        if b is None:
            b = jnp.zeros((w.shape[1],), jnp.float32)
        return geglu_matmul_diff(gx.astype(compute_dtype),
                                 gate.astype(compute_dtype),
                                 w.astype(compute_dtype), b)
    return linear(geglu(gx, gate), w, b, compute_dtype=compute_dtype)
