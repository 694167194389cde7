"""Pallas fused dequant-matmul: y = (x @ w_q) * scales + b.

Weight-only INT8/FP8 GEMM where dequantization never touches HBM — the
packed weight tile is cast inside VMEM and the per-output-channel scale
is applied in the epilogue on the accumulator (replaces the reference's
cublasSgemm + separate add_bias kernel pair, ff/linear.py:82-110 +
native/cuda/add_bias_func.cu, and implements the BASELINE north-star
"dequant fused into every matmul").

Grid (m, n, k) with k innermost (sequential on TPU): fp32 accumulator
lives in VMEM scratch across k steps; scales/bias applied at the last k
step. The XLA fallback in ops/linear.py remains the dispatch default on
non-TPU backends.

``quant_matmul_int4`` is the INT4 sibling: weights arrive as packed
nibble pairs (two input-channel rows per uint8 byte) with per-group
scales along the contraction axis, so HBM weight traffic is halved vs
int8. Per-group scales can't ride the epilogue (they vary along K), so
the kernel unpacks + scales the weight tile inside VMEM right before
each MXU call.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.quant import Int4Tensor, QuantizedTensor


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *, nk: int,
            compute_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:].astype(compute_dtype)  # dequant cast inside VMEM
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        y = acc_ref[:] * s_ref[:].astype(jnp.float32)
        y = y + b_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


def _pad(x, axis, mult):
    p = (-x.shape[axis]) % mult
    if p == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, p)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret"))
def quant_matmul(
    x: jax.Array,
    w: QuantizedTensor,
    b: Optional[jax.Array] = None,
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x (..., K) @ quantized w (K, N) -> (..., N) in x.dtype."""
    *lead, kdim = x.shape
    n = w.values.shape[1]
    x2 = x.reshape(-1, kdim)
    m = x2.shape[0]

    bm = min(block_m, max(8, m))
    bn = min(block_n, max(128, n))
    bk = min(block_k, max(128, kdim))
    x2 = _pad(_pad(x2, 0, bm), 1, bk)
    wv = _pad(_pad(w.values, 0, bk), 1, bn)
    scales = _pad(w.scales.reshape(1, -1), 1, bn)
    bias = (b.reshape(1, -1) if b is not None
            else jnp.zeros((1, n), jnp.float32))
    bias = _pad(bias, 1, bn)

    grid = (x2.shape[0] // bm, wv.shape[1] // bn, x2.shape[1] // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, nk=grid[2], compute_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], wv.shape[1]), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x2, wv, scales, bias)
    return out[:m, :n].reshape(*lead, n)


def _int4_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *, nk: int,
                 group_size: int, compute_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                       # (bm, bk)
    packed = w_ref[:].astype(jnp.int32)  # (bk//2, bn), nibble pairs
    # 4-bit two's-complement decode: ((v & 0xF) ^ 8) - 8 (values in [-7,7]).
    lo = ((packed & 0xF) ^ 8) - 8
    hi = (((packed >> 4) & 0xF) ^ 8) - 8
    half, bn = packed.shape
    # Rows were packed pairwise along K: byte r holds rows (2r, 2r+1).
    w = jnp.stack([lo, hi], axis=1).reshape(2 * half, bn).astype(jnp.float32)
    # Per-group scales vary along K -> apply to the weight tile pre-MXU.
    s = s_ref[:].astype(jnp.float32)   # (bk//g, bn)
    s = jnp.broadcast_to(s[:, None, :], (s.shape[0], group_size, bn))
    w = w * s.reshape(2 * half, bn)
    acc_ref[:] += jax.lax.dot_general(
        x, w.astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] + b_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret"))
def quant_matmul_int4(
    x: jax.Array,
    w: Int4Tensor,
    b: Optional[jax.Array] = None,
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x (..., K) @ int4-packed w (K, N) -> (..., N) in x.dtype.

    ``w`` must be packed along axis 0 (the contraction axis) — the layout
    ``ops.quant.quantize_int4(w, axis=0)`` produces for (in, out) linear
    weights. The packed bytes are the HBM-resident form; nibbles are
    unpacked and group-scaled inside VMEM.
    """
    if w.axis != 0 or w.packed.ndim != 2:
        raise ValueError("quant_matmul_int4 wants a 2D weight packed on "
                         f"axis 0, got axis={w.axis} ndim={w.packed.ndim}")
    *lead, kdim = x.shape
    if kdim != w.orig_dim:
        raise ValueError(f"K mismatch: x has {kdim}, w has {w.orig_dim}")
    n = w.packed.shape[1]
    g = w.group_size
    x2 = x.reshape(-1, kdim)
    m = x2.shape[0]

    bm = min(block_m, max(8, m))
    bn = min(block_n, max(128, n))
    bk = min(block_k, max(128, kdim))
    # The k block must cover whole bytes and whole scale groups.
    step = g if g % 2 == 0 else 2 * g
    bk = max(step, bk - bk % step)
    x2 = _pad(_pad(x2, 0, bm), 1, bk)
    kpad = x2.shape[1]
    wp = _pad(_pad(w.packed, 0, bk // 2), 1, bn)      # (kpad//2, bn)
    ws = _pad(_pad(w.scales, 0, bk // g), 1, bn)      # (kpad//g, bn)
    bias = (b.reshape(1, -1) if b is not None
            else jnp.zeros((1, n), jnp.float32))
    bias = _pad(bias, 1, bn)

    grid = (x2.shape[0] // bm, wp.shape[1] // bn, kpad // bk)
    out = pl.pallas_call(
        functools.partial(_int4_kernel, nk=grid[2], group_size=g,
                          compute_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bk // g, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], wp.shape[1]), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x2, wp, ws, bias)
    return out[:m, :n].reshape(*lead, n)
