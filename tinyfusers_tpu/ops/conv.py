"""2D convolution, NHWC / HWIO (TPU-native layouts).

Replaces the reference's per-call cuDNN conv graph builds plus NCHW
fix-up transposes (vision/conv2d.py:9-46) with one
`lax.conv_general_dilated` call that XLA maps straight onto the MXU.
Supports the asymmetric padding the SD VAE encoder needs
(pad [0,1,0,1], reference vae/encoder.py:19) and grouped conv
(`feature_group_count` — the reference stored `groups` but never used it,
vision/conv2d.py:49-51).

Checkpoint conv weights are torch OIHW; io/state_map.py transposes them to
HWIO once at load time.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

PadLike = Union[int, Sequence[int]]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _conv_acc(x, w, stride, pad, dilation, groups, acc):
    """conv_general_dilated with a widened (f32) accumulator output.

    Wrapped in custom_vjp because JAX's conv transpose rule rejects the
    mixed-dtype call it would build for bf16 operands with an f32
    preferred_element_type (f32 cotangent x bf16 weight). The backward
    runs the standard same-dtype transposed convs in the operand dtype —
    ordinary mixed-precision training semantics (bf16 grads, f32 MXU
    accumulation internally)."""
    return lax.conv_general_dilated(
        x, w, stride, pad, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=acc,
    )


def _conv_acc_fwd(x, w, stride, pad, dilation, groups, acc):
    return _conv_acc(x, w, stride, pad, dilation, groups, acc), (x, w)


def _conv_acc_bwd(stride, pad, dilation, groups, acc, res, g):
    x, w = res

    def same_dtype_conv(xx, ww):
        return lax.conv_general_dilated(
            xx, ww, stride, pad, rhs_dilation=dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )

    _, vjp = jax.vjp(same_dtype_conv, x, w)
    gx, gw = vjp(g.astype(x.dtype))
    return gx, gw


_conv_acc.defvjp(_conv_acc_fwd, _conv_acc_bwd)


def _normalize_padding(padding: PadLike) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Accept int p, (ph, pw), or torch-style (top, bottom, left, right)."""
    if isinstance(padding, int):
        return ((padding, padding), (padding, padding))
    padding = tuple(padding)
    if len(padding) == 2:
        return ((padding[0], padding[0]), (padding[1], padding[1]))
    if len(padding) == 4:
        # Reference uses cuDNN [pre_h, post_h, pre_w, post_w] ordering for
        # the VAE encoder's [0,1,0,1] downsample pads.
        return ((padding[0], padding[1]), (padding[2], padding[3]))
    raise ValueError(f"bad padding {padding}")


def conv2d(
    x: jax.Array,
    w,
    b: Optional[jax.Array] = None,
    *,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: PadLike = 0,
    dilation: Union[int, Tuple[int, int]] = 1,
    groups: int = 1,
    compute_dtype=None,
) -> jax.Array:
    """NHWC conv with HWIO weights; bias added in fp32 then cast back.

    ``w`` may be a QuantizedTensor quantized per output channel, in which
    case scales are applied to the conv output (exact for per-O scaling).
    """
    from .policy import accum_dtype
    from .quant import Int4Tensor, QuantizedTensor

    if compute_dtype is None:
        compute_dtype = x.dtype
    acc = accum_dtype(compute_dtype)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    pad = _normalize_padding(padding)

    scales = None
    if isinstance(w, Int4Tensor):
        w = w.dequantize(compute_dtype)  # weight-only int4 (per-I groups)
    if isinstance(w, QuantizedTensor):
        scales = w.scales  # (1, 1, 1, O)
        w = w.values

    y = _conv_acc(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        tuple(stride), pad, tuple(dilation), groups, acc,
    )
    if scales is not None:
        y = y * scales.reshape(1, 1, 1, -1).astype(acc)
    if b is not None:
        y = y + b.astype(acc)
    return y.astype(compute_dtype)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample, NHWC.

    Same broadcast trick as reference vae/decoder.py:28-30 /
    vision/unet.py:85-89, transposed to channels-last.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
