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


def _gemm9_eligible(x, w, stride, pad, dilation, groups) -> bool:
    """Stride-1 3x3 convs that run faster as 9 shifted GEMMs.

    XLA's plain dot emitter tiles (M, C)x(C, O) onto the MXU better than
    its conv emitter at SD's channel-heavy shapes — measured on v5e
    (benchmarks/conv_ab.py, overhead-corrected us/call):
      (2,64,64,320):  147 -> 125   (2,32,32,640): 101 -> 69
      (2,16,16,1280): 115 -> 87    (1,128,128,512): 532 -> 410
    but the re-read of the 9 shifted input slices loses badly once the
    activation dwarfs the weights ((1,512,512,128): 892 -> 3429), hence
    the channel/spatial guards.
    """
    return (
        w.shape[:2] == (3, 3)
        and stride == (1, 1)
        and dilation == (1, 1)
        and groups == 1
        and pad == ((1, 1), (1, 1))
        and min(w.shape[2], w.shape[3]) >= 256
        and x.shape[1] * x.shape[2] <= 16384
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _conv_acc(x, w, stride, pad, dilation, groups, acc):
    """conv_general_dilated with a widened (f32) accumulator output.

    Wrapped in custom_vjp because JAX's conv transpose rule rejects the
    mixed-dtype call it would build for bf16 operands with an f32
    preferred_element_type (f32 cotangent x bf16 weight). The backward
    runs the standard same-dtype transposed convs in the operand dtype —
    ordinary mixed-precision training semantics (bf16 grads, f32 MXU
    accumulation internally).

    Eligible stride-1 3x3 convs dispatch to a 9-shifted-GEMM
    decomposition (see _gemm9_eligible); every tap contracts in fp32 on
    the MXU and taps are summed in fp32, so accumulation quality matches
    the conv emitter (reassociated, not bit-identical)."""
    from .policy import conv_gemm

    if (
        conv_gemm()
        and w.shape[:2] == (1, 1)
        and stride == (1, 1)
        and pad == ((0, 0), (0, 0))
        and groups == 1
    ):
        # 1x1 conv is exactly a per-pixel GEMM; the dot emitter beats the
        # conv emitter at the VAE's (1,128,128,512) projections (58 -> 36
        # us overhead-corrected) and matches it elsewhere. Accumulate in
        # `acc` (not unconditionally f32) so the fast-accum policy's
        # halved-activation-traffic intent survives on this route too.
        return jnp.einsum(
            "nhwc,co->nhwo", x, w[0, 0], preferred_element_type=acc
        )
    if conv_gemm() and _gemm9_eligible(x, w, stride, pad, dilation, groups):
        n, h, wd, _ = x.shape
        o = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jnp.zeros((n, h, wd, o), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                y = y + jnp.einsum(
                    "nhwc,co->nhwo",
                    xp[:, dh:dh + h, dw:dw + wd, :],
                    w[dh, dw],
                    preferred_element_type=jnp.float32,
                )
        return y.astype(acc)
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
