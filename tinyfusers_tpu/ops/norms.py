"""Normalization ops (LayerNorm, GroupNorm).

Replaces the reference's per-call cuDNN layernorm graph builds
(ff/layer_norm.py:8-32) and its unfused CuPy group_norm with an explicit
deviceSynchronize in the hot path (ff/group_norm.py:3-11). Here both are
plain jnp expressions that XLA fuses into one or two VPU passes;
statistics are accumulated in float32 regardless of the activation dtype.

Layout note: activations are NHWC (TPU-native). GroupNorm groups are over
the channel (last) axis; group g covers channels [g*C/G, (g+1)*C/G), the
same element sets as the reference's NCHW (N, G, C/G*H*W) grouping.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(
    x: jax.Array,
    weight: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm over the last axis, fp32 statistics."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def group_norm(
    x: jax.Array,
    num_groups: int,
    weight: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    *,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over channels-last input (..., C), fp32 statistics.

    Matches reference ff/group_norm.py semantics: per-(sample, group)
    mean/variance over all spatial positions and the group's channels,
    normalize, then affine scale/shift per channel.

    Under the fast-accum policy (ops/policy.py) the reductions still run
    in fp32 (tiny outputs) but the big elementwise normalize runs in the
    input dtype — halves the activation traffic of each norm.
    """
    from .policy import fast_accum

    dtype = x.dtype
    orig_shape = x.shape
    n = orig_shape[0]
    c = orig_shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    xg = x.reshape(n, -1, num_groups, c // num_groups)
    xf = xg.astype(jnp.float32)
    # Reduce over spatial (axis 1) and within-group channels (axis 3).
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    if fast_accum() and dtype != jnp.float32:
        y = (xg - mean.astype(dtype)) * rstd.astype(dtype)
        y = y.reshape(orig_shape)
        if weight is not None:
            y = y * weight.astype(dtype)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y
    y = (xf - mean) * rstd
    y = y.reshape(orig_shape)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
