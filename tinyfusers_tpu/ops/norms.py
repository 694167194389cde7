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
    """LayerNorm over the last axis, fp32 statistics.

    Single-pass moments (E[x], E[x^2] from one read of x) instead of the
    two-pass E[(x-mean)^2]: same cancellation tradeoff documented on
    group_norm below — fine at |mean|/std < ~10, which transformer
    activations satisfy. Under the fast-accum policy the big normalize
    pass runs in the input dtype; device-trace measured this at
    (2,4096,320) bf16: 3 fp32 passes -> 2 bf16-traffic passes.
    """
    from .policy import fast_accum

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    ex2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)  # same pass
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    if fast_accum() and dtype != jnp.float32:
        y = (x - mean.astype(dtype)) * rstd.astype(dtype)
        if weight is not None:
            y = y * weight.astype(dtype)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y
    y = (xf - mean) * rstd
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
    # Layout discipline: keep the big activation in its native C-minor
    # layout — reduce per-CHANNEL over spatial, then group-combine the
    # tiny (N, C) moments, instead of reshaping the activation itself to
    # (..., G, C/G) (a 10-wide minor dim for SD's C/G = 320/32, which
    # invites a lane relayout). Device-trace measured: ~12 us/call at
    # (2,64,64,320) bf16 incl. fused SiLU — HBM-bound, which is why
    # there is no Pallas groupnorm kernel (SURVEY §7.6 "if profiling
    # warrants": it does not).
    x3 = x.reshape(n, -1, c)
    xf = x3.astype(jnp.float32)
    hw = x3.shape[1]
    s1 = jnp.sum(xf, axis=1)                 # (N, C)
    s2 = jnp.sum(jnp.square(xf), axis=1)     # (N, C) — same pass, XLA fuses
    cpg = c // num_groups
    cnt = jnp.float32(hw * cpg)
    s1g = s1.reshape(n, num_groups, cpg).sum(-1)   # (N, G), tiny
    s2g = s2.reshape(n, num_groups, cpg).sum(-1)
    mean_g = s1g / cnt
    # Single-pass variance E[x^2]-E[x]^2 in fp32: loses precision to
    # cancellation when |mean| >> std (the max-with-0 clamp only guards
    # the sign). Accepted tradeoff for the one-pass layout win: SD/SDXL
    # activations sit at |mean|/std < ~10, where fp32 keeps >=5 good
    # digits; a two-pass or shifted accumulation would double HBM reads
    # of the big activation for no measurable output change here.
    var_g = jnp.maximum(s2g / cnt - jnp.square(mean_g), 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # Per-channel broadcast of the per-group stats (tiny (N, C) arrays).
    mean_c = jnp.repeat(mean_g, cpg, axis=1)[:, None, :]   # (N, 1, C)
    rstd_c = jnp.repeat(rstd_g, cpg, axis=1)[:, None, :]
    if fast_accum() and dtype != jnp.float32:
        y = (x3 - mean_c.astype(dtype)) * rstd_c.astype(dtype)
        y = y.reshape(orig_shape)
        if weight is not None:
            y = y * weight.astype(dtype)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y
    y = (xf - mean_c) * rstd_c
    y = y.reshape(orig_shape)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)
