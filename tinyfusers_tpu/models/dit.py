"""Diffusion Transformer (DiT-style) backbone.

Covers the BASELINE "SD3 / DiT-style transformer backbone" config family:
a latent-space transformer denoiser (patchify -> N identical blocks with
adaLN-Zero modulation -> unpatchify), replacing the UNet. No reference
analog (the reference is UNet-only); designed TPU-first:

- all blocks identical -> ONE stacked param tree + lax.scan (one compiled
  block body regardless of depth);
- tokens = (H/p * W/p) per image; attention uses ops.sdpa so the Pallas
  flash kernel engages at large token counts (e.g. 1024-px latents);
- conditioning = timestep embedding (+ optional class label and/or
  pooled-text vector) through one MLP; per-block modulation params are
  produced by a single fused linear (6 chunks: shift/scale/gate x 2).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .. import ops
from ..utils import init as pinit
from .unet import timestep_embedding


@dataclass(frozen=True)
class DiTConfig:
    input_size: int = 32          # latent H = W
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 4
    dim: int = 1152               # DiT-XL/2
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: int = 4
    num_classes: int = 0          # >0: class-conditional (label embedding)
    cond_dim: int = 0             # >0: external cond vector (pooled text)

    @property
    def num_tokens(self) -> int:
        return (self.input_size // self.patch_size) ** 2


DIT_XL_2 = DiTConfig()
TINY_DIT = DiTConfig(input_size=8, patch_size=2, dim=64, depth=2, num_heads=4)


def _block_init(key, cfg: DiTConfig, dtype):
    ks = jax.random.split(key, 6)
    d = cfg.dim
    return {
        # adaLN-Zero: modulation projection initialized to zero so each
        # block starts as identity (gates = 0).
        "mod": {
            "weight": jnp.zeros((d, 6 * d), dtype),
            "bias": jnp.zeros((6 * d,), dtype),
        },
        "attn": {
            "qkv": pinit.linear_params(ks[0], d, 3 * d, dtype=dtype),
            "proj": pinit.linear_params(ks[1], d, d, dtype=dtype),
        },
        "mlp": {
            "fc1": pinit.linear_params(ks[2], d, cfg.mlp_ratio * d, dtype=dtype),
            "fc2": pinit.linear_params(ks[3], cfg.mlp_ratio * d, d, dtype=dtype),
        },
    }


def _pos_embed_2d(tokens_per_side: int, dim: int) -> jnp.ndarray:
    """Fixed 2D sin-cos position embedding (DiT uses non-learned)."""
    def _1d(pos, d):
        omega = jnp.exp(
            -math.log(10000.0) * jnp.arange(d // 2, dtype=jnp.float32) / (d // 2)
        )
        out = pos[:, None] * omega[None, :]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)

    coords = jnp.arange(tokens_per_side, dtype=jnp.float32)
    emb_h = _1d(coords, dim // 2)  # (n, dim/2)
    emb_w = _1d(coords, dim // 2)
    grid = jnp.concatenate(
        [
            jnp.repeat(emb_h, tokens_per_side, axis=0),
            jnp.tile(emb_w, (tokens_per_side, 1)),
        ],
        axis=-1,
    )
    return grid  # (n*n, dim)


def init(key: jax.Array, cfg: DiTConfig = DIT_XL_2, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    p = cfg.patch_size
    params = {
        "patch_embed": pinit.conv_params(ks[0], cfg.in_channels, cfg.dim, p, dtype=dtype),
        "time_mlp": {
            "fc1": pinit.linear_params(ks[1], 256, cfg.dim, dtype=dtype),
            "fc2": pinit.linear_params(ks[2], cfg.dim, cfg.dim, dtype=dtype),
        },
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[
                _block_init(jax.random.fold_in(ks[3], i), cfg, dtype)
                for i in range(cfg.depth)
            ],
        ),
        "final": {
            "mod": {
                "weight": jnp.zeros((cfg.dim, 2 * cfg.dim), dtype),
                "bias": jnp.zeros((2 * cfg.dim,), dtype),
            },
            "proj": {
                "weight": jnp.zeros(
                    (cfg.dim, p * p * cfg.out_channels), dtype
                ),
                "bias": jnp.zeros((p * p * cfg.out_channels,), dtype),
            },
        },
    }
    if cfg.num_classes:
        params["label_embed"] = pinit.embedding_params(
            ks[4], cfg.num_classes + 1, cfg.dim, dtype  # +1: null class for CFG
        )
    if cfg.cond_dim:
        params["cond_proj"] = pinit.linear_params(ks[5], cfg.cond_dim, cfg.dim, dtype=dtype)
    return params


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def split_fused_qkv(qkv: jax.Array, num_heads: int):
    """(B, T, 3*D) fused projection -> q, k, v each (B, T, H, hd) (bshd).

    The fused weight's output axis is laid out HEAD-INTERLEAVED —
    ``[h0:(q,k,v) | h1:(q,k,v) | ...]`` — not torch's ``[q | k | v]``
    (checkpoint mappers permute at load, io/state_map.py). TPU-first
    rationale: column-sharding the fused projection over the ``model``
    mesh axis then puts *whole heads* on each device (the reshape below
    splits the sharded axis with the head factor major, which GSPMD
    represents without any resharding), so TP attention runs entirely
    local and the only collective is the all-reduce after the
    row-parallel output projection (parallel/sharding.py).

    The heads axis is left IN PLACE (bshd) — slicing the interleaved
    q/k/v out of axis 3 costs a strided read XLA fuses into the consumer,
    and downstream attention (ops.sdpa layout='bshd') never materializes
    a (B,H,T,hd) relayout.
    """
    b, t, d3 = qkv.shape
    hd = d3 // (3 * num_heads)
    qkv = qkv.reshape(b, t, num_heads, 3, hd)
    return qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]


def _block(p, x, c, cfg: DiTConfig):
    """x (B, T, D); c (B, D) conditioning."""
    b, t, d = x.shape
    mod = ops.linear(ops.silu(c), p["mod"]["weight"], p["mod"]["bias"])
    sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)

    h = ops.layer_norm(x)  # adaLN: no learned affine
    h = _modulate(h, sh1, sc1)
    qkv = ops.linear(h, p["attn"]["qkv"]["weight"], p["attn"]["qkv"]["bias"])
    q, k, v = split_fused_qkv(qkv, cfg.num_heads)
    if ops.packed_beneficial(t, t, d, cfg.num_heads,
                             jnp.dtype(x.dtype).itemsize):
        a = ops.sdpa_packed(  # (B,T,D) channel-packed in and out
            q.reshape(b, t, d), k.reshape(b, t, d), v.reshape(b, t, d),
            heads=cfg.num_heads)
    else:
        a = ops.sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                     v.transpose(0, 2, 1, 3))
        a = a.transpose(0, 2, 1, 3).reshape(b, t, d)
    a = ops.linear(a, p["attn"]["proj"]["weight"], p["attn"]["proj"]["bias"])
    x = x + g1[:, None, :] * a

    h = ops.layer_norm(x)
    h = _modulate(h, sh2, sc2)
    h = ops.linear(h, p["mlp"]["fc1"]["weight"], p["mlp"]["fc1"]["bias"])
    h = ops.gelu_tanh(h)
    h = ops.linear(h, p["mlp"]["fc2"]["weight"], p["mlp"]["fc2"]["bias"])
    return x + g2[:, None, :] * h


def apply(
    params,
    x: jax.Array,
    timesteps: jax.Array,
    cfg: DiTConfig = DIT_XL_2,
    *,
    labels: Optional[jax.Array] = None,
    cond: Optional[jax.Array] = None,
) -> jax.Array:
    """x (B, H, W, C) NHWC latents -> noise prediction, same shape.

    labels (B,) int class ids (num_classes = null/unconditional);
    cond (B, cond_dim) external vector conditioning."""
    b, h, w, _ = x.shape
    p = cfg.patch_size
    tokens = ops.conv2d(
        x, params["patch_embed"]["weight"], params["patch_embed"]["bias"],
        stride=p,
    ).reshape(b, -1, cfg.dim)
    tokens = tokens + _pos_embed_2d(h // p, cfg.dim).astype(tokens.dtype)

    t_emb = timestep_embedding(timesteps, 256).astype(x.dtype)
    c = ops.linear(t_emb, params["time_mlp"]["fc1"]["weight"], params["time_mlp"]["fc1"]["bias"])
    c = ops.linear(ops.silu(c), params["time_mlp"]["fc2"]["weight"], params["time_mlp"]["fc2"]["bias"])
    if cfg.num_classes:
        assert labels is not None
        c = c + ops.embedding(labels, params["label_embed"]["weight"])
    if cfg.cond_dim:
        assert cond is not None
        c = c + ops.linear(
            cond.astype(x.dtype), params["cond_proj"]["weight"], params["cond_proj"]["bias"]
        )

    def body(carry, bp):
        return _block(bp, carry, c, cfg), None

    tokens, _ = jax.lax.scan(body, tokens, params["blocks"])

    mod = ops.linear(
        ops.silu(c), params["final"]["mod"]["weight"], params["final"]["mod"]["bias"]
    )
    shift, scale = jnp.split(mod, 2, axis=-1)
    tokens = _modulate(ops.layer_norm(tokens), shift, scale)
    out = ops.linear(tokens, params["final"]["proj"]["weight"], params["final"]["proj"]["bias"])
    # unpatchify: (B, h/p * w/p, p*p*C) -> (B, H, W, C)
    hp, wp = h // p, w // p
    out = out.reshape(b, hp, wp, p, p, cfg.out_channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, cfg.out_channels)
    return out
