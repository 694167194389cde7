"""ControlNet (Zhang et al. 2023): spatially-conditioned SD control.

A trainable copy of the UNet's encoder half (input blocks + middle, the
same config-generated plan as models/unet.py) that consumes an image-
space hint (canny edges, depth, pose, ...) and emits one residual per
UNet skip connection plus a middle-block residual. Zero-initialized 1x1
"zero convs" gate every residual, so an untrained/neutral ControlNet is
an exact no-op on the base model — pinned by test.

No reference analog (the reference is SD1.4-only inference); this is
ecosystem parity for real SD deployments. Checkpoint layout follows the
original `control_model.*` key scheme (lllyasviel/ControlNet,
cldm/cldm.py) — mapped in io/state_map.py controlnet_from_state.

TPU-first notes: the whole control branch traces into the same jitted
denoise step as the UNet (no separate dispatch); the image-resolution
hint encoder runs ONCE per generation (loop-invariant, hoisted outside
the sampling scan — pipeline/sd.py passes hint_features); residual adds
ride the existing skip-concat fusions.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import ops
from ..utils import init as pinit
from . import unet as unet_model
from .unet import UNetConfig, timestep_embedding

# Hint encoder channel ladder (cldm.py input_hint_block): 3 -> 16 -> 16
# -> 32 -> 32 -> 96 -> 96 -> 256 -> model_channels, stride 2 at each
# channel jump (256x256 hint -> 32x32 latent grid for SD1.5 at 512px...
# the hint is full image resolution, H x W, downsampled 8x like the VAE).
_HINT_LADDER = ((3, 16, 1), (16, 16, 1), (16, 32, 2), (32, 32, 1),
                (32, 96, 2), (96, 96, 1), (96, 256, 2))


def init(key: jax.Array, cfg: UNetConfig = unet_model.SD15_CONFIG,
         dtype=jnp.float32, hint_channels: int = 3):
    """Parameters for the control branch of ``cfg``'s UNet."""
    inp, mid, _ = unet_model.build_plan(cfg)
    emb_ch = cfg.model_channels * 4
    k_time, k_in, k_mid, k_hint, k_zero = jax.random.split(key, 5)

    hint: List = []
    ladder = ((hint_channels,) + _HINT_LADDER[0][1:],) + _HINT_LADDER[1:]
    for i, (cin, cout, _stride) in enumerate(ladder):
        hint.append(pinit.conv_params(
            jax.random.fold_in(k_hint, i), cin, cout, 3, dtype=dtype))
    # final zero conv of the hint encoder: 256 -> model_channels
    hint.append({
        "weight": jnp.zeros((3, 3, ladder[-1][1], cfg.model_channels), dtype),
        "bias": jnp.zeros((cfg.model_channels,), dtype),
    })

    def zero_conv(ch):
        return {"weight": jnp.zeros((1, 1, ch, ch), dtype),
                "bias": jnp.zeros((ch,), dtype)}

    # channel of the tensor leaving each input block = the skip channels
    skip_chs = _skip_channels(cfg)
    return {
        "time_embed": {
            "fc1": pinit.linear_params(
                jax.random.fold_in(k_time, 0), cfg.model_channels, emb_ch,
                dtype=dtype),
            "fc2": pinit.linear_params(
                jax.random.fold_in(k_time, 1), emb_ch, emb_ch, dtype=dtype),
        },
        "input": [
            unet_model._block_init(
                jax.random.fold_in(k_in, i), b, cfg, emb_ch, dtype)
            for i, b in enumerate(inp)
        ],
        "middle": unet_model._block_init(k_mid, mid, cfg, emb_ch, dtype),
        "input_hint": hint,
        "zero_convs": [zero_conv(ch) for ch in skip_chs],
        "middle_out": zero_conv(skip_chs[-1]),
    }


def _skip_channels(cfg: UNetConfig) -> List[int]:
    ch = cfg.model_channels
    chs = [ch]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            ch = mult * cfg.model_channels
            chs.append(ch)
        if level != len(cfg.channel_mult) - 1:
            chs.append(ch)
    return chs


def encode_hint(params, hint: jax.Array) -> jax.Array:
    """(B, H, W, 3) hint image in [0,1] -> (B, H/8, W/8, model_ch)."""
    x = hint
    ladder = _HINT_LADDER
    for p, (_cin, _cout, stride) in zip(params["input_hint"][:-1], ladder):
        x = ops.silu(ops.conv2d(x, p["weight"], p["bias"],
                                stride=stride, padding=1))
    last = params["input_hint"][-1]
    return ops.conv2d(x, last["weight"], last["bias"], padding=1)


def apply(
    params,
    x: jax.Array,
    hint: "jax.Array | None",
    timesteps: jax.Array,
    context: jax.Array,
    cfg: UNetConfig = unet_model.SD15_CONFIG,
    *,
    scale: float | jax.Array = 1.0,
    hint_features: "jax.Array | None" = None,
) -> Tuple[List[jax.Array], jax.Array]:
    """Run the control branch.

    x: (B, h, w, C) latents (same input the UNet sees this step);
    hint: (B, 8h, 8w, 3) conditioning image in [0, 1] — or pass
    ``hint_features`` (encode_hint output) directly; the hint is
    loop-invariant across denoise steps, so pipelines encode it ONCE
    outside the sampling scan rather than running the full-image-
    resolution conv ladder every step.
    Returns (skip_residuals, middle_residual) shaped exactly like the
    UNet's skip stack — feed as ``unet.apply(..., control=...)``.
    """
    inp, mid, _ = unet_model.build_plan(cfg)
    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = ops.linear(t_emb, params["time_embed"]["fc1"]["weight"],
                     params["time_embed"]["fc1"]["bias"])
    emb = ops.linear(ops.silu(emb), params["time_embed"]["fc2"]["weight"],
                     params["time_embed"]["fc2"]["bias"])

    guided = (hint_features if hint_features is not None
              else encode_hint(params, hint)).astype(x.dtype)
    residuals: List[jax.Array] = []
    for i, (p, block) in enumerate(zip(params["input"], inp)):
        x = unet_model._run_block(p, block, x, emb, context, cfg)
        if i == 0:
            x = x + guided  # hint enters after conv_in (cldm.py forward)
        z = params["zero_convs"][i]
        residuals.append(scale * ops.conv2d(x, z["weight"], z["bias"]))
    x = unet_model._run_block(params["middle"], mid, x, emb, context, cfg)
    z = params["middle_out"]
    mid_res = scale * ops.conv2d(x, z["weight"], z["bias"])
    return residuals, mid_res
