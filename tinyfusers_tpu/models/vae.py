"""VAE (AutoencoderKL) encoder + decoder, NHWC, TPU-native.

Re-design of reference vae/vae.py, vae/encoder.py:12-34 (Encoder),
vae/decoder.py (Decoder), vae/mid.py (Mid) and
attention/attention.py:10-24 (AttnBlock), vision/resnet.py:33-45
(ResnetBlock). Same topology generated from a config:

- Encoder: conv_in 3->128, 4 down stages (128,128)(128,256)(256,512)
  (512,512), each 2 ResnetBlocks; stride-2 downsample convs with the
  asymmetric pad [0,1,0,1] (reference vae/encoder.py:19); Mid; GN+swish;
  conv_out -> 2*latent_ch (means ‖ logvars).
- Decoder: conv_in 4->512, Mid, 4 up stages of 3 ResnetBlocks with
  nearest-2x upsample between, GN+swish, conv_out -> 3.
- Mid: ResnetBlock, AttnBlock (single-head attention over H*W tokens),
  ResnetBlock.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import ops
from ..utils import init as pinit


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    base_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 1, 2, 4, 4)  # stage channels = base * mult
    latent_channels: int = 4
    num_groups: int = 32
    scale_factor: float = 0.18215  # latent scaling (reference variants/sd.py:49)
    shift_factor: float = 0.0      # SD3-style latent shift (z-shift)*scale
    use_quant_conv: bool = True    # SD1/2/XL: 1x1 (post_)quant_conv; SD3/Flux VAEs drop them

    @property
    def downsample_factor(self) -> int:
        # One stride-2 conv between consecutive encoder stages (all but the
        # last stage boundary): SD's 5-entry mult -> 8x.
        return 2 ** (len(self.channel_mult) - 2)


SD_VAE_CONFIG = VAEConfig()

TINY_VAE_CONFIG = VAEConfig(base_channels=16, channel_mult=(1, 1, 2), num_groups=8)


def _stage_channels(cfg: VAEConfig):
    chs = [cfg.base_channels * m for m in cfg.channel_mult]
    # encoder stages: (in, out) pairs per reference sz table
    enc = list(zip(chs[:-1], chs[1:]))
    return enc, chs


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _resnet_init(key, in_ch, out_ch, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": pinit.norm_params(in_ch, dtype),
        "conv1": pinit.conv_params(ks[0], in_ch, out_ch, 3, dtype=dtype),
        "norm2": pinit.norm_params(out_ch, dtype),
        "conv2": pinit.conv_params(ks[1], out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["nin_shortcut"] = pinit.conv_params(ks[2], in_ch, out_ch, 1, dtype=dtype)
    return p


def _attnblock_init(key, ch, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": pinit.norm_params(ch, dtype),
        "q": pinit.conv_params(ks[0], ch, ch, 1, dtype=dtype),
        "k": pinit.conv_params(ks[1], ch, ch, 1, dtype=dtype),
        "v": pinit.conv_params(ks[2], ch, ch, 1, dtype=dtype),
        "proj_out": pinit.conv_params(ks[3], ch, ch, 1, dtype=dtype),
    }


def _mid_init(key, ch, dtype):
    ks = jax.random.split(key, 3)
    return {
        "block_1": _resnet_init(ks[0], ch, ch, dtype),
        "attn_1": _attnblock_init(ks[1], ch, dtype),
        "block_2": _resnet_init(ks[2], ch, ch, dtype),
    }


def init_encoder(key, cfg: VAEConfig = SD_VAE_CONFIG, dtype=jnp.float32):
    enc, chs = _stage_channels(cfg)
    ks = jax.random.split(key, len(enc) + 4)
    down = []
    for i, (cin, cout) in enumerate(enc):
        bk = jax.random.split(ks[i], 3)
        stage = {
            "block": [
                _resnet_init(bk[0], cin, cout, dtype),
                _resnet_init(bk[1], cout, cout, dtype),
            ]
        }
        if i != len(enc) - 1:
            stage["downsample"] = pinit.conv_params(bk[2], cout, cout, 3, dtype=dtype)
        down.append(stage)
    top = chs[-1]
    return {
        "conv_in": pinit.conv_params(ks[-4], cfg.in_channels, chs[0], 3, dtype=dtype),
        "down": down,
        "mid": _mid_init(ks[-3], top, dtype),
        "norm_out": pinit.norm_params(top, dtype),
        "conv_out": pinit.conv_params(ks[-2], top, 2 * cfg.latent_channels, 3, dtype=dtype),
    }


def init_decoder(key, cfg: VAEConfig = SD_VAE_CONFIG, dtype=jnp.float32):
    enc, chs = _stage_channels(cfg)
    # Decoder stage i (ckpt key decoder.up.{i}) outputs souts[i]; its input
    # is the output of stage i+1 (the stage that runs before it), top stage
    # fed by conv_in at souts[-1]. Matches reference vae/decoder.py:10-18:
    # stages (256->128), (512->256), (512->512), (512->512) for SD.
    souts = chs[1:]
    dec = [
        (souts[i + 1] if i + 1 < len(souts) else souts[-1], souts[i])
        for i in range(len(souts))
    ]  # (in, out) per stage, index i
    ks = jax.random.split(key, len(dec) + 4)
    up = []
    for i, (cin, cout) in enumerate(dec):
        bk = jax.random.split(ks[i], 4)
        stage = {
            "block": [
                _resnet_init(bk[0], cin, cout, dtype),
                _resnet_init(bk[1], cout, cout, dtype),
                _resnet_init(bk[2], cout, cout, dtype),
            ]
        }
        if i != 0:
            stage["upsample"] = pinit.conv_params(bk[3], cout, cout, 3, dtype=dtype)
        up.append(stage)
    top = chs[-1]
    return {
        "conv_in": pinit.conv_params(ks[-4], cfg.latent_channels, top, 3, dtype=dtype),
        "mid": _mid_init(ks[-3], top, dtype),
        "up": up,
        "norm_out": pinit.norm_params(souts[0], dtype),
        "conv_out": pinit.conv_params(ks[-2], souts[0], cfg.in_channels, 3, dtype=dtype),
    }


def init(key, cfg: VAEConfig = SD_VAE_CONFIG, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    lc = cfg.latent_channels
    p = {
        "encoder": init_encoder(ks[0], cfg, dtype),
        "decoder": init_decoder(ks[1], cfg, dtype),
    }
    if cfg.use_quant_conv:
        p["quant_conv"] = pinit.conv_params(ks[2], 2 * lc, 2 * lc, 1, dtype=dtype)
        p["post_quant_conv"] = pinit.conv_params(ks[3], lc, lc, 1, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _resnet_apply(p, x, num_groups):
    h = ops.group_norm(x, num_groups, p["norm1"]["weight"], p["norm1"]["bias"], eps=1e-6)
    h = ops.conv2d(ops.swish(h), p["conv1"]["weight"], p["conv1"]["bias"], padding=1)
    h = ops.group_norm(h, num_groups, p["norm2"]["weight"], p["norm2"]["bias"], eps=1e-6)
    h = ops.conv2d(ops.swish(h), p["conv2"]["weight"], p["conv2"]["bias"], padding=1)
    if "nin_shortcut" in p:
        x = ops.conv2d(x, p["nin_shortcut"]["weight"], p["nin_shortcut"]["bias"])
    return x + h


def _attnblock_apply(p, x, num_groups):
    """Single-head self-attention over spatial tokens (reference
    attention/attention.py:10-24)."""
    n, h, w, c = x.shape
    hn = ops.group_norm(x, num_groups, p["norm"]["weight"], p["norm"]["bias"], eps=1e-6)
    q = ops.conv2d(hn, p["q"]["weight"], p["q"]["bias"]).reshape(n, h * w, c)
    k = ops.conv2d(hn, p["k"]["weight"], p["k"]["bias"]).reshape(n, h * w, c)
    v = ops.conv2d(hn, p["v"]["weight"], p["v"]["bias"]).reshape(n, h * w, c)
    o = ops.sdpa(q[:, None], k[:, None], v[:, None])[:, 0]
    o = o.reshape(n, h, w, c)
    o = ops.conv2d(o, p["proj_out"]["weight"], p["proj_out"]["bias"])
    return x + o


def _mid_apply(p, x, num_groups):
    x = _resnet_apply(p["block_1"], x, num_groups)
    x = _attnblock_apply(p["attn_1"], x, num_groups)
    return _resnet_apply(p["block_2"], x, num_groups)


def encode(params, x: jax.Array, cfg: VAEConfig = SD_VAE_CONFIG) -> jax.Array:
    """Image (B, H, W, 3) -> latent means (B, H/8, W/8, latent_ch),
    already scaled by scale_factor (ready for the diffusion loop)."""
    p = params["encoder"]
    g = cfg.num_groups
    x = ops.conv2d(x, p["conv_in"]["weight"], p["conv_in"]["bias"], padding=1)
    for stage in p["down"]:
        for bp in stage["block"]:
            x = _resnet_apply(bp, x, g)
        if "downsample" in stage:
            x = ops.conv2d(
                x, stage["downsample"]["weight"], stage["downsample"]["bias"],
                stride=2, padding=(0, 1, 0, 1),
            )
    x = _mid_apply(p["mid"], x, g)
    x = ops.group_norm(x, g, p["norm_out"]["weight"], p["norm_out"]["bias"], eps=1e-6)
    x = ops.conv2d(ops.swish(x), p["conv_out"]["weight"], p["conv_out"]["bias"], padding=1)
    if cfg.use_quant_conv:
        x = ops.conv2d(x, params["quant_conv"]["weight"], params["quant_conv"]["bias"])
    means = x[..., : cfg.latent_channels]  # take means, drop logvars
    return (means - cfg.shift_factor) * cfg.scale_factor


def decode(params, z: jax.Array, cfg: VAEConfig = SD_VAE_CONFIG) -> jax.Array:
    """Latent (B, h, w, latent_ch) -> image in [-1, 1], (B, 8h, 8w, 3).

    Includes the 1/scale_factor pre-scale and post_quant_conv
    (reference variants/sd.py:48-50)."""
    g = cfg.num_groups
    z = z / cfg.scale_factor + cfg.shift_factor
    if cfg.use_quant_conv:
        z = ops.conv2d(z, params["post_quant_conv"]["weight"],
                       params["post_quant_conv"]["bias"])
    p = params["decoder"]
    x = ops.conv2d(z, p["conv_in"]["weight"], p["conv_in"]["bias"], padding=1)
    x = _mid_apply(p["mid"], x, g)
    for stage in reversed(p["up"]):
        for bp in stage["block"]:
            x = _resnet_apply(bp, x, g)
        if "upsample" in stage:
            x = ops.upsample_nearest_2x(x)
            x = ops.conv2d(x, stage["upsample"]["weight"], stage["upsample"]["bias"], padding=1)
    x = ops.group_norm(x, g, p["norm_out"]["weight"], p["norm_out"]["bias"], eps=1e-6)
    x = ops.conv2d(ops.swish(x), p["conv_out"]["weight"], p["conv_out"]["bias"], padding=1)
    return x


def to_image(x: jax.Array) -> jax.Array:
    """[-1,1] float -> uint8 HWC in [0,255] (reference variants/sd.py:51-53)."""
    x = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0) * 255.0
    return x.astype(jnp.uint8)
