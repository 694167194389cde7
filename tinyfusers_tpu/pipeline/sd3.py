"""SD3-style text-to-image pipeline (MMDiT + rectified flow).

Completes the BASELINE config-5 family: dual CLIP text towers (L + G,
penultimate hidden states concatenated then zero-padded to the MMDiT
context width; pooled embeddings concatenated for the conditioning
vector), a 16-channel VAE, joint-attention MMDiT backbone, CFG on the
velocity field, Euler rectified-flow integration. T5-XXL conditioning is
intentionally out of scope this round (the context layout leaves its
token span zero — the standard no-T5 configuration).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from ..models import clip, mmdit, vae
from . import rectified_flow as rf


@dataclass(frozen=True)
class SD3Config:
    clip_l: clip.CLIPConfig = field(default_factory=lambda: clip.CLIPConfig(
        projection_dim=768))
    clip_g: clip.CLIPConfig = field(
        default_factory=lambda: clip.OPENCLIP_BIGG_CONFIG)
    mmdit: mmdit.MMDiTConfig = field(default_factory=lambda: mmdit.SD3_MEDIUM)
    vae: vae.VAEConfig = field(default_factory=lambda: vae.VAEConfig(
        latent_channels=16, scale_factor=1.5305, shift_factor=0.0609,
        use_quant_conv=False))
    height: int = 1024
    width: int = 1024
    shift: float = 3.0

    @property
    def latent_shape(self):
        f = self.vae.downsample_factor
        return (self.height // f, self.width // f, self.vae.latent_channels)


SD3_MEDIUM_CFG = SD3Config()

TINY_SD3 = SD3Config(
    clip_l=clip.CLIPConfig(vocab_size=128, max_length=8, dim=16,
                           num_layers=2, num_heads=4, mlp_dim=32,
                           projection_dim=16),
    clip_g=clip.CLIPConfig(vocab_size=128, max_length=8, dim=32,
                           num_layers=2, num_heads=4, mlp_dim=64,
                           act="gelu", projection_dim=32),
    mmdit=mmdit.MMDiTConfig(input_size=16, patch_size=2, in_channels=4,
                            out_channels=4, dim=64, depth=2, num_heads=4,
                            context_dim=64, pooled_dim=48, context_len=8),
    vae=vae.VAEConfig(base_channels=16, channel_mult=(1, 1, 2), num_groups=8,
                      latent_channels=4, scale_factor=1.5305,
                      use_quant_conv=False),
    height=32,
    width=32,
)


def init(key: jax.Array, cfg: SD3Config = SD3_MEDIUM_CFG, dtype=jnp.float32):
    kl, kg, km, kv = jax.random.split(key, 4)
    return {
        "clip_l": clip.init(kl, cfg.clip_l, dtype),
        "clip_g": clip.init(kg, cfg.clip_g, dtype),
        "mmdit": mmdit.init(km, cfg.mmdit, dtype),
        "vae": vae.init(kv, cfg.vae, dtype),
    }


def encode_text(params, ids_l: jax.Array, ids_g: jax.Array, cfg: SD3Config):
    """(context (B, T, mmdit.context_dim), pooled (B, pooled_dim)).

    Context = [CLIP-L penult ‖ CLIP-G penult] zero-padded on the feature
    axis to the MMDiT width (the T5 span stays zero)."""
    hl = clip.apply(params["clip_l"], ids_l, cfg.clip_l, skip_final_norm_layers=1)
    hg = clip.apply(params["clip_g"], ids_g, cfg.clip_g, skip_final_norm_layers=1)
    joint = jnp.concatenate([hl, hg], axis=-1)
    pad = cfg.mmdit.context_dim - joint.shape[-1]
    assert pad >= 0, "mmdit.context_dim smaller than concatenated CLIP dims"
    context = jnp.pad(joint, ((0, 0), (0, 0), (0, pad)))
    pl_ = clip.apply_pooled(params["clip_l"], ids_l, cfg.clip_l)
    pg = clip.apply_pooled(params["clip_g"], ids_g, cfg.clip_g)
    pooled = jnp.concatenate([pl_, pg], axis=-1)
    return context, pooled


@partial(jax.jit, static_argnames=("num_steps", "cfg"))
def generate(
    params,
    ids_l: jax.Array,
    ids_g: jax.Array,
    uids_l: jax.Array,
    uids_g: jax.Array,
    latent: jax.Array,
    guidance: jax.Array,
    *,
    num_steps: int = 28,
    cfg: SD3Config = SD3_MEDIUM_CFG,
) -> jax.Array:
    """Rectified-flow CFG generation -> uint8 image (B, H, W, 3)."""
    b = latent.shape[0]
    ctx_c, pool_c = encode_text(params, ids_l, ids_g, cfg)
    ctx_u, pool_u = encode_text(params, uids_l, uids_g, cfg)
    ctx2 = jnp.concatenate([ctx_u, ctx_c], axis=0).astype(latent.dtype)
    pool2 = jnp.concatenate([pool_u, pool_c], axis=0).astype(latent.dtype)
    guidance = jnp.asarray(guidance, jnp.float32)

    def model_fn(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        v = mmdit.apply(params["mmdit"], x2, t2, ctx2, pool2, cfg.mmdit)
        v_u, v_c = v[:b], v[b:]
        return v_u + guidance * (v_c - v_u)

    lat = rf.sample(model_fn, latent, num_steps, shift=cfg.shift)
    img = vae.decode(params["vae"], lat, cfg.vae)
    return vae.to_image(img)


def initial_latent(key, batch: int, cfg: SD3Config = SD3_MEDIUM_CFG,
                   dtype=jnp.float32):
    return jax.random.normal(key, (batch, *cfg.latent_shape), dtype)
