"""SDXL-base text-to-image pipeline.

New capability beyond the reference (which is SD1.4-only) — required by
BASELINE.json config 3 ("SDXL-base 1024x1024 ... tensor-sharded").

SDXL specifics implemented here:
- dual text encoders: CLIP ViT-L (768) + OpenCLIP bigG (1280), both read
  at the penultimate layer, concatenated to a 2048-d context;
- ADM "text_time" conditioning: bigG pooled embedding ‖ sinusoidal
  embeddings of (orig_size, crop, target_size) -> 2816-d vector into the
  UNet's label_emb MLP;
- UNet: 3 levels, per-level transformer depths (0, 2, 10), 64-d heads
  (models/unet.SDXL_CONFIG);
- VAE scale factor 0.13025 (vs SD1.x 0.18215).

Same TPU-first structure as pipeline/sd.py: everything in one jitted
program, DDIM scan over timesteps.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from ..models import clip, unet, vae
from . import ddim


@dataclass(frozen=True)
class SDXLConfig:
    clip_l: clip.CLIPConfig = field(default_factory=clip.CLIPConfig)
    clip_g: clip.CLIPConfig = field(
        default_factory=lambda: clip.OPENCLIP_BIGG_CONFIG
    )
    unet: unet.UNetConfig = field(default_factory=lambda: unet.SDXL_CONFIG)
    vae: vae.VAEConfig = field(
        default_factory=lambda: vae.VAEConfig(scale_factor=0.13025)
    )
    height: int = 1024
    width: int = 1024
    size_emb_dim: int = 256  # per size-component sinusoidal dim

    @property
    def latent_shape(self):
        f = self.vae.downsample_factor
        return (self.height // f, self.width // f, self.vae.latent_channels)


SDXL_BASE = SDXLConfig()

TINY_XL = SDXLConfig(
    clip_l=clip.CLIPConfig(vocab_size=128, max_length=16, dim=16,
                           num_layers=2, num_heads=4, mlp_dim=32),
    clip_g=clip.CLIPConfig(vocab_size=128, max_length=16, dim=32,
                           num_layers=2, num_heads=4, mlp_dim=64,
                           act="gelu", projection_dim=32),
    unet=unet.UNetConfig(model_channels=32, channel_mult=(1, 2),
                         attention_levels=(1,), transformer_depth=(0, 2),
                         context_dim=48, num_heads=-1, head_dim=16,
                         num_groups=8, adm_in_channels=32 + 6 * 8),
    vae=vae.VAEConfig(base_channels=16, channel_mult=(1, 1, 2),
                      num_groups=8, scale_factor=0.13025),
    height=64,
    width=64,
    size_emb_dim=8,
)


def init(key: jax.Array, cfg: SDXLConfig = SDXL_BASE, dtype=jnp.float32):
    kl, kg, ku, kv = jax.random.split(key, 4)
    return {
        "clip_l": clip.init(kl, cfg.clip_l, dtype),
        "clip_g": clip.init(kg, cfg.clip_g, dtype),
        "unet": unet.init(ku, cfg.unet, dtype),
        "vae": vae.init(kv, cfg.vae, dtype),
    }


def encode_text(params, ids_l: jax.Array, ids_g: jax.Array, cfg: SDXLConfig):
    """Dual-encoder conditioning: returns (context (B,T,2048), pooled
    (B,1280)). Both encoders read the penultimate hidden state."""
    hl = clip.apply(params["clip_l"], ids_l, cfg.clip_l, skip_final_norm_layers=1)
    hg = clip.apply(params["clip_g"], ids_g, cfg.clip_g, skip_final_norm_layers=1)
    pooled = clip.apply_pooled(params["clip_g"], ids_g, cfg.clip_g)
    return jnp.concatenate([hl, hg], axis=-1), pooled


def size_embeddings(sizes: jax.Array, dim: int) -> jax.Array:
    """sizes (B, 6) = (orig_h, orig_w, crop_t, crop_l, tgt_h, tgt_w) ->
    (B, 6*dim) sinusoidal embeddings (SDXL add_time_ids)."""
    b = sizes.shape[0]
    emb = unet.timestep_embedding(sizes.reshape(-1).astype(jnp.float32), dim)
    return emb.reshape(b, -1)


def make_adm_cond(pooled: jax.Array, sizes: jax.Array, cfg: SDXLConfig):
    return jnp.concatenate(
        [pooled, size_embeddings(sizes, cfg.size_emb_dim).astype(pooled.dtype)],
        axis=-1,
    )


def default_sizes(batch: int, cfg: SDXLConfig) -> jax.Array:
    return jnp.tile(
        jnp.array([[cfg.height, cfg.width, 0, 0, cfg.height, cfg.width]],
                  jnp.float32),
        (batch, 1),
    )


@partial(jax.jit, static_argnames=("num_steps", "cfg", "method", "schedule",
                                   "uncond_interval", "cfg_rescale",
                                   "freeu"))
def generate(
    params,
    ids_l: jax.Array,
    ids_g: jax.Array,
    uids_l: jax.Array,
    uids_g: jax.Array,
    latent: jax.Array,
    guidance: jax.Array,
    *,
    num_steps: int = 20,
    cfg: SDXLConfig = SDXL_BASE,
    method: str = "ddim",
    schedule: str = "ladder",
    key=None,
    uncond_interval: int = 1,
    cfg_rescale: float = 0.0,
    freeu=None,
) -> jax.Array:
    """Dual-encoder CFG generation -> uint8 image (B, H, W, 3).

    Same sampler surface as pipeline/sd.py: method selects any of
    pipeline.samplers.SAMPLERS, schedule the sigma spacing
    ("ladder"/"karras"), uncond_interval>1 enables cached CFG (the
    uncond branch recomputes every k-th network call and is reused
    between — rides the sampler aux state), cfg_rescale>0 applies
    guidance rescale (ddim.cfg_rescale). SDXL-base is an epsilon model,
    so the combined output IS the eps prediction."""
    from . import samplers

    b = latent.shape[0]
    ctx_c, pooled_c = encode_text(params, ids_l, ids_g, cfg)
    ctx_u, pooled_u = encode_text(params, uids_l, uids_g, cfg)
    sizes = default_sizes(b, cfg)
    adm_u = make_adm_cond(pooled_u, sizes, cfg).astype(latent.dtype)
    adm_c = make_adm_cond(pooled_c, sizes, cfg).astype(latent.dtype)
    ctx_u = ctx_u.astype(latent.dtype)
    ctx_c = ctx_c.astype(latent.dtype)

    guidance = jnp.asarray(guidance, jnp.float32)

    def combine(e_u, e_c):
        o = ddim.cfg_combine(e_u, e_c, guidance)
        return (ddim.cfg_rescale(o, e_c, cfg_rescale)
                if cfg_rescale > 0.0 else o)

    if uncond_interval <= 1:
        context2 = jnp.concatenate([ctx_u, ctx_c], axis=0)
        adm2 = jnp.concatenate([adm_u, adm_c], axis=0)

        def model_fn(lat, t):
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.broadcast_to(t, (2 * b,))
            eps = unet.apply(params["unet"], lat2, t2, context2, cfg.unet,
                             adm_cond=adm2, freeu=freeu)
            return combine(eps[:b], eps[b:])

        latent = samplers.sample(model_fn, latent, num_steps, method=method,
                                 schedule=schedule, key=key)
    else:
        # cached CFG: cond every call at batch B, uncond refreshed every
        # uncond_interval-th network call (see pipeline/sd.sample_latents)
        def model_fn(lat, t, aux):
            n, e_u_prev = aux
            tb = jnp.broadcast_to(t, (b,))
            e_c = unet.apply(params["unet"], lat, tb, ctx_c, cfg.unet,
                             adm_cond=adm_c, freeu=freeu)
            e_u = jax.lax.cond(
                n % uncond_interval == 0,
                lambda: unet.apply(params["unet"], lat, tb, ctx_u, cfg.unet,
                                   adm_cond=adm_u, freeu=freeu),
                lambda: e_u_prev,
            )
            return combine(e_u, e_c), (n + 1, e_u)

        latent = samplers.sample(
            model_fn, latent, num_steps, method=method, schedule=schedule,
            key=key, aux_init=(jnp.int32(0), jnp.zeros_like(latent)))

    img = vae.decode(params["vae"], latent, cfg.vae)
    return vae.to_image(img)


def initial_latent(key, batch: int, cfg: SDXLConfig = SDXL_BASE, dtype=jnp.float32):
    return jax.random.normal(key, (batch, *cfg.latent_shape), dtype)
