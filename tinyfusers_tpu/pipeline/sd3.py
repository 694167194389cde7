"""SD3-style text-to-image pipeline (MMDiT + rectified flow).

Completes the BASELINE config-5 family: dual CLIP text towers (L + G,
penultimate hidden states concatenated then zero-padded to the MMDiT
context width; pooled embeddings concatenated for the conditioning
vector), a 16-channel VAE, joint-attention MMDiT backbone, CFG on the
velocity field, Euler rectified-flow integration. T5-XXL conditioning is
optional: configs with ``t5`` set (SD3_MEDIUM_T5_CFG etc.) append the
T5 tower's hidden states after the CLIP tokens when ``ids_t5`` is
passed; otherwise that span stays zero (the standard no-T5
configuration).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import clip, mmdit, t5 as t5_model, vae
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
    # Optional T5-XXL tower: when set, T5 hidden states are concatenated
    # after the CLIP span on the TOKEN axis (the canonical SD3 context is
    # [clip_lg_padded (77, 4096) ‖ t5 (77, 4096)]). t5.dim must equal
    # mmdit.context_dim.
    t5: Optional[t5_model.T5Config] = None
    height: int = 1024
    width: int = 1024
    shift: float = 3.0

    @property
    def latent_shape(self):
        f = self.vae.downsample_factor
        return (self.height // f, self.width // f, self.vae.latent_channels)


SD3_MEDIUM_CFG = SD3Config()
SD3_MEDIUM_T5_CFG = SD3Config(t5=t5_model.T5_XXL)
# SD3.5-large: same pipeline (dual CLIP [+T5], 16ch VAE, rectified flow),
# bigger MMDiT trunk with RMS qk-norm (models/mmdit.py SD35_LARGE).
SD35_LARGE_CFG = SD3Config(mmdit=mmdit.SD35_LARGE)
SD35_LARGE_T5_CFG = SD3Config(mmdit=mmdit.SD35_LARGE, t5=t5_model.T5_XXL)

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

TINY_SD3_T5 = SD3Config(
    clip_l=TINY_SD3.clip_l, clip_g=TINY_SD3.clip_g, mmdit=TINY_SD3.mmdit,
    vae=TINY_SD3.vae, height=32, width=32,
    t5=t5_model.T5Config(vocab_size=128, dim=64, ff_dim=128, num_layers=2,
                         num_heads=4, head_dim=16, rel_buckets=8,
                         rel_max_distance=16),
)


def init(key: jax.Array, cfg: SD3Config = SD3_MEDIUM_CFG, dtype=jnp.float32):
    kl, kg, km, kv, kt = jax.random.split(key, 5)
    params = {
        "clip_l": clip.init(kl, cfg.clip_l, dtype),
        "clip_g": clip.init(kg, cfg.clip_g, dtype),
        "mmdit": mmdit.init(km, cfg.mmdit, dtype),
        "vae": vae.init(kv, cfg.vae, dtype),
    }
    if cfg.t5 is not None:
        params["t5"] = t5_model.init(kt, cfg.t5, dtype)
    return params


def encode_text(params, ids_l: jax.Array, ids_g: jax.Array, cfg: SD3Config,
                ids_t5: Optional[jax.Array] = None):
    """(context (B, T, mmdit.context_dim), pooled (B, pooled_dim)).

    Context = [CLIP-L penult ‖ CLIP-G penult] zero-padded on the feature
    axis to the MMDiT width; when the config carries a T5 tower and
    ids_t5 is given, T5 hidden states are appended on the TOKEN axis
    (canonical SD3 [clip ‖ t5] layout; the T5 span stays zero otherwise)."""
    hl = clip.apply(params["clip_l"], ids_l, cfg.clip_l, skip_final_norm_layers=1)
    hg = clip.apply(params["clip_g"], ids_g, cfg.clip_g, skip_final_norm_layers=1)
    joint = jnp.concatenate([hl, hg], axis=-1)
    pad = cfg.mmdit.context_dim - joint.shape[-1]
    assert pad >= 0, "mmdit.context_dim smaller than concatenated CLIP dims"
    context = jnp.pad(joint, ((0, 0), (0, 0), (0, pad)))
    if cfg.t5 is not None and ids_t5 is not None:
        ht = t5_model.apply(params["t5"], ids_t5, cfg.t5)
        assert ht.shape[-1] == cfg.mmdit.context_dim, (
            "t5.dim must equal mmdit.context_dim")
        context = jnp.concatenate([context, ht.astype(context.dtype)], axis=1)
    pl_ = clip.apply_pooled(params["clip_l"], ids_l, cfg.clip_l)
    pg = clip.apply_pooled(params["clip_g"], ids_g, cfg.clip_g)
    pooled = jnp.concatenate([pl_, pg], axis=-1)
    return context, pooled


@partial(jax.jit, static_argnames=("num_steps", "cfg", "method"))
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
    method: str = "euler",
    ids_t5: Optional[jax.Array] = None,
    uids_t5: Optional[jax.Array] = None,
) -> jax.Array:
    """Rectified-flow CFG generation -> uint8 image (B, H, W, 3).
    method: "euler" (1 NFE/step, SD3 reference) or "heun" (2nd-order,
    2 NFE/step) — rectified_flow.sample."""
    b = latent.shape[0]
    ctx_c, pool_c = encode_text(params, ids_l, ids_g, cfg, ids_t5)
    ctx_u, pool_u = encode_text(params, uids_l, uids_g, cfg, uids_t5)
    ctx2 = jnp.concatenate([ctx_u, ctx_c], axis=0).astype(latent.dtype)
    pool2 = jnp.concatenate([pool_u, pool_c], axis=0).astype(latent.dtype)
    guidance = jnp.asarray(guidance, jnp.float32)

    def model_fn(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        v = mmdit.apply(params["mmdit"], x2, t2, ctx2, pool2, cfg.mmdit)
        v_u, v_c = v[:b], v[b:]
        return v_u + guidance * (v_c - v_u)

    lat = rf.sample(model_fn, latent, num_steps, shift=cfg.shift,
                    method=method)
    img = vae.decode(params["vae"], lat, cfg.vae)
    return vae.to_image(img)


def initial_latent(key, batch: int, cfg: SD3Config = SD3_MEDIUM_CFG,
                   dtype=jnp.float32):
    return jax.random.normal(key, (batch, *cfg.latent_shape), dtype)
