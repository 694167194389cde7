"""Stable Diffusion text-to-image pipeline.

TPU-native replacement for reference variants/sd.py + example/sd1.py's
denoise loop. The key structural change (SURVEY.md §3.3): the entire
20-step DDIM loop is ONE jitted function — a `lax.scan` over timesteps
around a single traced UNet forward — instead of the reference's
per-step Python loop that rebuilds dozens of cuDNN graphs, inserts full
device syncs, and round-trips latents through host memory
(variants/sd.py:34-41).

Classifier-free guidance runs cond+uncond as a batch of 2B through one
UNet call (reference variants/sd.py:31-32 does the same with B=1).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from ..models import clip, unet, vae
from . import ddim


@dataclass(frozen=True)
class SDConfig:
    clip: clip.CLIPConfig = field(default_factory=clip.CLIPConfig)
    unet: unet.UNetConfig = field(default_factory=lambda: unet.SD15_CONFIG)
    vae: vae.VAEConfig = field(default_factory=lambda: vae.SD_VAE_CONFIG)
    height: int = 512
    width: int = 512

    @property
    def latent_shape(self):
        f = self.vae.downsample_factor
        return (self.height // f, self.width // f, self.vae.latent_channels)


SD15 = SDConfig()

# Tiny end-to-end config for tests: same code paths, toy sizes.
TINY = SDConfig(
    clip=clip.CLIPConfig(vocab_size=128, max_length=16, dim=32, num_layers=2,
                         num_heads=4, mlp_dim=64),
    unet=unet.UNetConfig(model_channels=32, channel_mult=(1, 2),
                         attention_levels=(0, 1), context_dim=32,
                         num_heads=4, num_groups=8),
    vae=vae.TINY_VAE_CONFIG,
    height=32,
    width=32,
)


def init(key: jax.Array, cfg: SDConfig = SD15, dtype=jnp.float32):
    """Random-init full param tree: {'clip', 'unet', 'vae'}."""
    kc, ku, kv = jax.random.split(key, 3)
    return {
        "clip": clip.init(kc, cfg.clip, dtype),
        "unet": unet.init(ku, cfg.unet, dtype),
        "vae": vae.init(kv, cfg.vae, dtype),
    }


def encode_text(params, input_ids: jax.Array, cfg: SDConfig = SD15) -> jax.Array:
    """Token ids (B, T) -> conditioning context (B, T, dim)."""
    return clip.apply(params["clip"], input_ids, cfg.clip)


def apply_prompt_weights(context: jax.Array, weights: jax.Array) -> jax.Array:
    """Scale per-token hidden states about the sequence mean:
    h_i <- mean + (h_i - mean) * w_i (tokenizer/prompt_weights syntax).
    context (B, T, D), weights (B, T)."""
    mean = jnp.mean(context, axis=1, keepdims=True)
    return mean + (context - mean) * weights[..., None].astype(context.dtype)


def denoise_step(
    unet_params,
    latent: jax.Array,
    timestep: jax.Array,
    context2: jax.Array,
    guidance: jax.Array,
    a_t: jax.Array,
    a_prev: jax.Array,
    cfg: SDConfig = SD15,
) -> jax.Array:
    """One CFG + DDIM update.

    latent (B, h, w, c); context2 (2B, S, D) = [uncond ‖ cond];
    timestep scalar; a_t/a_prev scalars.
    """
    b = latent.shape[0]
    lat2 = jnp.concatenate([latent, latent], axis=0)
    t2 = jnp.broadcast_to(timestep.astype(jnp.float32), (2 * b,))
    eps = unet.apply(unet_params, lat2, t2, context2, cfg.unet)
    e_uncond, e_cond = eps[:b], eps[b:]
    e_t = ddim.cfg_combine(e_uncond, e_cond, guidance)
    return ddim.ddim_step(latent, e_t, a_t, a_prev)


def sample_latents(
    unet_params,
    latent: jax.Array,
    context: jax.Array,
    uncond_context: jax.Array,
    *,
    num_steps: int,
    guidance,
    cfg: SDConfig = SD15,
    method: str = "ddim",
    key=None,
    uncond_interval: int = 1,
) -> jax.Array:
    """Full sampling as one lax.scan (jit-friendly; num_steps static).

    method: any of pipeline.samplers.SAMPLERS ("ddim", "euler",
    "euler_ancestral", "dpmpp_2m").

    uncond_interval k>1 enables cached CFG: the unconditional eps is
    recomputed only every k-th step and reused between (the uncond
    prediction drifts slowly across adjacent timesteps) — cuts UNet work
    toward 50% at large k. Approximate: validate with
    benchmarks/quant_eval.py-style PSNR before shipping outputs.
    """
    from . import samplers

    guidance = jnp.asarray(guidance, jnp.float32)
    b = latent.shape[0]

    if uncond_interval <= 1:
        context2 = jnp.concatenate([uncond_context, context], axis=0)

        def model_fn(lat, t):
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.broadcast_to(t, (2 * b,))
            eps = unet.apply(unet_params, lat2, t2, context2, cfg.unet)
            return ddim.cfg_combine(eps[:b], eps[b:], guidance)

        return samplers.sample(model_fn, latent, num_steps, method=method, key=key)

    if method != "ddim":
        raise ValueError("uncond_interval>1 currently supports method='ddim'")

    timesteps = ddim.ddim_timesteps(num_steps)
    alphas, alphas_prev = ddim.ddim_alphas(num_steps)
    xs = (
        jnp.arange(num_steps),
        timesteps[::-1], alphas[::-1], alphas_prev[::-1],
    )

    def body(carry, x):
        lat, e_u_prev = carry
        i, t, a_t, a_prev = x
        tb = jnp.broadcast_to(t.astype(jnp.float32), (b,))
        e_c = unet.apply(unet_params, lat, tb, context, cfg.unet)
        e_u = jax.lax.cond(
            i % uncond_interval == 0,
            lambda: unet.apply(unet_params, lat, tb, uncond_context, cfg.unet),
            lambda: e_u_prev,
        )
        e_t = ddim.cfg_combine(e_u, e_c, guidance)
        return (ddim.ddim_step(lat, e_t, a_t, a_prev), e_u), None

    init = (latent, jnp.zeros_like(latent))
    (latent, _), _ = jax.lax.scan(body, init, xs)
    return latent


@partial(jax.jit, static_argnames=("num_steps", "cfg", "method",
                                   "uncond_interval"))
def generate(
    params,
    input_ids: jax.Array,
    uncond_ids: jax.Array,
    latent: jax.Array,
    guidance: jax.Array,
    *,
    num_steps: int = 20,
    cfg: SDConfig = SD15,
    method: str = "ddim",
    key=None,
    uncond_interval: int = 1,
    prompt_weights=None,
) -> jax.Array:
    """Tokens + initial noise -> uint8 image(s) (B, H, W, 3).

    One compiled program: CLIP (cond+uncond), scanned sampler loop, VAE
    decode, postprocess. method selects the sampler (pipeline.samplers);
    uncond_interval>1 enables cached CFG (see sample_latents);
    prompt_weights (B, T) applies per-token emphasis
    (tokenizer/prompt_weights).
    """
    ctx = encode_text(params, input_ids, cfg)
    uctx = encode_text(params, uncond_ids, cfg)
    if prompt_weights is not None:
        ctx = apply_prompt_weights(ctx, prompt_weights)
    latent = sample_latents(
        params["unet"], latent, ctx, uctx,
        num_steps=num_steps, guidance=guidance, cfg=cfg, method=method,
        key=key, uncond_interval=uncond_interval,
    )
    img = vae.decode(params["vae"], latent, cfg.vae)
    return vae.to_image(img)


def initial_latent(key: jax.Array, batch: int, cfg: SDConfig = SD15, dtype=jnp.float32):
    return jax.random.normal(key, (batch, *cfg.latent_shape), dtype)


@partial(jax.jit, static_argnames=("num_steps", "cfg"))
def inpaint(
    params,
    image: jax.Array,
    mask: jax.Array,
    input_ids: jax.Array,
    uncond_ids: jax.Array,
    latent: jax.Array,
    guidance: jax.Array,
    *,
    num_steps: int = 20,
    cfg: SDConfig = SD15,
) -> jax.Array:
    """Inpainting with a 9-channel UNet (SD15_INPAINT_CONFIG):
    per-step input = [x_t(4) ‖ mask(1) ‖ VAE(masked image)(4)].

    image (B, H, W, 3) in [0,1]; mask (B, H, W, 1), 1 = repaint;
    latent: initial noise from initial_latent()."""
    if image.dtype == jnp.uint8:
        image = image.astype(jnp.float32) / 255.0
    dtype = jax.tree.leaves(params["unet"])[0].dtype
    masked = image.astype(jnp.float32) * (1.0 - mask.astype(jnp.float32))
    z_masked = vae.encode(params["vae"], (masked * 2.0 - 1.0).astype(dtype), cfg.vae)
    f = cfg.vae.downsample_factor
    mask_small = jax.image.resize(
        mask.astype(jnp.float32),
        (mask.shape[0], mask.shape[1] // f, mask.shape[2] // f, 1),
        method="nearest",
    ).astype(dtype)

    ctx = encode_text(params, input_ids, cfg)
    uctx = encode_text(params, uncond_ids, cfg)
    context2 = jnp.concatenate([uctx, ctx], axis=0)
    guidance = jnp.asarray(guidance, jnp.float32)
    b = latent.shape[0]

    timesteps = ddim.ddim_timesteps(num_steps)
    alphas, alphas_prev = ddim.ddim_alphas(num_steps)
    xs = (timesteps[::-1], alphas[::-1], alphas_prev[::-1])

    def body(lat, s):
        t, a_t, a_prev = s
        nine = jnp.concatenate([lat, mask_small, z_masked], axis=-1)
        nine2 = jnp.concatenate([nine, nine], axis=0)
        t2 = jnp.broadcast_to(t.astype(jnp.float32), (2 * b,))
        eps = unet.apply(params["unet"], nine2, t2, context2, cfg.unet)
        e_t = ddim.cfg_combine(eps[:b], eps[b:], guidance)
        return ddim.ddim_step(lat, e_t, a_t, a_prev), None

    lat, _ = jax.lax.scan(body, latent, xs)
    img = vae.decode(params["vae"], lat, cfg.vae)
    out = vae.to_image(img)
    # paste the unmasked region back from the source image
    keep = (mask <= 0.5)
    src = (jnp.clip(image, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return jnp.where(keep, src, out)


@partial(jax.jit, static_argnames=("num_steps", "start_step", "cfg"))
def img2img(
    params,
    image: jax.Array,
    input_ids: jax.Array,
    uncond_ids: jax.Array,
    key: jax.Array,
    guidance: jax.Array,
    *,
    num_steps: int = 20,
    start_step: int = 15,   # how many ladder steps to actually run
    cfg: SDConfig = SD15,
) -> jax.Array:
    """Image-to-image: encode -> noise to an intermediate timestep ->
    denoise the tail of the DDIM ladder -> decode.

    image: (B, H, W, 3) float in [0, 1] (or uint8). start_step/num_steps
    is the usual "strength" (0.75 * 20 = 15). Uses the VAE *encoder* —
    present but dead code in the reference (vae/encoder.py:12-34 is never
    called by its pipeline).
    """
    if image.dtype == jnp.uint8:
        image = image.astype(jnp.float32) / 255.0
    dtype = jax.tree.leaves(params["unet"])[0].dtype
    x = (image.astype(jnp.float32) * 2.0 - 1.0).astype(dtype)
    z0 = vae.encode(params["vae"], x, cfg.vae)

    ctx = encode_text(params, input_ids, cfg)
    uctx = encode_text(params, uncond_ids, cfg)
    context2 = jnp.concatenate([uctx, ctx], axis=0)
    guidance = jnp.asarray(guidance, jnp.float32)

    timesteps = ddim.ddim_timesteps(num_steps)
    alphas, alphas_prev = ddim.ddim_alphas(num_steps)
    k = min(start_step, num_steps)
    # Noise z0 to the ladder position we start from.
    t0 = timesteps[k - 1]
    a0 = alphas[k - 1]
    noise = jax.random.normal(key, z0.shape, z0.dtype)
    lat = (jnp.sqrt(a0) * z0.astype(jnp.float32)
           + jnp.sqrt(1.0 - a0) * noise.astype(jnp.float32)).astype(dtype)

    xs = (timesteps[:k][::-1], alphas[:k][::-1], alphas_prev[:k][::-1])

    def body(l, s):
        t, a_t, a_prev = s
        return denoise_step(params["unet"], l, t, context2, guidance,
                            a_t, a_prev, cfg), None

    lat, _ = jax.lax.scan(body, lat, xs)
    img = vae.decode(params["vae"], lat, cfg.vae)
    return vae.to_image(img)
