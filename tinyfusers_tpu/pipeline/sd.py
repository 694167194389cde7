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
    # "epsilon" (SD1.x / SD2.x-base) or "v" (SD2.x 768-v; Salimans &
    # Ho 2022 v-parameterization — converted to eps right after CFG).
    prediction_type: str = "epsilon"
    # Text conditioning taps k layers before the end ("clip skip"); SD2.x
    # additionally runs the final layer norm on that early state.
    clip_skip_layers: int = 0
    clip_final_norm_on_skip: bool = False

    @property
    def latent_shape(self):
        f = self.vae.downsample_factor
        return (self.height // f, self.width // f, self.vae.latent_channels)


SD15 = SDConfig()

# SD 2.1-base (512, epsilon) and SD 2.1 (768, v-prediction): OpenCLIP-H
# penultimate-layer conditioning, 64-d attention heads in the UNet.
SD21_BASE = SDConfig(
    clip=clip.OPENCLIP_H_CONFIG,
    unet=unet.SD21_CONFIG,
    clip_skip_layers=1,
    clip_final_norm_on_skip=True,
)
SD21_V = SDConfig(
    clip=clip.OPENCLIP_H_CONFIG,
    unet=unet.SD21_CONFIG,
    height=768,
    width=768,
    prediction_type="v",
    clip_skip_layers=1,
    clip_final_norm_on_skip=True,
)

# Quarter-channel SD1.5: the real 4-level topology, attention levels,
# GN32 grouping and CLIP/VAE structure, at 1/4 width (~90M params — a
# >100 MB fp16 checkpoint). Used by the checkpoint drill
# (benchmarks/ckpt_drill.py tests the FULL geometry; tests/
# test_ckpt_drill.py drives this one through the CLI) and handy as a
# CPU-feasible smoke config that still exercises full-SD code paths.
SD15_QUARTER = SDConfig(
    clip=clip.CLIPConfig(vocab_size=1024, max_length=77, dim=256,
                         num_layers=4, num_heads=8, mlp_dim=1024),
    unet=unet.UNetConfig(model_channels=128, channel_mult=(1, 2, 4, 4),
                         attention_levels=(0, 1, 2), context_dim=256,
                         num_heads=8, num_groups=32),
    vae=vae.VAEConfig(base_channels=64, channel_mult=(1, 1, 2, 4, 4)),
    height=256,
    width=256,
)

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
    return clip.apply(
        params["clip"], input_ids, cfg.clip,
        skip_final_norm_layers=cfg.clip_skip_layers,
        final_norm_on_skip=cfg.clip_final_norm_on_skip,
    )


def model_out_to_eps(out: jax.Array, latent: jax.Array, timestep: jax.Array,
                     cfg: SDConfig) -> jax.Array:
    """Convert the UNet output to an epsilon prediction.

    epsilon models: identity. v models: eps = sqrt(a_t)*v + sqrt(1-a_t)*x_t
    (x_t = sqrt(a_t) x0 + sqrt(1-a_t) eps and v = sqrt(a_t) eps -
    sqrt(1-a_t) x0). CFG may combine in v space first — the map is linear
    in the model output at fixed (x_t, t)."""
    if cfg.prediction_type == "epsilon":
        return out
    if cfg.prediction_type != "v":
        raise ValueError(f"unknown prediction_type {cfg.prediction_type!r}")
    acp = ddim.alphas_cumprod()
    a_t = acp[jnp.round(timestep).astype(jnp.int32)].astype(jnp.float32)
    while a_t.ndim < out.ndim:  # per-batch timesteps -> broadcast over HWC
        a_t = a_t[..., None]
    out32 = out.astype(jnp.float32)
    lat32 = latent.astype(jnp.float32)
    eps = jnp.sqrt(a_t) * out32 + jnp.sqrt(1.0 - a_t) * lat32
    return eps.astype(out.dtype)


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
    out = unet.apply(unet_params, lat2, t2, context2, cfg.unet)
    o_uncond, o_cond = out[:b], out[b:]
    o_t = ddim.cfg_combine(o_uncond, o_cond, guidance)
    e_t = model_out_to_eps(o_t, latent, timestep, cfg)
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
    schedule: str = "ladder",
    start_index: int = 0,
    key=None,
    uncond_interval: int = 1,
    deepcache_interval: int = 1,
    deepcache_split: int = 3,
    cfg_rescale: float = 0.0,
    control=None,
    freeu=None,
) -> jax.Array:
    """Full sampling as one lax.scan (jit-friendly; num_steps static).

    control: optional (controlnet_params, hint, control_scale) — runs
    models/controlnet.py every step and feeds its residuals into the
    UNet (ControlNet spatial conditioning). hint is (B, H, W, 3) in
    [0, 1] at full image resolution. Composes with cached CFG and
    DeepCache: residuals refresh on full-pass network calls and are
    reused from the sampler aux state on shallow/cached calls (see
    _sample_deepcache / _sample_deepcache_cached_cfg).

    method: any of pipeline.samplers.SAMPLERS ("ddim", "euler",
    "euler_ancestral", "heun", "dpmpp_2m", "dpmpp_2s_ancestral").

    uncond_interval k>1 enables cached CFG: the unconditional prediction
    is recomputed only every k-th network call and reused between (it
    drifts slowly across adjacent noise levels) — cuts UNet work toward
    50% at large k. Works under EVERY sampler (the cache rides the
    sampler aux state; for the 2-NFE methods k counts network calls).
    Approximate: validate with benchmarks/quant_eval.py-style PSNR
    before shipping outputs.

    deepcache_interval k>1 enables DeepCache (models/unet.apply
    deepcache=): the deep U-Net trunk runs every k-th network call, in
    between only the first/last ``deepcache_split`` blocks run against
    the cached deep feature. Approximate; works under every sampler
    (the cache rides the sampler aux state, like cached CFG). Composes
    with uncond_interval>1: the cond branch runs DeepCache while the
    uncond branch runs a full UNet every uncond_interval-th call
    (reused in between) — see _sample_deepcache_cached_cfg below.
    """
    from . import samplers

    guidance = jnp.asarray(guidance, jnp.float32)
    b = latent.shape[0]

    def combine(e_u, e_c):
        o = ddim.cfg_combine(e_u, e_c, guidance)
        return (ddim.cfg_rescale(o, e_c, cfg_rescale)
                if cfg_rescale > 0.0 else o)

    if uncond_context is None and (deepcache_interval > 1
                                   or uncond_interval > 1):
        raise ValueError(
            "guidance-free sampling (uncond_context=None) does not compose "
            "with cached-CFG/DeepCache intervals — there is no uncond "
            "branch to cache")

    control_enc = None
    if control is not None:
        from ..models import controlnet as cn_model

        cn_params, hint, cscale = control
        # hint features are loop-invariant: run the image-resolution conv
        # ladder ONCE here, outside the sampling scan, not per step
        guided = cn_model.encode_hint(cn_params, hint)
        control_enc = (cn_params, guided, cscale)

    def ctrl_for(lat_, t_, ctx_):
        """Fresh control residuals at this (latent, t) — (skips, mid)."""
        from ..models import controlnet as cn_model

        cn_params_, guided_, cscale_ = control_enc
        bb = lat_.shape[0]
        guided_b = jnp.broadcast_to(
            guided_.astype(lat_.dtype), (bb, *guided_.shape[1:]))
        return cn_model.apply(cn_params_, lat_, None, t_, ctx_, cfg.unet,
                              scale=cscale_, hint_features=guided_b)

    def unet_apply(p_, lat_, t_, ctx_):
        if control is None:
            return unet.apply(p_, lat_, t_, ctx_, cfg.unet, freeu=freeu)
        return unet.apply(p_, lat_, t_, ctx_, cfg.unet, freeu=freeu,
                          control=ctrl_for(lat_, t_, ctx_))

    if deepcache_interval > 1:
        if uncond_interval > 1:
            # Max-speed combination: the cond branch runs DeepCache
            # (shallow between full refreshes), the uncond branch runs a
            # FULL UNet but only every uncond_interval-th call (reused in
            # between) — no second cache to go stale.
            return _sample_deepcache_cached_cfg(
                unet_params, latent, context, uncond_context,
                num_steps=num_steps, guidance=guidance, cfg=cfg,
                dk=deepcache_interval, split=deepcache_split,
                uk=uncond_interval, method=method, schedule=schedule,
                start_index=start_index, key=key, cfg_rescale=cfg_rescale,
                freeu=freeu,
                ctrl_for=ctrl_for if control_enc else None,
            )
        return _sample_deepcache(
            unet_params, latent, context, uncond_context,
            num_steps=num_steps, guidance=guidance, cfg=cfg,
            interval=deepcache_interval, split=deepcache_split,
            method=method, schedule=schedule, start_index=start_index, key=key,
            cfg_rescale=cfg_rescale, freeu=freeu,
            ctrl_for=ctrl_for if control_enc else None,
        )

    if uncond_context is None:
        # Guidance-free path (SD-Turbo / LCM-style distilled checkpoints,
        # or guidance==1 sampling): no uncond branch at all, the UNet runs
        # at batch B instead of 2B — ~2x the step throughput of CFG.
        def model_fn(lat, t):
            tb = jnp.broadcast_to(t, (b,))
            out = unet_apply(unet_params, lat, tb, context)
            return model_out_to_eps(out, lat, t, cfg)

        return samplers.sample(model_fn, latent, num_steps, method=method,
                               schedule=schedule, start_index=start_index,
                               key=key)

    if uncond_interval <= 1:
        context2 = jnp.concatenate([uncond_context, context], axis=0)

        def model_fn(lat, t):
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.broadcast_to(t, (2 * b,))
            out = unet_apply(unet_params, lat2, t2, context2)
            o_t = combine(out[:b], out[b:])
            return model_out_to_eps(o_t, lat, t, cfg)

        return samplers.sample(model_fn, latent, num_steps, method=method,
                               schedule=schedule, start_index=start_index,
                               key=key)

    # Cached CFG under ANY sampler: the samplers thread an aux pytree
    # through every network call (samplers.sample aux_init), so the
    # cached uncond output composes with the 2-NFE methods too — there
    # "every uncond_interval-th" counts network calls, not ladder steps.
    def model_fn(lat, t, aux):
        n, o_u_prev = aux
        tb = jnp.broadcast_to(t, (b,))
        o_c = unet_apply(unet_params, lat, tb, context)
        o_u = jax.lax.cond(
            n % uncond_interval == 0,
            lambda: unet_apply(unet_params, lat, tb, uncond_context),
            lambda: o_u_prev,
        )
        o_t = combine(o_u, o_c)
        return model_out_to_eps(o_t, lat, t, cfg), (n + 1, o_u)

    aux0 = (jnp.int32(0), jnp.zeros_like(latent))
    return samplers.sample(model_fn, latent, num_steps, method=method,
                           schedule=schedule, start_index=start_index,
                           key=key, aux_init=aux0)


def _sample_deepcache(
    unet_params, latent, context, uncond_context, *,
    num_steps: int, guidance, cfg: SDConfig, interval: int, split: int,
    method: str = "ddim", schedule: str = "ladder", start_index: int = 0,
    key=None, cfg_rescale: float = 0.0, ctrl_for=None, freeu=None,
):
    """CFG sampling with DeepCache under ANY sampler: full UNet every
    ``interval``-th network call, shallow (first/last ``split`` blocks +
    cached deep feature) between — the deep-feature cache rides the
    sampler aux state exactly like cached CFG.

    ctrl_for: optional (lat, t, ctx) -> (skips, mid) ControlNet residual
    fn. Residuals are REFRESHED on every full pass (and applied to all
    skips + middle as usual); the first ``split`` skip residuals are
    cached in the aux state and reused on shallow passes (the deep
    residuals' effect is already baked into the cached deep feature)."""
    from . import samplers

    b = latent.shape[0]
    context2 = jnp.concatenate([uncond_context, context], axis=0)

    def full(lat2, t2, cache, ctrl_cache):
        if ctrl_for is None:
            eps, cache_new = unet.apply(
                unet_params, lat2, t2, context2, cfg.unet,
                deepcache=("full", split), freeu=freeu)
            return eps, cache_new, ctrl_cache
        ctrl = ctrl_for(lat2, t2, context2)
        eps, cache_new = unet.apply(
            unet_params, lat2, t2, context2, cfg.unet,
            deepcache=("full", split), control=ctrl, freeu=freeu)
        return eps, cache_new, tuple(ctrl[0][:split])

    def shallow(lat2, t2, cache, ctrl_cache):
        eps, cache = unet.apply(
            unet_params, lat2, t2, context2, cfg.unet,
            deepcache=("shallow", split), cache=cache, freeu=freeu,
            control=ctrl_cache if ctrl_for is not None else None)
        return eps, cache, ctrl_cache

    # Cache shapes/dtypes come from tracing the full pass without running it.
    lat2_s = jax.eval_shape(
        lambda l: jnp.concatenate([l, l], axis=0), latent)
    t2_s = jax.ShapeDtypeStruct((2 * b,), jnp.float32)
    cache_s, ctrl_s = jax.eval_shape(
        lambda l2, t2: full(l2, t2, None, ())[1:], lat2_s, t2_s)
    cache0 = jnp.zeros(cache_s.shape, cache_s.dtype)
    ctrl0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), ctrl_s)

    def model_fn(lat, t, aux):
        n, cache, ctrl_cache = aux
        lat2 = jnp.concatenate([lat, lat], axis=0)
        t2 = jnp.broadcast_to(t.astype(jnp.float32), (2 * b,))
        eps, cache, ctrl_cache = jax.lax.cond(
            n % interval == 0,
            lambda: full(lat2, t2, cache, ctrl_cache),
            lambda: shallow(lat2, t2, cache, ctrl_cache),
        )
        o_t = ddim.cfg_combine(eps[:b], eps[b:], guidance)
        if cfg_rescale > 0.0:
            o_t = ddim.cfg_rescale(o_t, eps[b:], cfg_rescale)
        e_t = model_out_to_eps(o_t, lat, t, cfg)
        return e_t, (n + 1, cache, ctrl_cache)

    return samplers.sample(model_fn, latent, num_steps, method=method,
                           schedule=schedule, start_index=start_index, key=key,
                           aux_init=(jnp.int32(0), cache0, ctrl0))


def _sample_deepcache_cached_cfg(
    unet_params, latent, context, uncond_context, *,
    num_steps: int, guidance, cfg: SDConfig, dk: int, split: int, uk: int,
    method: str = "ddim", schedule: str = "ladder", start_index: int = 0,
    key=None, cfg_rescale: float = 0.0, ctrl_for=None, freeu=None,
):
    """DeepCache on the cond branch + cached CFG on the uncond branch
    (cond and uncond run as separate B-batches here, unlike the
    batched-2B paths), composable with any sampler via the aux state.
    Cost per network call ~ shallow(B) + full(B)/uk.

    ctrl_for: optional ControlNet residual fn (see _sample_deepcache).
    The cond branch refreshes residuals on its full passes and reuses
    the cached first-``split`` skips on shallow passes; the uncond
    branch computes fresh residuals on its (full-UNet) refresh calls —
    its cached output already embeds them between refreshes."""
    from . import samplers

    b = latent.shape[0]

    def cond_full(lat, tb, cache, ctrl_cache):
        if ctrl_for is None:
            eps, cache_new = unet.apply(unet_params, lat, tb, context,
                                        cfg.unet, deepcache=("full", split),
                                        freeu=freeu)
            return eps, cache_new, ctrl_cache
        ctrl = ctrl_for(lat, tb, context)
        eps, cache_new = unet.apply(unet_params, lat, tb, context, cfg.unet,
                                    deepcache=("full", split), control=ctrl,
                                    freeu=freeu)
        return eps, cache_new, tuple(ctrl[0][:split])

    def cond_shallow(lat, tb, cache, ctrl_cache):
        eps, cache = unet.apply(
            unet_params, lat, tb, context, cfg.unet,
            deepcache=("shallow", split), cache=cache, freeu=freeu,
            control=ctrl_cache if ctrl_for is not None else None)
        return eps, cache, ctrl_cache

    def uncond_full(lat, tb):
        ctrl = (ctrl_for(lat, tb, uncond_context)
                if ctrl_for is not None else None)
        return unet.apply(unet_params, lat, tb, uncond_context, cfg.unet,
                          control=ctrl, freeu=freeu)

    lat_s = jax.eval_shape(lambda l: l, latent)
    t_s = jax.ShapeDtypeStruct((b,), jnp.float32)
    cache_s, ctrl_s = jax.eval_shape(
        lambda l, t: cond_full(l, t, None, ())[1:], lat_s, t_s)
    cache0 = jnp.zeros(cache_s.shape, cache_s.dtype)
    ctrl0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), ctrl_s)

    def model_fn(lat, t, aux):
        n, e_u_prev, cache, ctrl_cache = aux
        tb = jnp.broadcast_to(t.astype(jnp.float32), (b,))
        e_c, cache, ctrl_cache = jax.lax.cond(
            n % dk == 0,
            lambda: cond_full(lat, tb, cache, ctrl_cache),
            lambda: cond_shallow(lat, tb, cache, ctrl_cache),
        )
        e_u = jax.lax.cond(
            n % uk == 0,
            lambda: uncond_full(lat, tb),
            lambda: e_u_prev,
        )
        o_t = ddim.cfg_combine(e_u, e_c, guidance)
        if cfg_rescale > 0.0:
            o_t = ddim.cfg_rescale(o_t, e_c, cfg_rescale)
        e_t = model_out_to_eps(o_t, lat, t, cfg)
        return e_t, (n + 1, e_u, cache, ctrl_cache)

    aux0 = (jnp.int32(0), jnp.zeros_like(latent), cache0, ctrl0)
    return samplers.sample(model_fn, latent, num_steps, method=method,
                           schedule=schedule, start_index=start_index,
                           key=key, aux_init=aux0)


@partial(jax.jit, static_argnames=("num_steps", "cfg", "method", "schedule",
                                   "uncond_interval", "deepcache_interval",
                                   "deepcache_split", "cfg_rescale",
                                   "freeu"))
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
    schedule: str = "ladder",
    key=None,
    uncond_interval: int = 1,
    deepcache_interval: int = 1,
    deepcache_split: int = 3,
    cfg_rescale: float = 0.0,
    freeu=None,
    prompt_weights=None,
    control=None,
) -> jax.Array:
    """Tokens + initial noise -> uint8 image(s) (B, H, W, 3).

    One compiled program: CLIP (cond+uncond), scanned sampler loop, VAE
    decode, postprocess. method selects the sampler (pipeline.samplers);
    schedule selects the sigma spacing for the sigma-space samplers
    ("ladder" or "karras" — samplers.sigma_ladder);
    uncond_interval>1 enables cached CFG (see sample_latents);
    prompt_weights (B, T) applies per-token emphasis
    (tokenizer/prompt_weights). uncond_ids=None disables CFG entirely
    (SD-Turbo/LCM-style guidance-free sampling: single-batch UNet,
    ~2x step throughput; guidance is ignored).
    """
    ctx = encode_text(params, input_ids, cfg)
    uctx = None if uncond_ids is None else encode_text(params, uncond_ids, cfg)
    if prompt_weights is not None:
        ctx = apply_prompt_weights(ctx, prompt_weights)
    latent = sample_latents(
        params["unet"], latent, ctx, uctx,
        num_steps=num_steps, guidance=guidance, cfg=cfg, method=method,
        schedule=schedule, key=key, uncond_interval=uncond_interval,
        deepcache_interval=deepcache_interval,
        deepcache_split=deepcache_split, cfg_rescale=cfg_rescale,
        freeu=freeu, control=control,
    )
    img = vae.decode(params["vae"], latent, cfg.vae)
    return vae.to_image(img)


def initial_latent(key: jax.Array, batch: int, cfg: SDConfig = SD15, dtype=jnp.float32):
    return jax.random.normal(key, (batch, *cfg.latent_shape), dtype)


def noise_to_rung(z0: jax.Array, noise: jax.Array, sigma) -> jax.Array:
    """Noise a clean latent z0 to a ladder rung with noise level
    ``sigma``, returning DDPM-space x_t — the form samplers.sample
    expects for a tail start (start_index > 0):
        x_t = sqrt(a) z0 + sqrt(1-a) n = (z0 + sigma n) / sqrt(1+sigma^2)
    """
    x = z0.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
    return (x / jnp.sqrt(1.0 + sigma**2)).astype(z0.dtype)


@partial(jax.jit, static_argnames=("num_steps", "cfg", "method", "schedule",
                                   "hires_scale", "hires_steps",
                                   "hires_strength", "uncond_interval",
                                   "cfg_rescale", "freeu"))
def generate_hires(
    params,
    input_ids: jax.Array,
    uncond_ids: jax.Array,
    latent: jax.Array,
    key: jax.Array,
    guidance: jax.Array,
    *,
    num_steps: int = 20,
    cfg: SDConfig = SD15,
    method: str = "ddim",
    schedule: str = "ladder",
    hires_scale: int = 2,
    hires_steps: int = 0,
    hires_strength: float = 0.6,
    uncond_interval: int = 1,
    cfg_rescale: float = 0.0,
    freeu=None,
) -> jax.Array:
    """Two-pass hires-fix: sample at the config's base resolution, upscale
    the LATENT bilinearly by ``hires_scale``, re-noise it to an
    intermediate ladder rung, and denoise the tail at high resolution —
    still ONE compiled program (both UNet resolutions are static shapes
    inside the same jit).

    This is the standard ecosystem answer to SD1.x's 512px training
    distribution: direct >=1024px sampling duplicates subjects, the
    base-pass composition + high-res detail pass does not. No reference
    analog (single-resolution pipeline, example/sd1.py).

    hires_steps: ladder length of the second pass (0 = num_steps).
    hires_strength: fraction of that ladder actually run from noise
    (A1111 "denoising strength"); the tail starts at rung
    ceil((1-strength)*hires_steps). key drives the re-noise injection
    (and the ancestral samplers in both passes, split per pass).
    Returns uint8 images at (base * hires_scale) resolution.
    """
    from . import samplers

    ctx = encode_text(params, input_ids, cfg)
    uctx = None if uncond_ids is None else encode_text(params, uncond_ids, cfg)
    k_base, k_noise, k_hi = jax.random.split(key, 3)
    needs_key = "ancestral" in method
    lat = sample_latents(
        params["unet"], latent, ctx, uctx,
        num_steps=num_steps, guidance=guidance, cfg=cfg, method=method,
        schedule=schedule, key=k_base if needs_key else None,
        uncond_interval=uncond_interval, cfg_rescale=cfg_rescale,
        freeu=freeu,
    )

    b, h, w, c = lat.shape
    hi = jax.image.resize(
        lat.astype(jnp.float32),
        (b, h * hires_scale, w * hires_scale, c), method="bilinear")

    hs = hires_steps or num_steps
    run = max(1, min(hs, int(round(hs * hires_strength))))
    start = hs - run
    _, sigmas = samplers.sigma_ladder(
        hs, "ladder" if method == "ddim" else schedule)
    noise = jax.random.normal(k_noise, hi.shape, jnp.float32)
    x_t = noise_to_rung(hi.astype(lat.dtype), noise, sigmas[start])

    lat_hi = sample_latents(
        params["unet"], x_t, ctx, uctx,
        num_steps=hs, guidance=guidance, cfg=cfg, method=method,
        schedule=schedule, start_index=start,
        key=k_hi if needs_key else None,
        uncond_interval=uncond_interval, cfg_rescale=cfg_rescale,
        freeu=freeu,
    )
    img = vae.decode(params["vae"], lat_hi, cfg.vae)
    return vae.to_image(img)


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
        e_t = model_out_to_eps(
            ddim.cfg_combine(eps[:b], eps[b:], guidance), lat, t, cfg)
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
