"""DDIM schedule + sampling math.

Re-derivation of reference variants/sd.py:
- alphas_cumprod: squared-linspace beta schedule, beta 0.00085 -> 0.0120
  over 1000 steps, cumprod (variants/sd.py:61-65).
- timestep ladder: range(1, 1000, 1000//steps) iterated reversed
  (example/sd1.py:54,68).
- DDIM eta=0 update (variants/sd.py:14-25):
    pred_x0 = (x - sqrt(1-a_t) * e_t) / sqrt(a_t)
    x_prev  = sqrt(a_prev) * pred_x0 + sqrt(1 - a_prev) * e_t
- classifier-free guidance: e_t = e_u + g * (e_c - e_u)
  (variants/sd.py:43-46).

Everything here is trace-friendly: alphas are arrays indexed by traced
step index, guidance is an array — no Python-scalar recompiles.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def alphas_cumprod(
    beta_start: float = 0.00085,
    beta_end: float = 0.0120,
    n_training_steps: int = 1000,
) -> jax.Array:
    betas = (
        jnp.linspace(beta_start**0.5, beta_end**0.5, n_training_steps, dtype=jnp.float32)
        ** 2
    )
    return jnp.cumprod(1.0 - betas, axis=0)


def ddim_timesteps_np(num_steps: int, n_training_steps: int = 1000) -> np.ndarray:
    """Ascending ladder as host numpy — the single source of truth for
    the timestep schedule (reference example/sd1.py:54 range()). The
    serving engine's host-side scheduler and the device sampler both
    derive from this function, so they cannot silently diverge."""
    return np.arange(1, n_training_steps, n_training_steps // num_steps,
                     dtype=np.int32)


def ddim_timesteps(num_steps: int, n_training_steps: int = 1000) -> jax.Array:
    """Ascending ladder; the sampling loop consumes it reversed."""
    return jnp.asarray(ddim_timesteps_np(num_steps, n_training_steps))


def ddim_alphas(num_steps: int):
    """(alphas, alphas_prev) aligned with ddim_timesteps order."""
    acp = alphas_cumprod()
    ts = ddim_timesteps(num_steps)
    alphas = acp[ts]
    alphas_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), alphas[:-1]])
    return alphas, alphas_prev


def ddim_step(x: jax.Array, e_t: jax.Array, a_t: jax.Array, a_prev: jax.Array):
    """One deterministic (eta=0) DDIM update. a_t/a_prev are scalars or
    broadcastable arrays; computed in fp32 for stability."""
    xf = x.astype(jnp.float32)
    ef = e_t.astype(jnp.float32)
    pred_x0 = (xf - jnp.sqrt(1.0 - a_t) * ef) / jnp.sqrt(a_t)
    x_prev = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * ef
    return x_prev.astype(x.dtype)


def cfg_combine(e_uncond: jax.Array, e_cond: jax.Array, guidance) -> jax.Array:
    return e_uncond + guidance * (e_cond - e_uncond)


def cfg_rescale(e_cfg: jax.Array, e_cond: jax.Array, phi: float) -> jax.Array:
    """Guidance rescale (Lin et al. 2023, "Common Diffusion Noise
    Schedules and Sample Steps Are Flawed" §3.4): renormalize the CFG
    output's per-sample std to the conditional prediction's std, then
    blend by phi. Counters the overexposure/contrast blowout high
    guidance causes, especially on v-prediction models (SD2.1-v).
    Operates in model-output space (v or eps), before any v->eps
    conversion — same convention as diffusers' guidance_rescale."""
    axes = tuple(range(1, e_cfg.ndim))
    x = e_cfg.astype(jnp.float32)
    std_cond = jnp.std(e_cond.astype(jnp.float32), axis=axes, keepdims=True)
    std_cfg = jnp.std(x, axis=axes, keepdims=True)
    rescaled = x * (std_cond / jnp.maximum(std_cfg, 1e-8))
    return (phi * rescaled + (1.0 - phi) * x).astype(e_cfg.dtype)
