"""Diffusion training objectives.

The reference is inference-only (no training code anywhere in
/root/reference — SURVEY.md §2.6); this subsystem is new, north-star
capability. Three objectives cover the model families the framework
ships:

- ``eps``: DDPM noise prediction (SD1.x). x_t = sqrt(a_t) x0 +
  sqrt(1-a_t) n, target = n, with the squared-linspace beta schedule the
  sampler uses (pipeline/ddim.py, reference variants/sd.py:61-65) so
  train and sample operate on the same diffusion process.
- ``v``: v-prediction (SD2.x): target = sqrt(a_t) n - sqrt(1-a_t) x0.
- ``rf``: rectified flow / flow matching (SD3): x_t = (1-t) x0 + t n,
  target = n - x0, with logit-normal timestep density (SD3 paper's
  ``lognorm(0, 1)`` weighting) as the default sampler.

All math is fp32 regardless of param/activation dtype; the loss is a
plain mean so data-parallel gradient averaging composes with psum.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..pipeline import ddim


@dataclasses.dataclass(frozen=True)
class LossConfig:
    objective: str = "eps"          # "eps" | "v" | "rf"
    n_train_timesteps: int = 1000   # eps/v discrete ladder
    snr_gamma: Optional[float] = None  # min-SNR-gamma loss weighting
    # rf timestep density: logit-normal(mean, std) per SD3; "uniform" if None
    rf_t_mean: Optional[float] = 0.0
    rf_t_std: float = 1.0


def sample_timesteps(rng: jax.Array, batch: int, cfg: LossConfig) -> jax.Array:
    """Per-example training timesteps. int32 indices for eps/v; fp32
    t in (0, 1) for rf."""
    if cfg.objective == "rf":
        if cfg.rf_t_mean is None:
            return jax.random.uniform(rng, (batch,), jnp.float32)
        u = cfg.rf_t_mean + cfg.rf_t_std * jax.random.normal(
            rng, (batch,), jnp.float32)
        return jax.nn.sigmoid(u)
    return jax.random.randint(rng, (batch,), 0, cfg.n_train_timesteps)


def q_sample(x0: jax.Array, noise: jax.Array, t: jax.Array,
             cfg: LossConfig):
    """Forward process: returns (x_t fp32, regression target fp32).

    x0/noise: (B, ...) same shape; t: (B,) int32 (eps/v) or fp32 (rf).
    """
    x0 = x0.astype(jnp.float32)
    noise = noise.astype(jnp.float32)
    bshape = (-1,) + (1,) * (x0.ndim - 1)
    if cfg.objective == "rf":
        tt = t.astype(jnp.float32).reshape(bshape)
        x_t = (1.0 - tt) * x0 + tt * noise
        return x_t, noise - x0
    acp = ddim.alphas_cumprod(n_training_steps=cfg.n_train_timesteps)
    a_t = acp[t].reshape(bshape)
    sa, sb = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    x_t = sa * x0 + sb * noise
    if cfg.objective == "v":
        return x_t, sa * noise - sb * x0
    if cfg.objective == "eps":
        return x_t, noise
    raise ValueError(f"unknown objective {cfg.objective!r}")


def loss_weights(t: jax.Array, cfg: LossConfig) -> jax.Array:
    """Per-example scalar weights (B,). min-SNR-gamma (Hang et al. 2023)
    for eps/v; uniform otherwise (rf's density shaping happens in
    sample_timesteps)."""
    if cfg.snr_gamma is None or cfg.objective == "rf":
        return jnp.ones(t.shape[:1], jnp.float32)
    acp = ddim.alphas_cumprod(n_training_steps=cfg.n_train_timesteps)
    a_t = acp[t]
    snr = a_t / (1.0 - a_t)
    capped = jnp.minimum(snr, cfg.snr_gamma)
    if cfg.objective == "v":
        return capped / (snr + 1.0)
    return capped / snr


def diffusion_loss(pred: jax.Array, target: jax.Array,
                   weights: Optional[jax.Array] = None) -> jax.Array:
    """Weighted MSE, fp32, mean over batch and all feature dims."""
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_ex = jnp.mean(err.reshape(err.shape[0], -1), axis=-1)
    if weights is not None:
        per_ex = per_ex * weights
    return jnp.mean(per_ex)
