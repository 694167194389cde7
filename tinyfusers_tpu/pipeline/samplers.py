"""Sampler / scheduler family.

The reference hard-codes a single DDIM eta=0 update inside its pipeline
(variants/sd.py:14-25, "sampler is DDIM-only, no scheduler abstraction" —
SURVEY.md §2.4). Here samplers are a family of scan-compatible step
functions over the k-diffusion sigma parameterization:

    x_t = sqrt(a_t) * x0 + sqrt(1-a_t) * n      (DDPM space)
    X   = x_t / sqrt(a_t) = x0 + sigma * n      (sigma space),
    sigma = sqrt((1-a_t)/a_t)

All samplers consume ``model_fn(x_ddpm, t_float) -> eps`` (the UNet + CFG
closure, called with DDPM-space input so the network sees what it was
trained on) and run entirely inside one jitted lax.scan.

Stateful model functions: pass ``aux_init`` and a 3-arg
``model_fn(x_ddpm, t_float, aux) -> (eps, aux)`` to thread caller state
through every network call — this is how cached CFG (pipeline/sd.py
``uncond_interval``) reuses the unconditional branch across calls under
EVERY sampler, including the 2-NFE ones (heun, dpmpp_2s_ancestral),
where "every k-th" counts network calls, not ladder steps.

Implemented: euler, euler_ancestral, heun (2nd-order, 2 NFE/step),
dpmpp_2m (2nd-order multistep), dpmpp_2s_ancestral (2nd-order
single-step ancestral, 2 NFE/step), plus ddim re-expressed in this
interface for uniformity.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import ddim as ddim_mod

SAMPLERS = (
    "ddim", "euler", "euler_ancestral", "heun", "dpmpp_2m",
    "dpmpp_2s_ancestral",
)

SCHEDULES = ("ladder", "karras")


def sigma_ladder(num_steps: int, schedule: str = "ladder"):
    """Descending sigmas with a terminal 0.
    Returns (timesteps_desc (num_steps,), sigmas (num_steps+1,)).

    schedule="ladder": sigmas at the reversed DDIM timestep ladder (the
    reference's range(1,1000,1000//steps) spacing, example/sd1.py:54).
    schedule="karras": the Karras et al. 2022 rho=7 spacing between the
    model's own [sigma_min, sigma_max] (k-diffusion get_sigmas_karras) —
    denser near sigma_min, where few-step sampling loses most detail.
    Timesteps are continuous: the monotone sigma(t) table is inverted by
    interpolation, and the network is conditioned at the interpolated t
    (same convention as dpmpp_2s_ancestral's midpoint evals)."""
    acp = ddim_mod.alphas_cumprod()
    if schedule == "ladder":
        ts = ddim_mod.ddim_timesteps(num_steps)[::-1]  # descending t
        a = acp[ts]
        sigmas = jnp.sqrt((1.0 - a) / a)
        return (ts.astype(jnp.float32),
                jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)]))
    if schedule != "karras":
        raise ValueError(f"unknown schedule {schedule!r}; options: {SCHEDULES}")
    sigma_all = jnp.sqrt((1.0 - acp) / acp)  # increasing in t
    sigma_min, sigma_max = sigma_all[0], sigma_all[-1]
    rho = 7.0
    ramp = jnp.linspace(0.0, 1.0, num_steps, dtype=jnp.float32)
    inv = sigma_max ** (1.0 / rho) + ramp * (
        sigma_min ** (1.0 / rho) - sigma_max ** (1.0 / rho))
    sigmas = inv ** rho  # descending sigma_max -> sigma_min
    ts = jnp.interp(sigmas, sigma_all,
                    jnp.arange(sigma_all.shape[0], dtype=jnp.float32))
    return ts, jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)])


def _to_model_input(X, sigma):
    # DDPM-space input: x_t = X / sqrt(1 + sigma^2)
    return X / jnp.sqrt(1.0 + sigma**2)


def _denoised(X, sigma, eps):
    return X - sigma * eps


def sample(
    model_fn: Callable,
    latent: jax.Array,
    num_steps: int,
    *,
    method: str = "euler",
    key: Optional[jax.Array] = None,
    aux_init=None,
    schedule: str = "ladder",
    start_index: int = 0,
) -> jax.Array:
    """Run the chosen sampler down the ``num_steps`` ladder from rung
    ``start_index`` (0 = from pure noise; k>0 skips the k highest-noise
    rungs — the img2img / hires-fix "denoising strength" mechanism).

    latent: DDPM-space x_t at ladder rung ``start_index``. For
    start_index=0 that is standard-normal initial noise (as in
    sd.initial_latent); for a tail start, noise a clean latent z0 with
    x_t = (z0 + sigma_start * n) / sqrt(1 + sigma_start**2) using
    sigmas[start_index] from sigma_ladder (sd.noise_to_rung does this).
    Returns the final denoised latent (DDPM space, i.e. x0 — alphas at
    sigma=0 coincide).

    aux_init: when given, ``model_fn`` must take (x, t, aux) and return
    (eps, aux); the aux pytree is threaded through every network call in
    scan order (see module docstring).

    schedule: sigma spacing for the sigma-space samplers ("ladder" or
    "karras", see sigma_ladder). ddim is defined on the discrete
    timestep ladder and rejects "karras".
    """
    if not 0 <= start_index < num_steps:
        raise ValueError(f"start_index {start_index} outside [0, {num_steps})")
    if aux_init is None:
        def mfn(x, t, aux, _raw=model_fn):
            return _raw(x, t), aux
        aux0 = jnp.zeros(())  # inert scan-carry placeholder
    else:
        mfn, aux0 = model_fn, aux_init

    if method == "ddim":
        if schedule != "ladder":
            raise ValueError(
                "ddim is defined on the discrete timestep ladder; use a "
                "sigma-space sampler (euler/heun/dpmpp_*) with "
                f"schedule={schedule!r}")
        return _sample_ddim(mfn, aux0, latent, num_steps, start_index)
    ts, sigmas = sigma_ladder(num_steps, schedule)
    lat32 = latent.astype(jnp.float32)
    # lift DDPM-space x_t at the start rung into sigma space
    X = lat32 * jnp.sqrt(1.0 + sigmas[start_index] ** 2)

    def call(X_in, sig, t, aux):
        eps, aux = mfn(_to_model_input(X_in, sig).astype(latent.dtype),
                       t.astype(jnp.float32), aux)
        return eps.astype(jnp.float32), aux

    if method == "euler":
        def body(carry, i):
            X, aux = carry
            sig, sig_next, t = sigmas[i], sigmas[i + 1], ts[i]
            eps, aux = call(X, sig, t, aux)
            X = X + eps * (sig_next - sig)
            return (X, aux), None

        (X, _), _ = jax.lax.scan(body, (X, aux0), jnp.arange(start_index, num_steps))
        return X.astype(latent.dtype)

    if method == "euler_ancestral":
        assert key is not None, "euler_ancestral needs a PRNG key"

        def body(carry, i):
            X, k, aux = carry
            sig, sig_next, t = sigmas[i], sigmas[i + 1], ts[i]
            eps, aux = call(X, sig, t, aux)
            # ancestral split of the step variance
            var_up = sig_next**2 * (sig**2 - sig_next**2) / jnp.maximum(sig**2, 1e-12)
            sigma_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
            sigma_down = jnp.sqrt(jnp.maximum(sig_next**2 - sigma_up**2, 0.0))
            X = X + eps * (sigma_down - sig)
            k, sub = jax.random.split(k)
            X = X + sigma_up * jax.random.normal(sub, X.shape, X.dtype)
            return (X, k, aux), None

        (X, _, _), _ = jax.lax.scan(body, (X, key, aux0), jnp.arange(start_index, num_steps))
        return X.astype(latent.dtype)

    if method == "heun":
        # 2nd-order: Euler predictor to sig_next, then trapezoidal
        # correction with the slope there. 2 model calls per step (the
        # terminal sigma_next==0 step stays plain Euler — lax.cond keeps
        # both in one compiled scan body without a dynamic batch).
        def body(carry, i):
            X, aux = carry
            sig, sig_next, t = sigmas[i], sigmas[i + 1], ts[i]
            eps, aux = call(X, sig, t, aux)
            dt = sig_next - sig
            X_pred = X + eps * dt
            # slope at sig_next, evaluated with the *next* ladder
            # timestep (last step: t again; its result is discarded).
            t_next = ts[jnp.minimum(i + 1, num_steps - 1)]
            eps2, aux = call(X_pred, sig_next, t_next, aux)
            X_heun = X + 0.5 * (eps + eps2) * dt
            X = jnp.where(sig_next > 0.0, X_heun, X_pred)
            return (X, aux), None

        (X, _), _ = jax.lax.scan(body, (X, aux0), jnp.arange(start_index, num_steps))
        return X.astype(latent.dtype)

    if method == "dpmpp_2s_ancestral":
        assert key is not None, "dpmpp_2s_ancestral needs a PRNG key"
        # continuous timestep for an arbitrary sigma (the midpoint eval
        # must be CONDITIONED at its own noise level, not the step's
        # start t): invert the monotone sigma(t) table by interpolation.
        acp = ddim_mod.alphas_cumprod()
        sigma_all = jnp.sqrt((1.0 - acp) / acp)  # increasing in t

        def t_of_sigma(sig):
            return jnp.interp(sig, sigma_all,
                              jnp.arange(sigma_all.shape[0], dtype=jnp.float32))

        def body(carry, i):
            X, k, aux = carry
            sig, sig_next, t = sigmas[i], sigmas[i + 1], ts[i]
            eps, aux = call(X, sig, t, aux)
            den = _denoised(X, sig, eps)
            var_up = sig_next**2 * (sig**2 - sig_next**2) / jnp.maximum(
                sig**2, 1e-12)
            sigma_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
            sigma_down = jnp.sqrt(
                jnp.maximum(sig_next**2 - sigma_up**2, 0.0))
            # DPM-Solver++(2S): midpoint in log-sigma time toward
            # sigma_down, second eval there, exponential-integrator update.
            lt = -jnp.log(jnp.maximum(sig, 1e-10))
            lt_down = -jnp.log(jnp.maximum(sigma_down, 1e-10))
            h = lt_down - lt
            s_mid = jnp.exp(-(lt + 0.5 * h))
            X_mid = (s_mid / jnp.maximum(sig, 1e-12)) * X \
                - jnp.expm1(-0.5 * h) * den
            eps_mid, aux = call(X_mid, s_mid, t_of_sigma(s_mid), aux)
            den_mid = _denoised(X_mid, s_mid, eps_mid)
            X_det = (sigma_down / jnp.maximum(sig, 1e-12)) * X \
                - jnp.expm1(-h) * den_mid
            # terminal step (sigma_down == 0): fall back to Euler to den
            X_det = jnp.where(sigma_down > 0.0, X_det, den)
            k, sub = jax.random.split(k)
            X = X_det + sigma_up * jax.random.normal(sub, X.shape, X.dtype)
            return (X, k, aux), None

        (X, _, _), _ = jax.lax.scan(body, (X, key, aux0), jnp.arange(start_index, num_steps))
        return X.astype(latent.dtype)

    if method == "dpmpp_2m":
        def body(carry, i):
            X, old_den, have_old, aux = carry
            sig, sig_next, t = sigmas[i], sigmas[i + 1], ts[i]
            eps, aux = call(X, sig, t, aux)
            den = _denoised(X, sig, eps)
            # log-sigma time; guard the terminal sigma=0 with a floor, the
            # ratio sig_next/sig -> 0 makes the update exact there anyway.
            lt = -jnp.log(jnp.maximum(sig, 1e-10))
            lt_next = -jnp.log(jnp.maximum(sig_next, 1e-10))
            h = lt_next - lt
            sig_prev = sigmas[jnp.maximum(i - 1, 0)]
            lt_prev = -jnp.log(jnp.maximum(sig_prev, 1e-10))
            h_last = lt - lt_prev
            r = h_last / jnp.maximum(h, 1e-10)
            den2 = jnp.where(
                have_old,
                (1.0 + 1.0 / (2.0 * r)) * den - (1.0 / (2.0 * r)) * old_den,
                den,
            )
            X = (sig_next / jnp.maximum(sig, 1e-12)) * X - jnp.expm1(-h) * den2
            return (X, den, jnp.bool_(True), aux), None

        init = (X, jnp.zeros_like(X), jnp.bool_(False), aux0)
        (X, _, _, _), _ = jax.lax.scan(body, init, jnp.arange(start_index, num_steps))
        return X.astype(latent.dtype)

    raise ValueError(f"unknown sampler {method!r}; options: {SAMPLERS}")


def _sample_ddim(mfn, aux0, latent, num_steps, start_index=0):
    """DDIM via the shared interface (same math as ddim.ddim_step).
    start_index skips the highest-noise rungs (img2img tail start)."""
    timesteps = ddim_mod.ddim_timesteps(num_steps)
    alphas, alphas_prev = ddim_mod.ddim_alphas(num_steps)
    xs = (timesteps[::-1][start_index:], alphas[::-1][start_index:],
          alphas_prev[::-1][start_index:])

    def body(carry, x):
        lat, aux = carry
        t, a_t, a_prev = x
        eps, aux = mfn(lat, t.astype(jnp.float32), aux)
        return (ddim_mod.ddim_step(lat, eps, a_t, a_prev), aux), None

    (lat, _), _ = jax.lax.scan(body, (latent, aux0), xs)
    return lat
