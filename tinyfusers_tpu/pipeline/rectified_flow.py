"""Rectified-flow (flow matching) sampling, SD3-style.

Forward process: x_t = (1 - t) * x0 + t * noise, t in [0, 1].
The model predicts velocity v(x_t, t) = noise - x0; integrating
dx/dt = v from t=1 (pure noise) to t=0 recovers x0. SD3 uses a shifted
timestep schedule: sigma(u) = shift*u / (1 + (shift-1)*u).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def timesteps(num_steps: int, shift: float = 3.0) -> jax.Array:
    """Descending t ladder from 1 to 0 (num_steps+1 points), shifted."""
    u = jnp.linspace(1.0, 0.0, num_steps + 1)
    return shift * u / (1.0 + (shift - 1.0) * u)


def sample(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    noise: jax.Array,
    num_steps: int,
    *,
    shift: float = 3.0,
    method: str = "euler",
) -> jax.Array:
    """Integrate the velocity field; model_fn(x, t) -> v with t scalar
    in [0, 1]. Returns x0.

    method="euler": 1 NFE/step (SD3's reference sampler).
    method="heun": trapezoidal predictor-corrector, 2 NFE/step — the
    2nd-order option the flow-matching ecosystem pairs with few-step
    budgets; the terminal step keeps the Euler prediction (the
    correction at t=0 is discarded via the same lax-friendly `where`
    pattern as samplers.py heun)."""
    if method not in ("euler", "heun"):
        raise ValueError(f"unknown flow sampler {method!r}")
    ts = timesteps(num_steps, shift)

    def body(x, i):
        t, t_next = ts[i], ts[i + 1]
        v = model_fn(x, jnp.broadcast_to(t, (x.shape[0],)))
        # fp32 update, cast back: (t_next - t) is a strong-typed fp32
        # scalar, so a bare `x + dt*v` would promote a bf16 carry to
        # fp32 and break the scan's carry-type invariant.
        dt = t_next - t
        x32 = x.astype(jnp.float32)
        x_pred = x32 + dt * v.astype(jnp.float32)
        if method == "heun":
            v2 = model_fn(x_pred.astype(x.dtype),
                          jnp.broadcast_to(t_next, (x.shape[0],)))
            x_heun = x32 + 0.5 * dt * (v.astype(jnp.float32)
                                       + v2.astype(jnp.float32))
            x_pred = jnp.where(t_next > 0.0, x_heun, x_pred)
        return x_pred.astype(x.dtype), None

    x, _ = jax.lax.scan(body, noise, jnp.arange(num_steps))
    return x
