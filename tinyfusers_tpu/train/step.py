"""Train state + jitted train step factory.

One jitted, donated, shardable function per optimization step — the same
single-program design as the inference pipeline (pipeline/sd.py): no
per-step graph rebuilds, no host round-trips. Under a (data, model) mesh
with TP-sharded params (parallel/sharding.py) and batch-sharded inputs,
GSPMD derives gradient shardings and inserts the cross-data-axis
all-reduce — no hand-written psum.

The reference has no training capability at all; this is new, north-star
scope (SURVEY.md §2.6).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from .losses import LossConfig, diffusion_loss, loss_weights, q_sample, \
    sample_timesteps


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array          # int32 scalar
    params: Any
    opt_state: Any
    ema_params: Any = None   # None when EMA disabled

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation,
               ema: bool = False) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            # copy=True: an fp32 astype would alias the param buffer and
            # break donation (same buffer donated twice in one step)
            ema_params=jax.tree.map(
                lambda x: jnp.array(x, jnp.float32, copy=True), params
            ) if ema else None,
        )


def default_optimizer(
    learning_rate: float = 1e-4,
    *,
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: Optional[float] = 1.0,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping and linear warmup — the standard
    diffusion fine-tune recipe."""
    if warmup_steps:
        lr = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    else:
        lr = learning_rate
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*parts)


def make_train_step(
    apply_fn: Callable[..., jax.Array],
    optimizer: optax.GradientTransformation,
    loss_cfg: LossConfig = LossConfig(),
    *,
    ema_decay: Optional[float] = None,
    remat: bool = False,
    donate: bool = True,
):
    """Build ``step(state, batch, rng) -> (state, metrics)``.

    apply_fn(params, x_t, t, *cond) -> prediction, where ``cond`` is
    whatever conditioning tuple the model takes (context, pooled, ...).
    ``batch`` is ``(x0, *cond)``: clean latents plus conditioning, batch
    leading. x_t/t arrive in x0's dtype / fp32-time; the objective math
    runs fp32 (train/losses.py).

    remat=True wraps apply_fn in jax.checkpoint (policy: save matmul
    outputs) — activations are recomputed in the backward pass, trading
    ~1/3 more FLOPs for fitting larger batches in HBM.
    """
    if remat:
        apply_fn = jax.checkpoint(
            apply_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def loss_fn(params, x0, cond, rng):
        rt, rn = jax.random.split(rng)
        t = sample_timesteps(rt, x0.shape[0], loss_cfg)
        noise = jax.random.normal(rn, x0.shape, jnp.float32)
        x_t, target = q_sample(x0, noise, t, loss_cfg)
        pred = apply_fn(params, x_t.astype(x0.dtype), t, *cond)
        return diffusion_loss(pred, target, loss_weights(t, loss_cfg))

    def step(state: TrainState, batch, rng: jax.Array):
        x0, *cond = batch
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, x0, tuple(cond), rng)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = jnp.float32(ema_decay if ema_decay is not None else 0.9999)
            ema = jax.tree.map(
                lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d),
                ema, params)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(state.step + 1, params, opt_state, ema), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
