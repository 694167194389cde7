"""LoRA fine-tuning: train low-rank adapters, base weights frozen.

Complements io/lora.py (which loads + merges externally-trained kohya
LoRAs): here the adapters are the *trainable* tree and the base params
are a frozen argument, so optimizer state is O(rank) and the base can
stay quantized/bf16. The delta is merged at trace time per step —
W_eff = W + (alpha/rank) * A @ B — which XLA folds into the surrounding
program; there is no separate "merged copy" of the model in HBM.
"""
from __future__ import annotations

from typing import Any, Callable, FrozenSet, Optional

import jax
import jax.numpy as jnp
import optax

from .losses import LossConfig, diffusion_loss, loss_weights, q_sample, \
    sample_timesteps
from .step import TrainState

# Attention + FF projections, the standard LoRA target set for SD UNets
# and DiT/MMDiT trunks (matches the module names io/lora.py maps).
DEFAULT_TARGETS: FrozenSet[str] = frozenset(
    {"to_q", "to_k", "to_v", "to_out", "qkv",
     "q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"}
)


def _is_target(path, leaf, targets) -> bool:
    names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
    if len(names) < 2 or names[-1] != "weight":
        return False
    # plain 2D (in, out) matmul weights, or scan-stacked (L, in, out)
    return names[-2] in targets and leaf.ndim in (2, 3)


def init_lora(
    rng: jax.Array,
    params: Any,
    rank: int = 8,
    targets: FrozenSet[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Any:
    """Adapter tree mirroring ``params``: targeted weights get
    {"a": (..., in, r) ~ N(0, 1/r), "b": (..., r, out) = 0} (so the
    initial delta is zero); everything else maps to None."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(flat))
    leaves = []
    for key, (path, leaf) in zip(keys, flat):
        if not _is_target(path, leaf, targets):
            leaves.append(None)
            continue
        *stack, fan_in, fan_out = leaf.shape
        a = jax.random.normal(
            key, (*stack, fan_in, rank), dtype) * (1.0 / rank)
        b = jnp.zeros((*stack, rank, fan_out), dtype)
        leaves.append({"a": a, "b": b})
    return jax.tree_util.tree_unflatten(treedef, leaves)


def merge(params: Any, lora: Any, scale: float = 1.0) -> Any:
    """params + scale * a @ b where adapters exist (trace-time)."""

    def _merge(p, ab):
        if ab is None:
            return p
        delta = jnp.matmul(ab["a"], ab["b"])  # batched over stack dims
        return (p.astype(jnp.float32)
                + scale * delta.astype(jnp.float32)).astype(p.dtype)

    return jax.tree.map(_merge, params, lora,
                        is_leaf=lambda x: x is None or isinstance(x, dict)
                        and set(x) == {"a", "b"})


def make_lora_train_step(
    apply_fn: Callable[..., jax.Array],
    optimizer: optax.GradientTransformation,
    loss_cfg: LossConfig = LossConfig(),
    *,
    scale: float = 1.0,
    remat: bool = False,
):
    """``step(state, base_params, batch, rng) -> (state, metrics)`` where
    ``state.params`` is the adapter tree (init_lora) and base_params stay
    frozen (not donated, may be bf16/quantized)."""
    if remat:
        apply_fn = jax.checkpoint(
            apply_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def loss_fn(lora, base_params, x0, cond, rng):
        rt, rn = jax.random.split(rng)
        t = sample_timesteps(rt, x0.shape[0], loss_cfg)
        noise = jax.random.normal(rn, x0.shape, jnp.float32)
        x_t, target = q_sample(x0, noise, t, loss_cfg)
        merged = merge(base_params, lora, scale)
        pred = apply_fn(merged, x_t.astype(x0.dtype), t, *cond)
        return diffusion_loss(pred, target, loss_weights(t, loss_cfg))

    def step(state: TrainState, base_params, batch, rng: jax.Array):
        x0, *cond = batch
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, base_params, x0, tuple(cond), rng)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        lora = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return TrainState(state.step + 1, lora, opt_state, None), metrics

    return jax.jit(step, donate_argnums=(0,))
