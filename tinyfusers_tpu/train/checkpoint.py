"""Train-state checkpointing: save/resume a whole TrainState
(params + optimizer moments + EMA + step) as one safetensors file.

Uses the framework's own safetensors writer (io/safetensors_io.py) — no
torch, no pickle — with pytree paths flattened to dotted keys. The
reference's save side was an unimplemented stub
(storage/state.py:25-26); training resume is new scope entirely.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..io import safetensors_io
from .step import TrainState


def _flatten(tree: Any, prefix: str):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        out[".".join([prefix, *names]) if names else prefix] = np.asarray(leaf)
    return out


def _unflatten_into(tree: Any, prefix: str, state: dict) -> Any:
    def rebuild(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        key = ".".join([prefix, *names]) if names else prefix
        arr = state[key]
        if arr.size != leaf.size:
            raise ValueError(
                f"checkpoint/state shape mismatch at {key}: "
                f"{arr.shape} vs {leaf.shape}")
        return jnp.asarray(arr, dtype=leaf.dtype).reshape(leaf.shape)

    return jax.tree_util.tree_map_with_path(rebuild, tree)


def save_train_state(state: TrainState, path) -> None:
    flat = {"step": np.asarray(state.step)}
    flat.update(_flatten(state.params, "params"))
    flat.update(_flatten(state.opt_state, "opt"))
    if state.ema_params is not None:
        flat.update(_flatten(state.ema_params, "ema"))
    safetensors_io.save_state_dict(flat, path)


def load_train_state(template: TrainState, path) -> TrainState:
    """Restore into the structure (and shardings' dtypes) of ``template``
    — build it exactly as at save time (TrainState.create with the same
    params/optimizer), then load."""
    flat = safetensors_io.load_state_dict(path)
    ema = template.ema_params
    if ema is not None:
        ema = _unflatten_into(ema, "ema", flat)
    return TrainState(
        step=jnp.asarray(flat["step"], jnp.int32).reshape(()),
        params=_unflatten_into(template.params, "params", flat),
        opt_state=_unflatten_into(template.opt_state, "opt", flat),
        ema_params=ema,
    )
