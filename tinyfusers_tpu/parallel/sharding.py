"""Tensor-parallel partition rules for model param trees.

Megatron-style TP over the ``model`` mesh axis, applied by param-tree path
(new capability vs the single-GPU reference; SURVEY.md §2.6/§7):

- column-parallel (shard output features): q/k/v projections, MLP
  up-projections (fc1, GEGLU proj). weight (in, out) -> P(None, "model"),
  bias -> P("model").
- row-parallel (shard input features): attention output projections and
  MLP down-projections. weight -> P("model", None), bias replicated
  (XLA/GSPMD inserts the all-reduce after the partial matmul).
- everything else (norms, convs, embeddings, time embed) replicated;
  batch parallelism over the ``data`` axis covers them.

With jit + NamedSharding-annotated params, GSPMD propagates these and
inserts the collectives — no hand-written psum.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

COLUMN_PARALLEL = {"to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "fc1", "proj"}
ROW_PARALLEL = {"to_out", "out_proj", "fc2", "out"}


def _path_names(path) -> list:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return names


def _leaf_spec(path, leaf) -> P:
    names = _path_names(path)
    if len(names) < 2:
        return P()
    field = names[-1]  # "weight" | "bias" | quant "values"/"scales"
    module = names[-2]
    # Only shard 2D matmul weights; convs/norms/embeddings stay replicated.
    # GEGLU's "proj"/"out" live under an "ff" parent; plain "out" elsewhere
    # (e.g. out_conv) is filtered by ndim.
    # Matmul weights are 2D (in, out), or 3D (layers, in, out) when layers
    # are stacked for lax.scan (models/clip.py); a leading stack axis is
    # never sharded.
    if module in COLUMN_PARALLEL:
        if field in ("weight", "values", "scales") and leaf.ndim in (2, 3):
            lead = (None,) * (leaf.ndim - 2)
            return P(*lead, None, MODEL_AXIS)
        if field == "bias" and leaf.ndim in (1, 2):
            lead = (None,) * (leaf.ndim - 1)
            return P(*lead, MODEL_AXIS)
    if module in ROW_PARALLEL:
        if field in ("weight", "values") and leaf.ndim in (2, 3):
            lead = (None,) * (leaf.ndim - 2)
            return P(*lead, MODEL_AXIS, None)
        # bias and scales after a row-parallel matmul are per-output -> replicated
        return P()
    return P()


def tp_spec_tree(params) -> Any:
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(_leaf_spec, params)


def shard_params(params, mesh: Mesh):
    """device_put each leaf with its TP NamedSharding."""
    specs = tp_spec_tree(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def sharding_tree(params, mesh: Mesh):
    specs = tp_spec_tree(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
