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

COLUMN_PARALLEL = {"to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj",
                   "fc1", "qkv",
                   # T5 (models/t5.py): q/k/v and both gated-FF ups.
                   # (the VAE mid-attention's 1x1 convs named q/k/v are 4D
                   # and excluded by the ndim filter below)
                   "q", "k", "v", "wi_0", "wi_1"}
ROW_PARALLEL = {"to_out", "out_proj", "fc2",
                "o", "wo"}  # T5 attention-out / FF-down
# Names whose role depends on the parent module:
#  - "proj" under "ff" is the GEGLU up-projection (column); under a
#    DiT/MMDiT attention/stream dict ("attn"/"img"/"txt") it is the
#    attention OUTPUT projection (row); under "final" it is the tiny
#    unpatchify head (replicated).
#  - "out" under "ff" is the FF down-projection (row); elsewhere ("out"
#    convs etc.) it is filtered by ndim / left replicated.
_PROJ_ROW_PARENTS = {"attn", "img", "txt"}
# The fused "qkv" projection's output axis is HEAD-INTERLEAVED by model
# layout (models/dit.py split_fused_qkv), so a plain column shard keeps
# whole heads per device — attention is fully local under TP and the only
# collective is the all-reduce after the row-parallel "proj".


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
    parent = names[-3] if len(names) >= 3 else ""
    # Only shard 2D matmul weights; convs/norms/embeddings stay replicated.
    # Matmul weights are 2D (in, out), or 3D (layers, in, out) when layers
    # are stacked for lax.scan (models/clip.py, dit/mmdit blocks); a
    # leading stack axis is never sharded.
    if module == "proj":
        if parent in _PROJ_ROW_PARENTS:
            module = "out_proj"       # attention output -> row-parallel
        elif parent == "ff":
            module = "fc1"            # GEGLU up-projection -> column
        else:
            return P()                # e.g. final.proj unpatchify head
    elif module == "out" and parent == "ff":
        module = "fc2"                # FF down-projection -> row
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


# ---------------------------------------------------------------------------
# FSDP (ZeRO-3 style): shard params + optimizer state over the DATA axis.
# ---------------------------------------------------------------------------

def _fsdp_leaf_spec(data_size: int, min_size: int, path, leaf) -> P:
    """TP spec first (the trailing path names are the same whether the
    leaf lives under params, ema_params, or inside optax's mu/nu trees),
    then the largest still-unsharded axis divisible by the data-axis size
    takes the ``data`` shard. Small leaves (norm scales, biases) stay
    replicated — the all-gather latency would dwarf the memory win."""
    from .mesh import DATA_AXIS

    tspec = _leaf_spec(path, leaf)
    if leaf.ndim == 0 or leaf.size < min_size:
        return tspec
    spec = list(tspec) + [None] * (leaf.ndim - len(tspec))
    for axis in sorted(range(leaf.ndim), key=lambda a: -leaf.shape[a]):
        if spec[axis] is None and leaf.shape[axis] % data_size == 0:
            spec[axis] = DATA_AXIS
            return P(*spec)
    return tspec


def fsdp_spec_tree(tree, mesh: Mesh, *, min_size: int = 2 ** 16) -> Any:
    """PartitionSpec pytree for FSDP+TP over ``tree`` (a param tree, a
    whole TrainState, or an optimizer state — any pytree whose leaf paths
    end in the param-tree names).

    TPU-first ZeRO: the spec is the entire implementation. jit with these
    shardings and GSPMD inserts the weight all-gathers in the forward/
    backward and the reduce-scatter of gradients — the same compiled-
    collective design as the TP rules above, no hand-written gather code.
    Memory per device drops toward 1/(data*model) of the state.
    """
    from .mesh import DATA_AXIS

    data_size = mesh.shape.get(DATA_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _fsdp_leaf_spec(data_size, min_size, p, x), tree)


def shard_fsdp(tree, mesh: Mesh, *, min_size: int = 2 ** 16):
    """device_put every leaf of ``tree`` with its FSDP+TP NamedSharding."""
    specs = fsdp_spec_tree(tree, mesh, min_size=min_size)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)
