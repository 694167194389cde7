"""LoRA adapter loading and merging.

New capability (no reference analog): apply low-rank adapters to SD
weights, W <- W + scale * (alpha/r) * up @ down, merged into the param
tree ahead of jit — zero runtime cost, quantization-compatible (merge
before quantize_params).

Supported key layout: the common kohya-ss safetensors convention,
  lora_unet_<module>_lora_down.weight / _lora_up.weight / .alpha
  lora_te_<module>_...   (text encoder)
with diffusers-style module names (down_blocks_0_attentions_1_...). The
mapper translates those to our param-tree paths; unknown modules are
reported, not silently dropped (contrast reference state.py's
"skipped:" prints).
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

from ..models import unet as unet_model

# our path: tuple of keys into the param tree
Path = Tuple

_ATTN_LEAF = {
    "to_q": ("to_q",), "to_k": ("to_k",), "to_v": ("to_v",),
    "to_out_0": ("to_out",),
    "ff_net_0_proj": ("ff", "proj"), "ff_net_2": ("ff", "out"),
}

_TE_LEAF = {
    "q_proj": ("self_attn", "q_proj"), "k_proj": ("self_attn", "k_proj"),
    "v_proj": ("self_attn", "v_proj"), "out_proj": ("self_attn", "out_proj"),
    "fc1": ("mlp", "fc1"), "fc2": ("mlp", "fc2"),
}


def _unet_attention_positions(cfg) -> Dict[Tuple[int, int], Tuple[str, int]]:
    """(diffusers block kind, idx) mapping. For SD1.x topology:
    down_blocks.{b}.attentions.{a} -> ("input", our input block index),
    mid_block.attentions.0 -> ("middle",), up_blocks.{b}.attentions.{a}
    -> ("output", index)."""
    inp, mid, outp = unet_model.build_plan(cfg)
    down = {}
    a_seen = {}
    for i, block in enumerate(inp):
        for spec in block:
            if isinstance(spec, unet_model.AttnSpec):
                # diffusers groups 2 attentions per down block, split by
                # downsamples: our input blocks 1,2 -> down 0; 4,5 -> 1; ...
                b = (i - 1) // 3
                a = a_seen.get(b, 0)
                a_seen[b] = a + 1
                down[(b, a)] = i
    up = {}
    a_seen = {}
    for i, block in enumerate(outp):
        for spec in block:
            if isinstance(spec, unet_model.AttnSpec):
                b = i // 3
                a = a_seen.get(b, 0)
                a_seen[b] = a + 1
                up[(b, a)] = i
    return {"down": down, "up": up}


_KOHYA_UNET = re.compile(
    r"lora_unet_(?:"
    r"down_blocks_(\d+)_attentions_(\d+)|"
    r"mid_block_attentions_0|"
    r"up_blocks_(\d+)_attentions_(\d+)"
    r")_transformer_blocks_(\d+)_(attn\d)_(to_q|to_k|to_v|to_out_0)$"
    r"|lora_unet_(?:"
    r"down_blocks_(\d+)_attentions_(\d+)|"
    r"mid_block_attentions_0|"
    r"up_blocks_(\d+)_attentions_(\d+)"
    r")_transformer_blocks_(\d+)_(ff_net_0_proj|ff_net_2)$"
)

_KOHYA_TE = re.compile(
    r"lora_te_text_model_encoder_layers_(\d+)_"
    r"(?:self_attn_(q_proj|k_proj|v_proj|out_proj)|mlp_(fc1|fc2))$"
)


def parse_kohya_module(name: str, cfg) -> Path:
    """kohya module name (without lora_down/up suffix) -> our tree path.
    Raises KeyError for unsupported modules."""
    pos = _unet_attention_positions(cfg)
    m = _KOHYA_UNET.match(name)
    if m:
        g = m.groups()
        if g[4] is not None:  # attention branch
            db, da, ub, ua, depth, attn, leaf = g[0], g[1], g[2], g[3], g[4], g[5], g[6]
        else:  # ff branch
            db, da, ub, ua, depth, leaf = g[7], g[8], g[9], g[10], g[11], g[12]
            attn = None
        if db is not None:
            blk = ("input", pos["down"][(int(db), int(da))])
        elif ub is not None:
            blk = ("output", pos["up"][(int(ub), int(ua))])
        else:
            blk = ("middle",)
        # locate the AttnSpec element inside the block
        inp, mid, outp = unet_model.build_plan(cfg)
        if blk[0] == "middle":
            block, bpath = mid, ("middle",)
        elif blk[0] == "input":
            block, bpath = inp[blk[1]], ("input", blk[1])
        else:
            block, bpath = outp[blk[1]], ("output", blk[1])
        attn_idx = next(j for j, s in enumerate(block)
                        if isinstance(s, unet_model.AttnSpec))
        base = bpath + (attn_idx, "blocks", int(depth))
        if attn is not None:
            return base + (attn,) + _ATTN_LEAF[leaf]
        return base + _ATTN_LEAF[leaf]
    m = _KOHYA_TE.match(name)
    if m:
        layer, attn_leaf, mlp_leaf = m.groups()
        leaf = _TE_LEAF[attn_leaf or mlp_leaf]
        return ("__te__", int(layer)) + leaf
    raise KeyError(name)


def group_lora_state(state: Dict[str, np.ndarray]):
    """{module: {'down', 'up', 'alpha'}} from a flat lora state dict."""
    mods: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state.items():
        if k.endswith(".lora_down.weight"):
            mods.setdefault(k[: -len(".lora_down.weight")], {})["down"] = v
        elif k.endswith(".lora_up.weight"):
            mods.setdefault(k[: -len(".lora_up.weight")], {})["up"] = v
        elif k.endswith(".alpha"):
            mods.setdefault(k[: -len(".alpha")], {})["alpha"] = v
    return mods


def _tree_get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _tree_update(tree, path, value):
    if not path:
        return value
    if isinstance(tree, list):
        out = list(tree)
        out[path[0]] = _tree_update(tree[path[0]], path[1:], value)
        return out
    out = dict(tree)
    out[path[0]] = _tree_update(tree[path[0]], path[1:], value)
    return out


def merge_lora(params, lora_state: Dict[str, np.ndarray], *,
               scale: float = 1.0, cfg=None) -> Tuple[dict, List[str]]:
    """Merge a kohya-format LoRA into {'unet', 'clip'} params.

    Returns (new_params, skipped_module_names). Weights stay in our
    (in, out) layout: delta = (up @ down).T * (alpha/r) * scale.
    CLIP deltas index into the scan-stacked layer axis.
    """
    from ..pipeline import sd as sd_pipeline

    cfg = cfg or sd_pipeline.SD15
    mods = group_lora_state(lora_state)
    skipped: List[str] = []
    new = params
    for name, t in mods.items():
        if "down" not in t or "up" not in t:
            skipped.append(name)
            continue
        try:
            path = parse_kohya_module(name, cfg.unet)
        except KeyError:
            skipped.append(name)
            continue
        down = np.asarray(t["down"], np.float32)   # (r, in)
        up = np.asarray(t["up"], np.float32)       # (out, r)
        r = down.shape[0]
        alpha = float(np.asarray(t.get("alpha", r)))
        delta = (up @ down).T * (alpha / r) * scale  # (in, out)
        if path[0] == "__te__":
            layer = path[1]
            leaf_path = ("clip", "layers") + path[2:] + ("weight",)
            w = _tree_get(new, leaf_path)           # (L, in, out)
            w = w.at[layer].add(delta.astype(w.dtype)) if hasattr(w, "at") \
                else w + 0  # jax array expected
            new = _tree_update(new, leaf_path, w)
        else:
            leaf_path = ("unet",) + path + ("weight",)
            w = _tree_get(new, leaf_path)
            new = _tree_update(new, leaf_path, w + delta.astype(w.dtype))
    return new, skipped


def load_lora(path) -> Dict[str, np.ndarray]:
    from . import safetensors_io

    return safetensors_io.load_state_dict(path)
