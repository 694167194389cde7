"""High-level checkpoint loading facade.

load_sd_params(path, cfg): torch-zip .ckpt or .safetensors -> full
{'clip','unet','vae'} param tree in the requested dtype, optionally
quantized and device_put with shardings — the streaming replacement for
the reference's torch_load + recursive update_state path
(example/sd1.py:40-41, storage/state.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import safetensors_io, state_map, torch_pickle


def load_state_dict(path) -> Dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".safetensors":
        return safetensors_io.load_state_dict(path)
    return torch_pickle.load_state_dict(path)


def load_sd_params(path, cfg=None, *, dtype=jnp.bfloat16, shardings=None):
    """Load a full SD v1 checkpoint into a param tree.

    shardings: optional pytree of NamedSharding matching the param tree
    (parallel.sharding_tree); leaves are device_put respecting it.
    """
    from ..pipeline import sd as sd_pipeline

    cfg = cfg or sd_pipeline.SD15
    state = load_state_dict(path)
    # SD1.x stores the text encoder in HF CLIP layout
    # (cond_stage_model.transformer.text_model.*); SD2.x in original
    # OpenCLIP layout (cond_stage_model.model.transformer.resblocks.*).
    if any(k.startswith("cond_stage_model.model.") for k in state):
        clip_params = state_map.openclip_from_state(
            state, cfg.clip, "cond_stage_model.model")
    else:
        clip_params = state_map.clip_from_state(state, cfg.clip)
    params = {
        "clip": clip_params,
        "unet": state_map.unet_from_state(state, cfg.unet),
        "vae": state_map.vae_from_state(state, cfg.vae),
    }

    def put(x, sh=None):
        arr = jnp.asarray(np.asarray(x), dtype=dtype if np.issubdtype(
            np.asarray(x).dtype, np.floating) else None)
        if sh is not None:
            arr = jax.device_put(arr, sh)
        return arr

    if shardings is None:
        return jax.tree.map(put, params)
    return jax.tree.map(put, params, shardings)


def load_controlnet_params(path, cfg=None, *, dtype=jnp.bfloat16):
    """Load a ControlNet checkpoint (lllyasviel `control_model.*` layout,
    .ckpt/.pth torch-zip or .safetensors) into the models/controlnet.py
    param tree. Pair with sd.generate(..., control=(params, hint, s))."""
    from ..models import unet as unet_model

    cfg = cfg or unet_model.SD15_CONFIG
    state = load_state_dict(path)
    params = state_map.controlnet_from_state(state, cfg)

    def put(x):
        arr = np.asarray(x)
        return jnp.asarray(arr, dtype=dtype if np.issubdtype(
            arr.dtype, np.floating) else None)

    return jax.tree.map(put, params)


def save_sd_checkpoint(params, path, cfg=None) -> None:
    """Export a param tree to a .safetensors SD-format checkpoint — the
    save side the reference stubbed out (storage/state.py:25-26)."""
    from ..pipeline import sd as sd_pipeline

    cfg = cfg or sd_pipeline.SD15
    state = state_map.sd_state_from_params(params, cfg)
    safetensors_io.save_state_dict(
        {k: np.asarray(v) for k, v in state.items()}, path
    )


def load_sdxl_params(path, cfg=None, *, dtype=jnp.bfloat16):
    """SDXL-base checkpoint (.safetensors or torch-zip) -> full
    {'clip_l','clip_g','unet','vae'} param tree."""
    from ..pipeline import sdxl as sdxl_pipeline

    cfg = cfg or sdxl_pipeline.SDXL_BASE
    state = load_state_dict(path)
    params = state_map.sdxl_params_from_state(state, cfg)

    def put(x):
        arr = np.asarray(x)
        if np.issubdtype(arr.dtype, np.floating):
            return jnp.asarray(arr, dtype=dtype)
        return jnp.asarray(arr)

    return jax.tree.map(put, params)
