"""SD v1 checkpoint -> tinyfusers_tpu param trees.

Replaces the reference's recursive attribute-walk weight mapper
(storage/state.py:4-23 + the namedtuple scaffolding in variants/sd.py:10-12,
which exists only so object paths match checkpoint key strings). Here the
mapping is explicit and total: each builder walks OUR model structure
(models/{unet,vae,clip}.build_plan / init layout), pulls the matching
checkpoint keys, and errors on anything missing — no silent
"skipped: <path>" prints.

Layout transforms (reference stores torch layouts; we are TPU-native):
- linear weight (out, in)  -> transpose -> (in, out)
- conv weight  OIHW        -> transpose -> HWIO
- CLIP's 12 layers         -> stacked along a leading axis for lax.scan

Checkpoint prefixes (SD v1):
  model.diffusion_model.*                        UNet
  first_stage_model.*                            VAE
  cond_stage_model.transformer.text_model.*      CLIP
"""
from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from ..models import clip as clip_model
from ..models import unet as unet_model
from ..models import vae as vae_model

Get = Callable[[str], np.ndarray]


def _linear(get: Get, prefix: str, bias: bool = True):
    p = {"weight": np.ascontiguousarray(get(prefix + ".weight").T)}
    if bias:
        p["bias"] = get(prefix + ".bias")
    return p


def _conv(get: Get, prefix: str):
    w = get(prefix + ".weight")  # OIHW
    return {
        "weight": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),  # -> HWIO
        "bias": get(prefix + ".bias"),
    }


def _norm(get: Get, prefix: str):
    return {"weight": get(prefix + ".weight"), "bias": get(prefix + ".bias")}


# ---------------------------------------------------------------------------
# UNet  (ckpt block indices line up with our build_plan order by design)
# ---------------------------------------------------------------------------

def _unet_res(get: Get, prefix: str, spec: unet_model.ResSpec):
    p = {
        "norm1": _norm(get, f"{prefix}.in_layers.0"),
        "conv1": _conv(get, f"{prefix}.in_layers.2"),
        "emb": _linear(get, f"{prefix}.emb_layers.1"),
        "norm2": _norm(get, f"{prefix}.out_layers.0"),
        "conv2": _conv(get, f"{prefix}.out_layers.3"),
    }
    if spec.in_ch != spec.out_ch:
        p["skip"] = _conv(get, f"{prefix}.skip_connection")
    return p


def _unet_transformer_block(get: Get, prefix: str):
    return {
        "norm1": _norm(get, f"{prefix}.norm1"),
        "attn1": {
            "to_q": _linear(get, f"{prefix}.attn1.to_q", bias=False),
            "to_k": _linear(get, f"{prefix}.attn1.to_k", bias=False),
            "to_v": _linear(get, f"{prefix}.attn1.to_v", bias=False),
            "to_out": _linear(get, f"{prefix}.attn1.to_out.0"),
        },
        "norm2": _norm(get, f"{prefix}.norm2"),
        "attn2": {
            "to_q": _linear(get, f"{prefix}.attn2.to_q", bias=False),
            "to_k": _linear(get, f"{prefix}.attn2.to_k", bias=False),
            "to_v": _linear(get, f"{prefix}.attn2.to_v", bias=False),
            "to_out": _linear(get, f"{prefix}.attn2.to_out.0"),
        },
        "norm3": _norm(get, f"{prefix}.norm3"),
        "ff": {
            "proj": _linear(get, f"{prefix}.ff.net.0.proj"),
            "out": _linear(get, f"{prefix}.ff.net.2"),
        },
    }


def _unet_spatial_transformer(get: Get, prefix: str, spec: unet_model.AttnSpec):
    return {
        "norm": _norm(get, f"{prefix}.norm"),
        "proj_in": _conv(get, f"{prefix}.proj_in"),
        "blocks": [
            _unet_transformer_block(get, f"{prefix}.transformer_blocks.{d}")
            for d in range(spec.depth)
        ],
        "proj_out": _conv(get, f"{prefix}.proj_out"),
    }


def _unet_block(get: Get, prefix: str, block, cfg, which: str):
    out = []
    for j, spec in enumerate(block):
        sub = f"{prefix}.{j}"
        if spec == "conv_in":
            out.append(_conv(get, sub))
        elif isinstance(spec, unet_model.ResSpec):
            out.append(_unet_res(get, sub, spec))
        elif isinstance(spec, unet_model.AttnSpec):
            out.append(_unet_spatial_transformer(get, sub, spec))
        elif isinstance(spec, unet_model.SampleSpec):
            # Downsample stores its conv under .op, Upsample under .conv
            # (reference vision/unet.py:79-90).
            key = f"{sub}.op" if spec.mode == "down" else f"{sub}.conv"
            out.append({"conv": _conv(get, key)})
        else:
            raise ValueError(spec)
    return out


def unet_from_state(state: Dict[str, np.ndarray], cfg=None):
    cfg = cfg or unet_model.SD15_CONFIG
    prefix = "model.diffusion_model"

    def get(k: str) -> np.ndarray:
        return state[f"{prefix}.{k}"]

    inp, mid, outp = unet_model.build_plan(cfg)
    return {
        "time_embed": {
            "fc1": _linear(get, "time_embed.0"),
            "fc2": _linear(get, "time_embed.2"),
        },
        "input": [
            _unet_block(get, f"input_blocks.{i}", b, cfg, "in")
            for i, b in enumerate(inp)
        ],
        "middle": _unet_block(get, "middle_block", mid, cfg, "mid"),
        "output": [
            _unet_block(get, f"output_blocks.{i}", b, cfg, "out")
            for i, b in enumerate(outp)
        ],
        "out_norm": _norm(get, "out.0"),
        "out_conv": _conv(get, "out.2"),
    }


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_resnet(get: Get, prefix: str, in_ch: int, out_ch: int):
    p = {
        "norm1": _norm(get, f"{prefix}.norm1"),
        "conv1": _conv(get, f"{prefix}.conv1"),
        "norm2": _norm(get, f"{prefix}.norm2"),
        "conv2": _conv(get, f"{prefix}.conv2"),
    }
    if in_ch != out_ch:
        p["nin_shortcut"] = _conv(get, f"{prefix}.nin_shortcut")
    return p


def _vae_mid(get: Get, prefix: str, ch: int):
    return {
        "block_1": _vae_resnet(get, f"{prefix}.block_1", ch, ch),
        "attn_1": {
            "norm": _norm(get, f"{prefix}.attn_1.norm"),
            "q": _conv(get, f"{prefix}.attn_1.q"),
            "k": _conv(get, f"{prefix}.attn_1.k"),
            "v": _conv(get, f"{prefix}.attn_1.v"),
            "proj_out": _conv(get, f"{prefix}.attn_1.proj_out"),
        },
        "block_2": _vae_resnet(get, f"{prefix}.block_2", ch, ch),
    }


def vae_from_state(state: Dict[str, np.ndarray], cfg=None):
    cfg = cfg or vae_model.SD_VAE_CONFIG

    def get(k: str) -> np.ndarray:
        return state[f"first_stage_model.{k}"]

    enc, chs = vae_model._stage_channels(cfg)
    souts = chs[1:]
    top = chs[-1]

    down = []
    for i, (cin, cout) in enumerate(enc):
        stage = {
            "block": [
                _vae_resnet(get, f"encoder.down.{i}.block.0", cin, cout),
                _vae_resnet(get, f"encoder.down.{i}.block.1", cout, cout),
            ]
        }
        if i != len(enc) - 1:
            stage["downsample"] = _conv(get, f"encoder.down.{i}.downsample.conv")
        down.append(stage)

    up = []
    for i in range(len(souts)):
        cin = souts[i + 1] if i + 1 < len(souts) else souts[-1]
        cout = souts[i]
        stage = {
            "block": [
                _vae_resnet(get, f"decoder.up.{i}.block.0", cin, cout),
                _vae_resnet(get, f"decoder.up.{i}.block.1", cout, cout),
                _vae_resnet(get, f"decoder.up.{i}.block.2", cout, cout),
            ]
        }
        if i != 0:
            stage["upsample"] = _conv(get, f"decoder.up.{i}.upsample.conv")
        up.append(stage)

    params = {
        "encoder": {
            "conv_in": _conv(get, "encoder.conv_in"),
            "down": down,
            "mid": _vae_mid(get, "encoder.mid", top),
            "norm_out": _norm(get, "encoder.norm_out"),
            "conv_out": _conv(get, "encoder.conv_out"),
        },
        "decoder": {
            "conv_in": _conv(get, "decoder.conv_in"),
            "mid": _vae_mid(get, "decoder.mid", top),
            "up": up,
            "norm_out": _norm(get, "decoder.norm_out"),
            "conv_out": _conv(get, "decoder.conv_out"),
        },
    }
    if cfg.use_quant_conv:
        params["quant_conv"] = _conv(get, "quant_conv")
        params["post_quant_conv"] = _conv(get, "post_quant_conv")
    return params


# ---------------------------------------------------------------------------
# CLIP (stacks the 12 layers for lax.scan)
# ---------------------------------------------------------------------------

def clip_from_state(state: Dict[str, np.ndarray], cfg=None):
    cfg = cfg or clip_model.CLIPConfig()
    prefix = "cond_stage_model.transformer.text_model"

    def get(k: str) -> np.ndarray:
        return state[f"{prefix}.{k}"]

    def layer(i: int):
        lp = f"encoder.layers.{i}"
        return {
            "layer_norm1": _norm(get, f"{lp}.layer_norm1"),
            "self_attn": {
                "q_proj": _linear(get, f"{lp}.self_attn.q_proj"),
                "k_proj": _linear(get, f"{lp}.self_attn.k_proj"),
                "v_proj": _linear(get, f"{lp}.self_attn.v_proj"),
                "out_proj": _linear(get, f"{lp}.self_attn.out_proj"),
            },
            "layer_norm2": _norm(get, f"{lp}.layer_norm2"),
            "mlp": {
                "fc1": _linear(get, f"{lp}.mlp.fc1"),
                "fc2": _linear(get, f"{lp}.mlp.fc2"),
            },
        }

    import jax

    layers = [layer(i) for i in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    params = {
        "token_embedding": {"weight": get("embeddings.token_embedding.weight")},
        "position_embedding": {"weight": get("embeddings.position_embedding.weight")},
        "layers": stacked,
        "final_layer_norm": _norm(get, "final_layer_norm"),
    }
    if cfg.projection_dim:
        # HF layout stores text_projection as a sibling of text_model
        # (CLIPTextModelWithProjection), shaped (proj_dim, dim).
        parent = prefix.rsplit(".text_model", 1)[0]
        params["text_projection"] = {
            "weight": np.ascontiguousarray(
                state[f"{parent}.text_projection.weight"].T)
        }
    return params


def clip_vision_from_state(state: Dict[str, np.ndarray], cfg,
                           prefix: str = "vision_model"):
    """HF CLIPModel/CLIPVisionModelWithProjection vision tower ->
    models/clip_vision.py param tree.

    Layout (openai/clip-vit-large-patch14):
      {prefix}.embeddings.{class_embedding, patch_embedding.weight,
                           position_embedding.weight}
      {prefix}.pre_layrnorm / post_layernorm      (HF's 'layrnorm' typo)
      {prefix}.encoder.layers.N.{layer_norm1, self_attn.*, layer_norm2,
                                 mlp.fc1/fc2}
      visual_projection.weight  (sibling of the tower, (proj, dim))
    """

    def get(k: str) -> np.ndarray:
        return state[f"{prefix}.{k}"]

    def layer(i: int):
        lp = f"encoder.layers.{i}"
        return {
            "layer_norm1": _norm(get, f"{lp}.layer_norm1"),
            "self_attn": {
                "q_proj": _linear(get, f"{lp}.self_attn.q_proj"),
                "k_proj": _linear(get, f"{lp}.self_attn.k_proj"),
                "v_proj": _linear(get, f"{lp}.self_attn.v_proj"),
                "out_proj": _linear(get, f"{lp}.self_attn.out_proj"),
            },
            "layer_norm2": _norm(get, f"{lp}.layer_norm2"),
            "mlp": {
                "fc1": _linear(get, f"{lp}.mlp.fc1"),
                "fc2": _linear(get, f"{lp}.mlp.fc2"),
            },
        }

    import jax

    patch_w = get("embeddings.patch_embedding.weight")  # (dim, 3, P, P)
    parent = prefix.rsplit(".vision_model", 1)[0] if (
        prefix.endswith(".vision_model")) else ""
    proj_key = (f"{parent}.visual_projection.weight" if parent
                else "visual_projection.weight")
    stacked = jax.tree.map(lambda *xs: np.stack(xs),
                           *[layer(i) for i in range(cfg.num_layers)])
    return {
        "class_embedding": get("embeddings.class_embedding"),
        "patch_embedding": {
            "weight": np.ascontiguousarray(patch_w.transpose(2, 3, 1, 0)),
        },
        "position_embedding": {
            "weight": get("embeddings.position_embedding.weight"),
        },
        "pre_layernorm": _norm(get, "pre_layrnorm"),
        "layers": stacked,
        "post_layernorm": _norm(get, "post_layernorm"),
        "visual_projection": {
            "weight": np.ascontiguousarray(state[proj_key].T),
        },
    }


# ---------------------------------------------------------------------------
# Inverse mapping: param tree -> SD-format state dict (export / save side —
# the reference's get_state_dict was an empty stub, storage/state.py:25-26).
# ---------------------------------------------------------------------------

def _put_linear(out: Dict[str, np.ndarray], prefix: str, p):
    out[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["weight"]).T)
    if "bias" in p:
        out[prefix + ".bias"] = np.asarray(p["bias"])


def _put_conv(out, prefix: str, p):
    out[prefix + ".weight"] = np.ascontiguousarray(
        np.asarray(p["weight"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
    )
    out[prefix + ".bias"] = np.asarray(p["bias"])


def _put_norm(out, prefix: str, p):
    out[prefix + ".weight"] = np.asarray(p["weight"])
    out[prefix + ".bias"] = np.asarray(p["bias"])


def _put_unet_res(out, prefix, p):
    _put_norm(out, f"{prefix}.in_layers.0", p["norm1"])
    _put_conv(out, f"{prefix}.in_layers.2", p["conv1"])
    _put_linear(out, f"{prefix}.emb_layers.1", p["emb"])
    _put_norm(out, f"{prefix}.out_layers.0", p["norm2"])
    _put_conv(out, f"{prefix}.out_layers.3", p["conv2"])
    if "skip" in p:
        _put_conv(out, f"{prefix}.skip_connection", p["skip"])


def _put_unet_st(out, prefix, p):
    _put_norm(out, f"{prefix}.norm", p["norm"])
    _put_conv(out, f"{prefix}.proj_in", p["proj_in"])
    for d, bp in enumerate(p["blocks"]):
        tp = f"{prefix}.transformer_blocks.{d}"
        _put_norm(out, f"{tp}.norm1", bp["norm1"])
        _put_norm(out, f"{tp}.norm2", bp["norm2"])
        _put_norm(out, f"{tp}.norm3", bp["norm3"])
        for attn in ("attn1", "attn2"):
            _put_linear(out, f"{tp}.{attn}.to_q", bp[attn]["to_q"])
            _put_linear(out, f"{tp}.{attn}.to_k", bp[attn]["to_k"])
            _put_linear(out, f"{tp}.{attn}.to_v", bp[attn]["to_v"])
            _put_linear(out, f"{tp}.{attn}.to_out.0", bp[attn]["to_out"])
        _put_linear(out, f"{tp}.ff.net.0.proj", bp["ff"]["proj"])
        _put_linear(out, f"{tp}.ff.net.2", bp["ff"]["out"])
    _put_conv(out, f"{prefix}.proj_out", p["proj_out"])


def unet_to_state(params, cfg=None) -> Dict[str, np.ndarray]:
    cfg = cfg or unet_model.SD15_CONFIG
    prefix = "model.diffusion_model"
    inp, mid, outp = unet_model.build_plan(cfg)
    out: Dict[str, np.ndarray] = {}
    _put_linear(out, f"{prefix}.time_embed.0", params["time_embed"]["fc1"])
    _put_linear(out, f"{prefix}.time_embed.2", params["time_embed"]["fc2"])

    def put_block(bprefix, block, bparams):
        for j, (spec, p) in enumerate(zip(block, bparams)):
            sub = f"{bprefix}.{j}"
            if spec == "conv_in":
                _put_conv(out, sub, p)
            elif isinstance(spec, unet_model.ResSpec):
                _put_unet_res(out, sub, p)
            elif isinstance(spec, unet_model.AttnSpec):
                _put_unet_st(out, sub, p)
            elif isinstance(spec, unet_model.SampleSpec):
                key = f"{sub}.op" if spec.mode == "down" else f"{sub}.conv"
                _put_conv(out, key, p["conv"])

    for i, (b, p) in enumerate(zip(inp, params["input"])):
        put_block(f"{prefix}.input_blocks.{i}", b, p)
    put_block(f"{prefix}.middle_block", mid, params["middle"])
    for i, (b, p) in enumerate(zip(outp, params["output"])):
        put_block(f"{prefix}.output_blocks.{i}", b, p)
    _put_norm(out, f"{prefix}.out.0", params["out_norm"])
    _put_conv(out, f"{prefix}.out.2", params["out_conv"])
    return out


def _put_vae_resnet(out, prefix, p):
    _put_norm(out, f"{prefix}.norm1", p["norm1"])
    _put_conv(out, f"{prefix}.conv1", p["conv1"])
    _put_norm(out, f"{prefix}.norm2", p["norm2"])
    _put_conv(out, f"{prefix}.conv2", p["conv2"])
    if "nin_shortcut" in p:
        _put_conv(out, f"{prefix}.nin_shortcut", p["nin_shortcut"])


def _put_vae_mid(out, prefix, p):
    _put_vae_resnet(out, f"{prefix}.block_1", p["block_1"])
    _put_norm(out, f"{prefix}.attn_1.norm", p["attn_1"]["norm"])
    for name in ("q", "k", "v", "proj_out"):
        _put_conv(out, f"{prefix}.attn_1.{name}", p["attn_1"][name])
    _put_vae_resnet(out, f"{prefix}.block_2", p["block_2"])


def vae_to_state(params, cfg=None) -> Dict[str, np.ndarray]:
    cfg = cfg or vae_model.SD_VAE_CONFIG
    out: Dict[str, np.ndarray] = {}
    pfx = "first_stage_model"
    enc = params["encoder"]
    _put_conv(out, f"{pfx}.encoder.conv_in", enc["conv_in"])
    for i, stage in enumerate(enc["down"]):
        for j, bp in enumerate(stage["block"]):
            _put_vae_resnet(out, f"{pfx}.encoder.down.{i}.block.{j}", bp)
        if "downsample" in stage:
            _put_conv(out, f"{pfx}.encoder.down.{i}.downsample.conv", stage["downsample"])
    _put_vae_mid(out, f"{pfx}.encoder.mid", enc["mid"])
    _put_norm(out, f"{pfx}.encoder.norm_out", enc["norm_out"])
    _put_conv(out, f"{pfx}.encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    _put_conv(out, f"{pfx}.decoder.conv_in", dec["conv_in"])
    _put_vae_mid(out, f"{pfx}.decoder.mid", dec["mid"])
    for i, stage in enumerate(dec["up"]):
        for j, bp in enumerate(stage["block"]):
            _put_vae_resnet(out, f"{pfx}.decoder.up.{i}.block.{j}", bp)
        if "upsample" in stage:
            _put_conv(out, f"{pfx}.decoder.up.{i}.upsample.conv", stage["upsample"])
    _put_norm(out, f"{pfx}.decoder.norm_out", dec["norm_out"])
    _put_conv(out, f"{pfx}.decoder.conv_out", dec["conv_out"])
    if cfg.use_quant_conv:
        _put_conv(out, f"{pfx}.quant_conv", params["quant_conv"])
        _put_conv(out, f"{pfx}.post_quant_conv", params["post_quant_conv"])
    return out


def clip_to_state(params, cfg=None) -> Dict[str, np.ndarray]:
    cfg = cfg or clip_model.CLIPConfig()
    pfx = "cond_stage_model.transformer.text_model"
    out: Dict[str, np.ndarray] = {}
    out[f"{pfx}.embeddings.token_embedding.weight"] = np.asarray(
        params["token_embedding"]["weight"]
    )
    out[f"{pfx}.embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"]["weight"]
    )
    stacked = params["layers"]
    for i in range(cfg.num_layers):
        layer = _tree_index(stacked, i)
        lp = f"{pfx}.encoder.layers.{i}"
        _put_norm(out, f"{lp}.layer_norm1", layer["layer_norm1"])
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _put_linear(out, f"{lp}.self_attn.{name}", layer["self_attn"][name])
        _put_norm(out, f"{lp}.layer_norm2", layer["layer_norm2"])
        _put_linear(out, f"{lp}.mlp.fc1", layer["mlp"]["fc1"])
        _put_linear(out, f"{lp}.mlp.fc2", layer["mlp"]["fc2"])
    _put_norm(out, f"{pfx}.final_layer_norm", params["final_layer_norm"])
    if "text_projection" in params:
        parent = pfx.rsplit(".text_model", 1)[0]
        out[f"{parent}.text_projection.weight"] = np.ascontiguousarray(
            np.asarray(params["text_projection"]["weight"]).T)
    return out


def _tree_index(tree, i: int):
    import jax

    return jax.tree.map(lambda x: np.asarray(x)[i], tree)


def sd_state_from_params(params, cfg) -> Dict[str, np.ndarray]:
    """Full pipeline param tree -> SD-checkpoint-format flat dict."""
    out = {}
    out.update(clip_to_state(params["clip"], cfg.clip))
    out.update(unet_to_state(params["unet"], cfg.unet))
    out.update(vae_to_state(params["vae"], cfg.vae))
    return out


# ---------------------------------------------------------------------------
# SDXL checkpoint mapping.
# Layout (sd_xl_base safetensors):
#   conditioner.embedders.0.transformer.text_model.*   CLIP ViT-L (HF layout)
#   conditioner.embedders.1.model.*                    OpenCLIP bigG (orig layout)
#   model.diffusion_model.*                            UNet (+ label_emb.0.{0,2})
#   first_stage_model.*                                VAE (same as SD1.x)
# ---------------------------------------------------------------------------

def clip_hf_from_state(state, cfg, prefix: str):
    """HF-layout CLIP text tower under an arbitrary prefix (ending in
    ``.text_model``); carries the sibling ``text_projection`` along when
    the config declares one (CLIPTextModelWithProjection layout)."""
    remapped = {
        f"cond_stage_model.transformer.text_model.{k[len(prefix) + 1:]}": v
        for k, v in state.items()
        if k.startswith(prefix + ".")
    }
    if cfg.projection_dim:
        parent = prefix.rsplit(".text_model", 1)[0]
        remapped["cond_stage_model.transformer.text_projection.weight"] = (
            state[f"{parent}.text_projection.weight"])
    return clip_from_state(remapped, cfg)


def openclip_from_state(state, cfg, prefix: str):
    """OpenCLIP text tower (original layout: fused in_proj qkv,
    resblocks.{i}, ln_1/ln_2, c_fc/c_proj, ln_final, text_projection) ->
    our CLIP param tree."""
    import jax

    def get(k):
        return state[f"{prefix}.{k}"]

    d = cfg.dim

    def layer(i):
        lp = f"transformer.resblocks.{i}"
        in_w = get(f"{lp}.attn.in_proj_weight")  # (3d, d)
        in_b = get(f"{lp}.attn.in_proj_bias")    # (3d,)
        qw, kw, vw = in_w[:d], in_w[d:2*d], in_w[2*d:]
        qb, kb, vb = in_b[:d], in_b[d:2*d], in_b[2*d:]
        return {
            "layer_norm1": _norm(get, f"{lp}.ln_1"),
            "self_attn": {
                "q_proj": {"weight": np.ascontiguousarray(qw.T), "bias": qb},
                "k_proj": {"weight": np.ascontiguousarray(kw.T), "bias": kb},
                "v_proj": {"weight": np.ascontiguousarray(vw.T), "bias": vb},
                "out_proj": _linear(get, f"{lp}.attn.out_proj"),
            },
            "layer_norm2": _norm(get, f"{lp}.ln_2"),
            "mlp": {
                "fc1": _linear(get, f"{lp}.mlp.c_fc"),
                "fc2": _linear(get, f"{lp}.mlp.c_proj"),
            },
        }

    import jax as _jax

    layers = [layer(i) for i in range(cfg.num_layers)]
    stacked = _jax.tree.map(lambda *xs: np.stack(xs), *layers)
    params = {
        "token_embedding": {"weight": get("token_embedding.weight")},
        # OpenCLIP stores positional_embedding as a bare parameter.
        "position_embedding": {"weight": get("positional_embedding")},
        "layers": stacked,
        "final_layer_norm": _norm(get, "ln_final"),
    }
    if cfg.projection_dim:
        # text_projection is applied as x @ W -> already (in, out).
        params["text_projection"] = {"weight": get("text_projection")}
    return params


def sdxl_unet_from_state(state, cfg):
    """SDXL UNet: the SD mapping plus the label_emb (ADM) MLP."""
    params = unet_from_state(state, cfg)
    if cfg.adm_in_channels:
        prefix = "model.diffusion_model"

        def get(k):
            return state[f"{prefix}.{k}"]

        params["label_emb"] = {
            "fc1": _linear(get, "label_emb.0.0"),
            "fc2": _linear(get, "label_emb.0.2"),
        }
    return params


def openclip_to_state(params, cfg, prefix: str):
    """Inverse of openclip_from_state (fixture/export side)."""
    out = {}
    out[f"{prefix}.token_embedding.weight"] = np.asarray(
        params["token_embedding"]["weight"])
    out[f"{prefix}.positional_embedding"] = np.asarray(
        params["position_embedding"]["weight"])
    for i in range(cfg.num_layers):
        layer = _tree_index(params["layers"], i)
        lp = f"{prefix}.transformer.resblocks.{i}"
        _put_norm(out, f"{lp}.ln_1", layer["layer_norm1"])
        sa = layer["self_attn"]
        qw = np.asarray(sa["q_proj"]["weight"]).T
        kw = np.asarray(sa["k_proj"]["weight"]).T
        vw = np.asarray(sa["v_proj"]["weight"]).T
        out[f"{lp}.attn.in_proj_weight"] = np.ascontiguousarray(
            np.concatenate([qw, kw, vw], axis=0))
        out[f"{lp}.attn.in_proj_bias"] = np.concatenate([
            np.asarray(sa["q_proj"]["bias"]),
            np.asarray(sa["k_proj"]["bias"]),
            np.asarray(sa["v_proj"]["bias"]),
        ])
        _put_linear(out, f"{lp}.attn.out_proj", sa["out_proj"])
        _put_norm(out, f"{lp}.ln_2", layer["layer_norm2"])
        _put_linear(out, f"{lp}.mlp.c_fc", layer["mlp"]["fc1"])
        _put_linear(out, f"{lp}.mlp.c_proj", layer["mlp"]["fc2"])
    _put_norm(out, f"{prefix}.ln_final", params["final_layer_norm"])
    if "text_projection" in params:
        out[f"{prefix}.text_projection"] = np.asarray(
            params["text_projection"]["weight"])
    return out


def clip_hf_to_state(params, cfg, prefix: str):
    base = clip_to_state(params, cfg)
    old = "cond_stage_model.transformer.text_model"
    parent_new = prefix.rsplit(".text_model", 1)[0]
    out = {}
    for k, v in base.items():
        if k.startswith(old + "."):
            out[f"{prefix}.{k[len(old) + 1:]}"] = v
        else:  # sibling text_projection lives one level up
            out[k.replace("cond_stage_model.transformer", parent_new, 1)] = v
    return out


def sdxl_unet_to_state(params, cfg):
    out = unet_to_state(params, cfg)
    if cfg.adm_in_channels:
        _put_linear(out, "model.diffusion_model.label_emb.0.0",
                    params["label_emb"]["fc1"])
        _put_linear(out, "model.diffusion_model.label_emb.0.2",
                    params["label_emb"]["fc2"])
    return out


def sdxl_state_from_params(params, cfg):
    out = {}
    out.update(clip_hf_to_state(
        params["clip_l"], cfg.clip_l,
        "conditioner.embedders.0.transformer.text_model"))
    out.update(openclip_to_state(
        params["clip_g"], cfg.clip_g, "conditioner.embedders.1.model"))
    out.update(sdxl_unet_to_state(params["unet"], cfg.unet))
    out.update(vae_to_state(params["vae"], cfg.vae))
    return out


def sdxl_params_from_state(state, cfg):
    return {
        "clip_l": clip_hf_from_state(
            state, cfg.clip_l, "conditioner.embedders.0.transformer.text_model"),
        "clip_g": openclip_from_state(
            state, cfg.clip_g, "conditioner.embedders.1.model"),
        "unet": sdxl_unet_from_state(state, cfg.unet),
        "vae": vae_from_state(state, cfg.vae),
    }


# ---------------------------------------------------------------------------
# SD3 / MMDiT checkpoint mapping.
# Layout (sd3_medium*.safetensors single-file state dict):
#   model.diffusion_model.x_embedder.proj.*            patch-embed conv
#   model.diffusion_model.pos_embed                    learned (1, 192*192, dim)
#   model.diffusion_model.t_embedder.mlp.{0,2}.*       timestep MLP
#   model.diffusion_model.y_embedder.mlp.{0,2}.*       pooled-cond MLP
#   model.diffusion_model.context_embedder.*           context linear
#   model.diffusion_model.joint_blocks.{i}.x_block.*   image stream
#   model.diffusion_model.joint_blocks.{i}.context_block.*  text stream
#       (LAST context_block is pre_only: attn.qkv + a 2-chunk
#        adaLN_modulation only — no attn.proj / mlp)
#   model.diffusion_model.final_layer.{linear,adaLN_modulation.1}.*
#   text_encoders.clip_l.transformer.text_model.*      HF CLIP-L (+projection)
#   text_encoders.clip_g.transformer.text_model.*      HF CLIP-G (+projection)
#   first_stage_model.*                                16-channel VAE
# Extends the reference's update_state capability (storage/state.py:4-23)
# to the SD3 backbone the reference never had.
# ---------------------------------------------------------------------------

def _fused_qkv_from_torch(w: np.ndarray, b: np.ndarray, num_heads: int):
    """Torch fused qkv (3d, in) [q|k|v]-major -> our (in, 3d)
    HEAD-INTERLEAVED layout (models/dit.py split_fused_qkv)."""
    d3, din = w.shape
    d = d3 // 3
    hd = d // num_heads
    wt = w.T.reshape(din, 3, num_heads, hd).transpose(0, 2, 1, 3)
    out = {"weight": np.ascontiguousarray(wt.reshape(din, d3))}
    if b is not None:
        out["bias"] = np.ascontiguousarray(
            b.reshape(3, num_heads, hd).transpose(1, 0, 2).reshape(d3))
    return out


def _fused_qkv_to_torch(p, num_heads: int):
    """Inverse of _fused_qkv_from_torch -> (torch_weight, torch_bias)."""
    w = np.asarray(p["weight"])  # (in, 3d) head-interleaved
    din, d3 = w.shape
    d = d3 // 3
    hd = d // num_heads
    wt = w.reshape(din, num_heads, 3, hd).transpose(0, 2, 1, 3).reshape(din, d3)
    tb = None
    if "bias" in p:
        b = np.asarray(p["bias"])
        tb = np.ascontiguousarray(
            b.reshape(num_heads, 3, hd).transpose(1, 0, 2).reshape(d3))
    return np.ascontiguousarray(wt.T), tb


def _crop_pos_embed(pe: np.ndarray, grid: int) -> np.ndarray:
    """Center-crop the stored (1, G*G, dim) learned pos-embed grid to
    (1, grid*grid, dim) — SD3's cropped_pos_embed behavior."""
    g2 = pe.shape[-2]
    g = int(round(g2 ** 0.5))
    if g * g != g2:
        raise ValueError(f"pos_embed token count {g2} is not square")
    if grid > g:
        raise ValueError(f"target grid {grid} exceeds stored grid {g}")
    dim = pe.shape[-1]
    grid2d = pe.reshape(g, g, dim)
    top = (g - grid) // 2
    crop = grid2d[top:top + grid, top:top + grid]
    return np.ascontiguousarray(crop.reshape(1, grid * grid, dim))


def _mmdit_stream_from_state(get: Get, prefix: str, cfg, pre_only: bool):
    d = cfg.dim
    mod_w = get(f"{prefix}.adaLN_modulation.1.weight")  # (6d | 2d, d)
    mod_b = get(f"{prefix}.adaLN_modulation.1.bias")
    if pre_only:
        # pre_only block: adaLN emits only (shift, scale) for the
        # pre-attention LN. Embed into the homogeneous 6-chunk layout
        # with gates/mlp-mods zero: the stream's post-attention output is
        # gated by zero and discarded, so the math is exact.
        w6 = np.zeros((6 * d, d), mod_w.dtype)
        b6 = np.zeros((6 * d,), mod_b.dtype)
        w6[: 2 * d] = mod_w
        b6[: 2 * d] = mod_b
        mod_w, mod_b = w6, b6
    p = {
        "mod": {"weight": np.ascontiguousarray(mod_w.T), "bias": mod_b},
        "qkv": _fused_qkv_from_torch(
            get(f"{prefix}.attn.qkv.weight"),
            get(f"{prefix}.attn.qkv.bias"),
            cfg.num_heads,
        ),
    }
    if getattr(cfg, "qk_norm", None):
        # SD3.5 per-head RMS qk-norm weights (shape (head_dim,), shared
        # across heads — no layout permutation needed).
        p["ln_q"] = {"weight": get(f"{prefix}.attn.ln_q.weight")}
        p["ln_k"] = {"weight": get(f"{prefix}.attn.ln_k.weight")}
    if pre_only:
        z = np.zeros
        dt = mod_w.dtype
        p["proj"] = {"weight": z((d, d), dt), "bias": z((d,), dt)}
        p["mlp"] = {
            "fc1": {"weight": z((d, cfg.mlp_ratio * d), dt),
                    "bias": z((cfg.mlp_ratio * d,), dt)},
            "fc2": {"weight": z((cfg.mlp_ratio * d, d), dt),
                    "bias": z((d,), dt)},
        }
    else:
        p["proj"] = _linear(get, f"{prefix}.attn.proj")
        p["mlp"] = {
            "fc1": _linear(get, f"{prefix}.mlp.fc1"),
            "fc2": _linear(get, f"{prefix}.mlp.fc2"),
        }
    return p


def mmdit_from_state(state: Dict[str, np.ndarray], cfg=None):
    """SD3 checkpoint -> models/mmdit param tree (total, erroring mapping
    like the other builders; reference capability storage/state.py:4-23)."""
    from ..models import mmdit as mmdit_model

    cfg = cfg or mmdit_model.SD3_MEDIUM
    prefix = "model.diffusion_model"

    def get(k: str) -> np.ndarray:
        return state[f"{prefix}.{k}"]

    def layer(i: int):
        last = i == cfg.depth - 1
        return {
            "img": _mmdit_stream_from_state(
                get, f"joint_blocks.{i}.x_block", cfg, pre_only=False),
            "txt": _mmdit_stream_from_state(
                get, f"joint_blocks.{i}.context_block", cfg, pre_only=last),
        }

    import jax

    layers = [layer(i) for i in range(cfg.depth)]
    params = {
        "patch_embed": _conv(get, "x_embedder.proj"),
        "context_embed": _linear(get, "context_embedder"),
        "time_mlp": {
            "fc1": _linear(get, "t_embedder.mlp.0"),
            "fc2": _linear(get, "t_embedder.mlp.2"),
        },
        "pooled_mlp": {
            "fc1": _linear(get, "y_embedder.mlp.0"),
            "fc2": _linear(get, "y_embedder.mlp.2"),
        },
        "blocks": jax.tree.map(lambda *xs: np.stack(xs), *layers),
        "final": {
            "mod": {
                "weight": np.ascontiguousarray(
                    get("final_layer.adaLN_modulation.1.weight").T),
                "bias": get("final_layer.adaLN_modulation.1.bias"),
            },
            "proj": _linear(get, "final_layer.linear"),
        },
    }
    # Real SD3 checkpoints carry a learned pos-embed grid (cropped to this
    # resolution); synthetic/random trees may omit it (model falls back to
    # fixed sin-cos, models/mmdit.py apply).
    if f"{prefix}.pos_embed" in state:
        params["pos_embed"] = _crop_pos_embed(
            get("pos_embed"), cfg.input_size // cfg.patch_size)
    return params


def mmdit_to_state(params, cfg=None) -> Dict[str, np.ndarray]:
    """Inverse mapping (export / test-fixture side). Emits the canonical
    SD3 layout including the pre_only last context_block (proj/mlp and
    the upper 4 mod chunks of that block are NOT emitted — they are
    zero/unreachable by construction)."""
    from ..models import mmdit as mmdit_model

    cfg = cfg or mmdit_model.SD3_MEDIUM
    pfx = "model.diffusion_model"
    out: Dict[str, np.ndarray] = {}
    _put_conv(out, f"{pfx}.x_embedder.proj", params["patch_embed"])
    _put_linear(out, f"{pfx}.context_embedder", params["context_embed"])
    _put_linear(out, f"{pfx}.t_embedder.mlp.0", params["time_mlp"]["fc1"])
    _put_linear(out, f"{pfx}.t_embedder.mlp.2", params["time_mlp"]["fc2"])
    _put_linear(out, f"{pfx}.y_embedder.mlp.0", params["pooled_mlp"]["fc1"])
    _put_linear(out, f"{pfx}.y_embedder.mlp.2", params["pooled_mlp"]["fc2"])

    def put_stream(sp: str, p, pre_only: bool):
        w = np.asarray(p["mod"]["weight"]).T  # (6d, d)
        b = np.asarray(p["mod"]["bias"])
        if pre_only:
            d = cfg.dim
            w, b = w[: 2 * d], b[: 2 * d]
        out[f"{sp}.adaLN_modulation.1.weight"] = np.ascontiguousarray(w)
        out[f"{sp}.adaLN_modulation.1.bias"] = b
        tw, tb = _fused_qkv_to_torch(p["qkv"], cfg.num_heads)
        out[f"{sp}.attn.qkv.weight"] = tw
        out[f"{sp}.attn.qkv.bias"] = tb
        if "ln_q" in p:
            out[f"{sp}.attn.ln_q.weight"] = np.asarray(p["ln_q"]["weight"])
            out[f"{sp}.attn.ln_k.weight"] = np.asarray(p["ln_k"]["weight"])
        if not pre_only:
            _put_linear(out, f"{sp}.attn.proj", p["proj"])
            _put_linear(out, f"{sp}.mlp.fc1", p["mlp"]["fc1"])
            _put_linear(out, f"{sp}.mlp.fc2", p["mlp"]["fc2"])

    for i in range(cfg.depth):
        bp = _tree_index(params["blocks"], i)
        last = i == cfg.depth - 1
        put_stream(f"{pfx}.joint_blocks.{i}.x_block", bp["img"], False)
        put_stream(f"{pfx}.joint_blocks.{i}.context_block", bp["txt"], last)

    out[f"{pfx}.final_layer.adaLN_modulation.1.weight"] = np.ascontiguousarray(
        np.asarray(params["final"]["mod"]["weight"]).T)
    out[f"{pfx}.final_layer.adaLN_modulation.1.bias"] = np.asarray(
        params["final"]["mod"]["bias"])
    _put_linear(out, f"{pfx}.final_layer.linear", params["final"]["proj"])
    if "pos_embed" in params:
        out[f"{pfx}.pos_embed"] = np.asarray(params["pos_embed"])
    return out


def sd3_params_from_state(state, cfg):
    """Full SD3 single-file checkpoint -> pipeline/sd3 param tree. The T5
    tower is loaded when the config declares one AND the checkpoint
    carries it (incl-t5 checkpoint variants)."""
    params = {
        "clip_l": clip_hf_from_state(
            state, cfg.clip_l, "text_encoders.clip_l.transformer.text_model"),
        "clip_g": clip_hf_from_state(
            state, cfg.clip_g, "text_encoders.clip_g.transformer.text_model"),
        "mmdit": mmdit_from_state(state, cfg.mmdit),
        "vae": vae_from_state(state, cfg.vae),
    }
    if getattr(cfg, "t5", None) is not None and any(
            k.startswith(T5_PREFIX + ".") for k in state):
        params["t5"] = t5_from_state(state, cfg.t5)
    return params


def sd3_state_from_params(params, cfg):
    out = {}
    out.update(clip_hf_to_state(
        params["clip_l"], cfg.clip_l,
        "text_encoders.clip_l.transformer.text_model"))
    out.update(clip_hf_to_state(
        params["clip_g"], cfg.clip_g,
        "text_encoders.clip_g.transformer.text_model"))
    out.update(mmdit_to_state(params["mmdit"], cfg.mmdit))
    out.update(vae_to_state(params["vae"], cfg.vae))
    if "t5" in params:
        out.update(t5_to_state(params["t5"], cfg.t5))
    return out


# ---------------------------------------------------------------------------
# T5 encoder mapping (SD3's t5xxl tower; HF T5EncoderModel layout under
# text_encoders.t5xxl.transformer.* in SD3 single-file checkpoints).
# ---------------------------------------------------------------------------

T5_PREFIX = "text_encoders.t5xxl.transformer"


def t5_from_state(state, cfg, prefix: str = T5_PREFIX):
    import jax

    def get(k):
        return state[f"{prefix}.{k}"]

    def nb_linear(k):  # no-bias linear, torch (out,in) -> (in,out)
        return {"weight": np.ascontiguousarray(get(k + ".weight").T)}

    def layer(i):
        lp = f"encoder.block.{i}"
        return {
            "attn_norm": {"weight": get(f"{lp}.layer.0.layer_norm.weight")},
            "attn": {
                "q": nb_linear(f"{lp}.layer.0.SelfAttention.q"),
                "k": nb_linear(f"{lp}.layer.0.SelfAttention.k"),
                "v": nb_linear(f"{lp}.layer.0.SelfAttention.v"),
                "o": nb_linear(f"{lp}.layer.0.SelfAttention.o"),
            },
            "ff_norm": {"weight": get(f"{lp}.layer.1.layer_norm.weight")},
            "ff": {
                "wi_0": nb_linear(f"{lp}.layer.1.DenseReluDense.wi_0"),
                "wi_1": nb_linear(f"{lp}.layer.1.DenseReluDense.wi_1"),
                "wo": nb_linear(f"{lp}.layer.1.DenseReluDense.wo"),
            },
        }

    emb_key = f"{prefix}.shared.weight"
    if emb_key not in state:  # some exports store only encoder.embed_tokens
        emb_key = f"{prefix}.encoder.embed_tokens.weight"
    layers = [layer(i) for i in range(cfg.num_layers)]
    return {
        "token_embedding": {"weight": state[emb_key]},
        "rel_bias": {"weight": get(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight")},
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
        "final_norm": {"weight": get("encoder.final_layer_norm.weight")},
    }


def t5_to_state(params, cfg, prefix: str = T5_PREFIX):
    out = {}
    out[f"{prefix}.shared.weight"] = np.asarray(
        params["token_embedding"]["weight"])
    out[f"{prefix}.encoder.block.0.layer.0.SelfAttention"
        ".relative_attention_bias.weight"] = np.asarray(
        params["rel_bias"]["weight"])
    for i in range(cfg.num_layers):
        lp = f"{prefix}.encoder.block.{i}"
        layer = _tree_index(params["layers"], i)
        out[f"{lp}.layer.0.layer_norm.weight"] = np.asarray(
            layer["attn_norm"]["weight"])
        for name in ("q", "k", "v", "o"):
            out[f"{lp}.layer.0.SelfAttention.{name}.weight"] = (
                np.ascontiguousarray(
                    np.asarray(layer["attn"][name]["weight"]).T))
        out[f"{lp}.layer.1.layer_norm.weight"] = np.asarray(
            layer["ff_norm"]["weight"])
        for name in ("wi_0", "wi_1", "wo"):
            out[f"{lp}.layer.1.DenseReluDense.{name}.weight"] = (
                np.ascontiguousarray(np.asarray(layer["ff"][name]["weight"]).T))
    out[f"{prefix}.encoder.final_layer_norm.weight"] = np.asarray(
        params["final_norm"]["weight"])
    return out


# ---------------------------------------------------------------------------
# ControlNet (lllyasviel layout: `control_model.*`, cldm/cldm.py)
# ---------------------------------------------------------------------------

CONTROLNET_PREFIX = "control_model"


def controlnet_from_state(state: Dict[str, np.ndarray], cfg=None,
                          prefix: str = CONTROLNET_PREFIX):
    """Map a ControlNet checkpoint (torch `control_model.*` keys) to the
    models/controlnet.py param tree. Same encoder-block scheme as
    unet_from_state; hint convs live at even indices of
    input_hint_block (SiLU between), zero convs under zero_convs.{i}.0
    and middle_block_out.0."""
    from ..models import controlnet as cn_model

    cfg = cfg or unet_model.SD15_CONFIG

    def get(k: str) -> np.ndarray:
        return state[f"{prefix}.{k}"]

    inp, mid, _ = unet_model.build_plan(cfg)
    n_hint = len(cn_model._HINT_LADDER) + 1
    skip_chs = cn_model._skip_channels(cfg)
    return {
        "time_embed": {
            "fc1": _linear(get, "time_embed.0"),
            "fc2": _linear(get, "time_embed.2"),
        },
        "input": [
            _unet_block(get, f"input_blocks.{i}", b, cfg, "in")
            for i, b in enumerate(inp)
        ],
        "middle": _unet_block(get, "middle_block", mid, cfg, "mid"),
        "input_hint": [
            _conv(get, f"input_hint_block.{2 * i}") for i in range(n_hint)
        ],
        "zero_convs": [
            _conv(get, f"zero_convs.{i}.0") for i in range(len(skip_chs))
        ],
        "middle_out": _conv(get, "middle_block_out.0"),
    }


def controlnet_to_state(params, cfg=None,
                        prefix: str = CONTROLNET_PREFIX) -> Dict[str, np.ndarray]:
    """Inverse of controlnet_from_state (save-side / fixture builder)."""
    cfg = cfg or unet_model.SD15_CONFIG
    inp, mid, _ = unet_model.build_plan(cfg)
    out: Dict[str, np.ndarray] = {}
    _put_linear(out, f"{prefix}.time_embed.0", params["time_embed"]["fc1"])
    _put_linear(out, f"{prefix}.time_embed.2", params["time_embed"]["fc2"])

    def put_block(bprefix, block, bparams):
        for j, (spec, p) in enumerate(zip(block, bparams)):
            sub = f"{bprefix}.{j}"
            if spec == "conv_in":
                _put_conv(out, sub, p)
            elif isinstance(spec, unet_model.ResSpec):
                _put_unet_res(out, sub, p)
            elif isinstance(spec, unet_model.AttnSpec):
                _put_unet_st(out, sub, p)
            elif isinstance(spec, unet_model.SampleSpec):
                key = f"{sub}.op" if spec.mode == "down" else f"{sub}.conv"
                _put_conv(out, key, p["conv"])
            else:  # pragma: no cover
                raise ValueError(spec)

    for i, b in enumerate(inp):
        put_block(f"{prefix}.input_blocks.{i}", b, params["input"][i])
    put_block(f"{prefix}.middle_block", mid, params["middle"])
    for i, p in enumerate(params["input_hint"]):
        _put_conv(out, f"{prefix}.input_hint_block.{2 * i}", p)
    for i, p in enumerate(params["zero_convs"]):
        _put_conv(out, f"{prefix}.zero_convs.{i}.0", p)
    _put_conv(out, f"{prefix}.middle_block_out.0", params["middle_out"])
    return out
