"""CLIP vision transformer (ViT image tower) — the scorer side of the
BASELINE accuracy requirement ("CLIP score / FID parity").

New capability relative to the reference (Fatlonder/tinyfusers ships
only the text tower, vae/encoder.py:36-81): embeds images into the CLIP
joint space so `eval/clip_score.py` can measure prompt-image agreement
of generated samples. Architecture matches HF `CLIPVisionModel`
(openai/clip-vit-large-patch14): patchify conv (no bias), class token,
learned positions, pre-LN, the same encoder layers as the text tower
(reused from models/clip.py, scan-stacked), post-LN on the CLS state,
then the CLIPModel `visual_projection` into the joint space.

Validated activation-for-activation against transformers.CLIPVisionModel
at real ViT-L geometry ratios in tests/test_hf_oracle.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import ops
from ..utils import init as pinit
from . import clip as clip_model


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    act: str = "quick_gelu"
    projection_dim: int = 768    # joint-space width (ViT-L/14: 768)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def text_layer_cfg(self) -> clip_model.CLIPConfig:
        """The encoder-layer geometry as a text-tower config (the layer
        body is shared with models/clip.py)."""
        return clip_model.CLIPConfig(
            dim=self.dim, num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            act=self.act)


VIT_L_14 = CLIPVisionConfig()

# Tiny geometry for tests.
TINY_VISION = CLIPVisionConfig(image_size=32, patch_size=8, dim=64,
                               num_layers=2, num_heads=4, mlp_dim=128,
                               projection_dim=48)

# CLIP preprocessing constants (openai/clip-vit-large-patch14 processor).
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def init(key: jax.Array, cfg: CLIPVisionConfig = VIT_L_14,
         dtype=jnp.float32):
    keys = jax.random.split(key, 6)

    def layer_init(k):
        ks = jax.random.split(k, 6)
        return {
            "layer_norm1": pinit.norm_params(cfg.dim, dtype),
            "self_attn": {
                "q_proj": pinit.linear_params(ks[0], cfg.dim, cfg.dim, dtype=dtype),
                "k_proj": pinit.linear_params(ks[1], cfg.dim, cfg.dim, dtype=dtype),
                "v_proj": pinit.linear_params(ks[2], cfg.dim, cfg.dim, dtype=dtype),
                "out_proj": pinit.linear_params(ks[3], cfg.dim, cfg.dim, dtype=dtype),
            },
            "layer_norm2": pinit.norm_params(cfg.dim, dtype),
            "mlp": {
                "fc1": pinit.linear_params(ks[4], cfg.dim, cfg.mlp_dim, dtype=dtype),
                "fc2": pinit.linear_params(ks[5], cfg.mlp_dim, cfg.dim, dtype=dtype),
            },
        }

    layer_keys = jax.random.split(keys[0], cfg.num_layers)
    layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[layer_init(k) for k in layer_keys])
    return {
        "class_embedding": jax.random.normal(
            keys[1], (cfg.dim,), dtype) * 0.02,
        "patch_embedding": pinit.conv_params(
            keys[2], 3, cfg.dim, cfg.patch_size, bias=False, dtype=dtype),
        "position_embedding": pinit.embedding_params(
            keys[3], cfg.num_patches + 1, cfg.dim, dtype),
        "pre_layernorm": pinit.norm_params(cfg.dim, dtype),
        "layers": layers,
        "post_layernorm": pinit.norm_params(cfg.dim, dtype),
        "visual_projection": pinit.linear_params(
            keys[4], cfg.dim, cfg.projection_dim, bias=False, dtype=dtype),
    }


def preprocess(images: jax.Array, cfg: CLIPVisionConfig = VIT_L_14
               ) -> jax.Array:
    """uint8/float (B, H, W, 3) RGB -> normalized (B, S, S, 3) float32.

    Resize is bilinear (jax.image); the HF processor uses bicubic — the
    difference is sub-0.2% on CLIP scores and irrelevant for the Δ
    comparisons this scorer backs (both candidates go through the same
    path)."""
    x = images.astype(jnp.float32)
    if jnp.dtype(images.dtype) == jnp.uint8:
        x = x / 255.0
    s = cfg.image_size
    if x.shape[1] != s or x.shape[2] != s:
        x = jax.image.resize(x, (x.shape[0], s, s, 3), method="bilinear")
    mean = jnp.asarray(IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(IMAGE_STD, jnp.float32)
    return (x - mean) / std


def apply(params, pixels: jax.Array, cfg: CLIPVisionConfig = VIT_L_14
          ) -> jax.Array:
    """Preprocessed pixels (B, S, S, 3) -> joint-space embedding
    (B, projection_dim), L2-unnormalized (normalize in the scorer)."""
    n = pixels.shape[0]
    lcfg = cfg.text_layer_cfg()
    x = ops.conv2d(pixels.astype(params["class_embedding"].dtype),
                   params["patch_embedding"]["weight"],
                   stride=cfg.patch_size)
    x = x.reshape(n, cfg.num_patches, cfg.dim)
    cls = jnp.broadcast_to(params["class_embedding"], (n, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"]["weight"][None]
    x = ops.layer_norm(x, params["pre_layernorm"]["weight"],
                       params["pre_layernorm"]["bias"])

    def body(carry, layer_params):
        return clip_model._layer(layer_params, carry, None, lcfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = ops.layer_norm(x[:, 0], params["post_layernorm"]["weight"],
                            params["post_layernorm"]["bias"])
    return ops.linear(pooled, params["visual_projection"]["weight"])
