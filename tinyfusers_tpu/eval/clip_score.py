"""CLIP score: prompt-image agreement in the CLIP joint space.

Backs the BASELINE.json accuracy requirement ("CLIP score / FID parity
at the same bit-width"): a quantized / approximated pipeline passes when
its CLIP score over a fixed prompt set stays within the stated delta of
the fp16 baseline's. The reference has no accuracy tooling at all; this
is the harness side that only needs the real openai/clip-vit-large-
patch14 weights dropped in (zero-egress here, so benchmarks/
accuracy_eval.py runs it end-to-end on random weights to keep the
pipeline proven).

score(image, text) = 100 * cosine(E_img(image), E_txt(text))
with both embeddings in the 768-d joint space (the standard
`torchmetrics.multimodal.CLIPScore` definition, without its max(0, .)
clamp — signed values are more informative for deltas).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..models import clip as clip_model
from ..models import clip_vision


def load_scorer_params(path, text_cfg: Optional[clip_model.CLIPConfig] = None,
                       vision_cfg: clip_vision.CLIPVisionConfig =
                       clip_vision.VIT_L_14):
    """Load a HF CLIPModel checkpoint (.safetensors / torch-zip) into
    {'text': ..., 'vision': ...} scorer params.

    The text tower re-uses models/clip.py with the HF 'text_model.'
    layout; ViT-L/14's text tower is exactly the SD1.x conditioning
    geometry (77 ctx, 768 wide, 12 layers) with a text_projection.
    """
    from ..io import checkpoints, state_map

    text_cfg = text_cfg or clip_model.CLIPConfig(projection_dim=768)
    state = checkpoints.load_state_dict(path)
    # Re-key to the SD prefix clip_from_state expects.
    sd_state = {f"cond_stage_model.transformer.{k}": v
                for k, v in state.items()}
    return {
        "text": state_map.clip_from_state(sd_state, text_cfg),
        "text_cfg": text_cfg,
        "vision": state_map.clip_vision_from_state(state, vision_cfg),
        "vision_cfg": vision_cfg,
    }


def embed_images(scorer, images: jax.Array) -> jax.Array:
    """images (B, H, W, 3) uint8/float RGB -> L2-normalized (B, P)."""
    cfg = scorer["vision_cfg"]
    pixels = clip_vision.preprocess(images, cfg)
    e = clip_vision.apply(scorer["vision"], pixels, cfg)
    return e / jnp.linalg.norm(e.astype(jnp.float32), axis=-1, keepdims=True)


def embed_texts(scorer, input_ids: jax.Array) -> jax.Array:
    """Tokenized prompts (B, 77) -> L2-normalized (B, P)."""
    e = clip_model.apply_pooled(scorer["text"], input_ids,
                                scorer["text_cfg"])
    return e / jnp.linalg.norm(e.astype(jnp.float32), axis=-1, keepdims=True)


def clip_score(scorer, images: jax.Array, input_ids: jax.Array
               ) -> np.ndarray:
    """Per-pair CLIP scores (B,): 100 * cosine similarity.

    images (B, H, W, 3); input_ids (B, 77) from the CLIP tokenizer
    (tokenizer/bpe.py with the vendored merges file for real use).
    """
    ei = embed_images(scorer, images)
    et = embed_texts(scorer, input_ids)
    return np.asarray(100.0 * jnp.sum(ei * et, axis=-1))
