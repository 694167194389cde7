"""CLIP text transformer (SD v1 conditioning encoder).

TPU-native re-design of reference vae/encoder.py:36-81 (CLIPTextTransformer,
misfiled under vae/ there) + attention/attention.py:78-100 (CLIPAttention)
+ ff/nn.py:25-34 (CLIPMLP):

- the 12 identical encoder layers are **stacked** into one pytree with a
  leading layer axis and applied with `lax.scan` — one compiled layer body
  instead of 12 unrolled copies (smaller HLO, same speed);
- embedding lookup is a gather, not the reference's host-built one-hot
  GEMM (ff/embedding.py:6-23);
- the causal mask is built once inside the traced function (constant-folded
  by XLA), not rebuilt per call on device (reference vae/encoder.py:79).

Geometry (SD v1): vocab 49408, context 77, width 768, 12 layers, 12 heads,
MLP 3072, quick-gelu.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import ops
from ..utils import init as pinit


@dataclass(frozen=True)
class CLIPConfig:
    vocab_size: int = 49408
    max_length: int = 77
    dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    act: str = "quick_gelu"      # "quick_gelu" (CLIP ViT-L) | "gelu" (OpenCLIP)
    projection_dim: int = 0      # >0: text_projection head (OpenCLIP bigG)


# SDXL's second text encoder (OpenCLIP ViT-bigG/14 text tower).
OPENCLIP_BIGG_CONFIG = CLIPConfig(
    dim=1280, num_layers=32, num_heads=20, mlp_dim=5120,
    act="gelu", projection_dim=1280,
)

# SD 2.x conditioning encoder (OpenCLIP ViT-H/14 text tower).
OPENCLIP_H_CONFIG = CLIPConfig(
    dim=1024, num_layers=24, num_heads=16, mlp_dim=4096, act="gelu",
)


def init(key: jax.Array, cfg: CLIPConfig = CLIPConfig(), dtype=jnp.float32):
    keys = jax.random.split(key, 8)

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

    layer_keys = jax.random.split(keys[2], cfg.num_layers)
    # Stack per-layer trees along a leading axis for lax.scan.
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *[layer_init(k) for k in layer_keys])
    params = {
        "token_embedding": pinit.embedding_params(keys[0], cfg.vocab_size, cfg.dim, dtype),
        "position_embedding": pinit.embedding_params(keys[1], cfg.max_length, cfg.dim, dtype),
        "layers": layers,
        "final_layer_norm": pinit.norm_params(cfg.dim, dtype),
    }
    if cfg.projection_dim:
        params["text_projection"] = pinit.linear_params(
            keys[3], cfg.dim, cfg.projection_dim, bias=False, dtype=dtype
        )
    return params


def _attn(p, x, mask, num_heads: int):
    b, t, d = x.shape
    hd = d // num_heads
    q = ops.linear(x, p["q_proj"]["weight"], p["q_proj"]["bias"])
    k = ops.linear(x, p["k_proj"]["weight"], p["k_proj"]["bias"])
    v = ops.linear(x, p["v_proj"]["weight"], p["v_proj"]["bias"])
    q, k, v = (
        y.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3) for y in (q, k, v)
    )
    o = ops.sdpa(q, k, v, mask)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return ops.linear(o, p["out_proj"]["weight"], p["out_proj"]["bias"])


def _layer(p, x, mask, cfg: CLIPConfig):
    h = ops.layer_norm(x, p["layer_norm1"]["weight"], p["layer_norm1"]["bias"])
    x = x + _attn(p["self_attn"], h, mask, cfg.num_heads)
    h = ops.layer_norm(x, p["layer_norm2"]["weight"], p["layer_norm2"]["bias"])
    h = ops.linear(h, p["mlp"]["fc1"]["weight"], p["mlp"]["fc1"]["bias"])
    # "gelu" = exact erf GELU: OpenCLIP towers (SD2.x H, SDXL bigG) use
    # nn.GELU default, not the tanh approximation.
    h = ops.quick_gelu(h) if cfg.act == "quick_gelu" else ops.gelu_erf(h)
    h = ops.linear(h, p["mlp"]["fc2"]["weight"], p["mlp"]["fc2"]["bias"])
    return x + h


def apply(
    params,
    input_ids: jax.Array,
    cfg: CLIPConfig = CLIPConfig(),
    *,
    skip_final_norm_layers: int = 0,
    final_norm_on_skip: bool = False,
) -> jax.Array:
    """input_ids (B, T) int32 -> hidden states (B, T, dim).

    skip_final_norm_layers=k returns the hidden state k layers before the
    end WITHOUT the final layer norm (SDXL conditions on the bigG
    encoder's penultimate layer, k=1; "clip skip" in SD tooling).
    final_norm_on_skip=True applies the final layer norm to that early
    state instead — SD 2.x "penultimate" conditioning (Stability's
    FrozenOpenCLIPEmbedder truncates one resblock, then runs ln_final).
    """
    t = input_ids.shape[-1]
    x = ops.embedding(input_ids, params["token_embedding"]["weight"])
    x = x + params["position_embedding"]["weight"][:t]
    # Additive causal mask, -inf above the diagonal (reference
    # vae/encoder.py:79 built this per call; here it is a traced constant).
    mask = jnp.triu(jnp.full((1, 1, t, t), -jnp.inf, jnp.float32), k=1)

    collect = skip_final_norm_layers > 0  # static: avoids stacking ys otherwise

    def body(carry, layer_params):
        return _layer(layer_params, carry, mask, cfg), (carry if collect else None)

    x, pre_states = jax.lax.scan(body, x, params["layers"])
    if skip_final_norm_layers > 0:
        # pre_states[i] is the input to layer i; index -k+... : the state
        # k layers before the end is pre_states[num_layers - k].
        early = pre_states[cfg.num_layers - skip_final_norm_layers]
        if final_norm_on_skip:
            return ops.layer_norm(
                early,
                params["final_layer_norm"]["weight"],
                params["final_layer_norm"]["bias"],
            )
        return early
    return ops.layer_norm(
        x,
        params["final_layer_norm"]["weight"],
        params["final_layer_norm"]["bias"],
    )


def apply_pooled(
    params, input_ids: jax.Array, cfg: CLIPConfig
) -> jax.Array:
    """Pooled text embedding: final-norm hidden state at each sequence's
    EOT position, through text_projection when configured.
    (B, T) -> (B, projection_dim|dim).

    EOT is located by first occurrence of the EOT id (vocab_size-1) —
    NOT by argmax(ids) as in HF CLIP: textual-inversion placeholder ids
    extend the embedding table past EOT, which would hijack an argmax.
    Both conventions agree on ordinary prompts (EOT is the max CLIP id,
    and SD1.x even pads with it)."""
    x = apply(params, input_ids, cfg)
    eot = jnp.argmax((input_ids == cfg.vocab_size - 1).astype(jnp.int32),
                     axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    if "text_projection" in params:
        pooled = ops.linear(pooled, params["text_projection"]["weight"])
    return pooled
