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
    return {
        "token_embedding": pinit.embedding_params(keys[0], cfg.vocab_size, cfg.dim, dtype),
        "position_embedding": pinit.embedding_params(keys[1], cfg.max_length, cfg.dim, dtype),
        "layers": layers,
        "final_layer_norm": pinit.norm_params(cfg.dim, dtype),
    }


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
    h = ops.quick_gelu(h)
    h = ops.linear(h, p["mlp"]["fc2"]["weight"], p["mlp"]["fc2"]["bias"])
    return x + h


def apply(params, input_ids: jax.Array, cfg: CLIPConfig = CLIPConfig()) -> jax.Array:
    """input_ids (B, T) int32 -> hidden states (B, T, dim)."""
    t = input_ids.shape[-1]
    x = ops.embedding(input_ids, params["token_embedding"]["weight"])
    x = x + params["position_embedding"]["weight"][:t]
    # Additive causal mask, -inf above the diagonal (reference
    # vae/encoder.py:79 built this per call; here it is a traced constant).
    mask = jnp.triu(jnp.full((1, 1, t, t), -jnp.inf, jnp.float32), k=1)

    def body(carry, layer_params):
        return _layer(layer_params, carry, mask, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return ops.layer_norm(
        x,
        params["final_layer_norm"]["weight"],
        params["final_layer_norm"]["bias"],
    )
