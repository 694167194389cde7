"""T5 encoder stack (T5-v1.1 family — SD3's T5-XXL text conditioning).

New capability vs the reference (UNet/CLIP-only); completes the SD3
conditioning triplet (CLIP-L + CLIP-G + T5-XXL). TPU-first structure:

- identical pre-norm blocks stacked on a leading axis and driven by
  ``lax.scan`` (one compiled block body; the checkpoint mapper stacks);
- the relative-position bias table lives only in block 0 (HF layout) and
  is *shared* by every layer, so the bias matrix is computed once before
  the scan and closed over — no per-layer gather;
- RMSNorm statistics and softmax in fp32, matmuls in the param dtype
  (bf16 on TPU);
- T5 attention is UNSCALED (no 1/sqrt(d) — absorbed into init by
  design), q/k/v/o carry no biases, FFN is gated-GELU (v1.1).

Checkpoint layout (``text_encoders.t5xxl.transformer.*`` in SD3
single-file checkpoints, HF names) maps via io/state_map.t5_from_state.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import ops
from ..utils import init as pinit


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    dim: int = 4096              # d_model
    ff_dim: int = 10240          # d_ff (v1.1 gated)
    num_layers: int = 24
    num_heads: int = 64
    head_dim: int = 64           # d_kv
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.head_dim


T5_XXL = T5Config()

TINY_T5 = T5Config(vocab_size=256, dim=64, ff_dim=128, num_layers=3,
                   num_heads=4, head_dim=16, rel_buckets=8,
                   rel_max_distance=16)


def _layer_init(key, cfg: T5Config, dtype):
    ks = jax.random.split(key, 7)
    d, inner, f = cfg.dim, cfg.inner_dim, cfg.ff_dim
    lin = lambda k, i, o: pinit.linear_params(k, i, o, bias=False, dtype=dtype)  # noqa: E731
    return {
        "attn_norm": {"weight": jnp.ones((d,), dtype)},
        "attn": {
            "q": lin(ks[0], d, inner),
            "k": lin(ks[1], d, inner),
            "v": lin(ks[2], d, inner),
            "o": lin(ks[3], inner, d),
        },
        "ff_norm": {"weight": jnp.ones((d,), dtype)},
        "ff": {
            "wi_0": lin(ks[4], d, f),
            "wi_1": lin(ks[5], d, f),
            "wo": lin(ks[6], f, d),
        },
    }


def init(key: jax.Array, cfg: T5Config = T5_XXL, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    layers = [
        _layer_init(jax.random.fold_in(ks[0], i), cfg, dtype)
        for i in range(cfg.num_layers)
    ]
    return {
        "token_embedding": pinit.embedding_params(
            ks[1], cfg.vocab_size, cfg.dim, dtype),
        "rel_bias": pinit.embedding_params(
            ks[2], cfg.rel_buckets, cfg.num_heads, dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": {"weight": jnp.ones((cfg.dim,), dtype)},
    }


def _rms_norm(x, weight, eps):
    h = x.astype(jnp.float32)
    h = h * jax.lax.rsqrt(jnp.mean(h * h, axis=-1, keepdims=True) + eps)
    return (h.astype(x.dtype)) * weight


def _relative_buckets(qlen: int, klen: int, cfg: T5Config) -> jax.Array:
    """Bidirectional T5 bucket ids, (qlen, klen) int32."""
    ctx = jnp.arange(qlen, dtype=jnp.int32)[:, None]
    mem = jnp.arange(klen, dtype=jnp.int32)[None, :]
    rel = mem - ctx
    nb = cfg.rel_buckets // 2
    buckets = jnp.where(rel > 0, nb, 0)
    n = jnp.abs(rel)
    max_exact = nb // 2
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / jnp.log(cfg.rel_max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, nb - 1)
    return buckets + jnp.where(n < max_exact, n, val_large)


def _position_bias(params, qlen: int, klen: int, cfg: T5Config) -> jax.Array:
    """(1, heads, qlen, klen) additive attention bias (shared by layers)."""
    buckets = _relative_buckets(qlen, klen, cfg)
    table = params["rel_bias"]["weight"]  # (buckets, heads)
    bias = jnp.take(table, buckets.reshape(-1), axis=0)
    return bias.reshape(qlen, klen, cfg.num_heads).transpose(2, 0, 1)[None]


def _layer(p, x, bias, cfg: T5Config):
    b, t, _ = x.shape
    h = _rms_norm(x, p["attn_norm"]["weight"], cfg.eps)
    q = ops.linear(h, p["attn"]["q"]["weight"])
    k = ops.linear(h, p["attn"]["k"]["weight"])
    v = ops.linear(h, p["attn"]["v"]["weight"])
    hds = lambda z: z.reshape(b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)  # noqa: E731
    # T5: UNSCALED attention logits + additive relative-position bias.
    a = ops.sdpa(hds(q), hds(k), hds(v), mask=bias, scale=1.0, impl="xla")
    a = a.transpose(0, 2, 1, 3).reshape(b, t, cfg.inner_dim)
    x = x + ops.linear(a, p["attn"]["o"]["weight"])

    h = _rms_norm(x, p["ff_norm"]["weight"], cfg.eps)
    gate = ops.gelu_tanh(ops.linear(h, p["ff"]["wi_0"]["weight"]))
    h = gate * ops.linear(h, p["ff"]["wi_1"]["weight"])
    return x + ops.linear(h, p["ff"]["wo"]["weight"])


def apply(params, ids: jax.Array, cfg: T5Config = T5_XXL,
          mask: jax.Array | None = None) -> jax.Array:
    """ids (B, T) int32 -> final hidden states (B, T, dim).

    mask: optional (B, T) of {0,1} key-padding mask (1 = attend), folded
    into the shared additive bias. SD3 conditions on UNMASKED padded
    rows (the standard t5xxl usage), so the default is None.
    """
    t = ids.shape[-1]
    x = jnp.take(params["token_embedding"]["weight"], ids, axis=0)
    bias = _position_bias(params, t, t, cfg).astype(jnp.float32)
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        bias = bias + jnp.where(mask[:, None, None, :] > 0, 0.0, neg)

    def body(carry, lp):
        return _layer(lp, carry, bias, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return _rms_norm(x, params["final_norm"]["weight"], cfg.eps)
