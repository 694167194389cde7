"""MMDiT: multimodal diffusion transformer (SD3-style backbone).

Extends models/dit.py to the SD3 architecture family: two token streams
(image patches and text context), each with its own projections and
adaLN-Zero modulation, coupled through **joint attention** over the
concatenation of both streams' q/k/v. Covers the BASELINE "SD3 / DiT-
style transformer backbone" config. No reference analog (UNet-only).

TPU-first structure mirrors dit.py: identical blocks stacked for
lax.scan, ops.sdpa for the joint attention (flash kernel at large token
counts), fixed sin-cos positions for patches.
"""
from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp

from .. import ops
from ..utils import init as pinit
from .dit import _pos_embed_2d, split_fused_qkv
from .unet import timestep_embedding


@dataclass(frozen=True)
class MMDiTConfig:
    input_size: int = 128          # latent H = W (SD3: 1024px / 8)
    patch_size: int = 2
    in_channels: int = 16          # SD3 VAE latent channels
    out_channels: int = 16
    dim: int = 1536                # SD3-medium
    depth: int = 24
    num_heads: int = 24
    mlp_ratio: int = 4
    context_dim: int = 4096        # joint text embedding width
    pooled_dim: int = 2048         # pooled CLIP-L+G conditioning
    context_len: int = 77
    # Joint-attention impl override (ops.sdpa impl string, e.g.
    # "ring:model"); static jit key via the frozen config.
    attn_impl: "str | None" = None
    # Per-head RMS normalization of q/k before attention ("rms" | None).
    # SD3.5 checkpoints carry attn.ln_q/ln_k RMSNorm weights; SD3-medium
    # does not. Static config field -> part of the jit key.
    qk_norm: "str | None" = None
    # Pipeline parallelism over the block stack: number of microbatches
    # (GPipe schedule, parallel/pipeline.py). Requires an ambient mesh
    # with a "pipe" axis (jax.set_mesh) whose size divides `depth`, and a
    # batch divisible by the microbatch count. None = plain lax.scan.
    pipeline_microbatches: "int | None" = None


SD3_MEDIUM = MMDiTConfig()

# SD3.5-large (8B): deeper/wider trunk + RMS qk-norm; everything else is
# the SD3 MMDiT recipe at the same patch/context geometry.
SD35_LARGE = MMDiTConfig(dim=2432, depth=38, num_heads=38, qk_norm="rms")

TINY_MMDIT = MMDiTConfig(input_size=8, patch_size=2, in_channels=4,
                         out_channels=4, dim=64, depth=2, num_heads=4,
                         context_dim=32, pooled_dim=16, context_len=8)

TINY_MMDIT_QKN = MMDiTConfig(input_size=8, patch_size=2, in_channels=4,
                             out_channels=4, dim=64, depth=2, num_heads=4,
                             context_dim=32, pooled_dim=16, context_len=8,
                             qk_norm="rms")


def _stream_block_init(key, cfg: MMDiTConfig, dtype):
    ks = jax.random.split(key, 4)
    d = cfg.dim
    p = {
        "mod": {
            "weight": jnp.zeros((d, 6 * d), dtype),
            "bias": jnp.zeros((6 * d,), dtype),
        },
        "qkv": pinit.linear_params(ks[0], d, 3 * d, dtype=dtype),
        "proj": pinit.linear_params(ks[1], d, d, dtype=dtype),
        "mlp": {
            "fc1": pinit.linear_params(ks[2], d, cfg.mlp_ratio * d, dtype=dtype),
            "fc2": pinit.linear_params(ks[3], cfg.mlp_ratio * d, d, dtype=dtype),
        },
    }
    if cfg.qk_norm:
        hd = cfg.dim // cfg.num_heads
        p["ln_q"] = {"weight": jnp.ones((hd,), dtype)}
        p["ln_k"] = {"weight": jnp.ones((hd,), dtype)}
    return p


def _block_init(key, cfg: MMDiTConfig, dtype):
    ka, kb = jax.random.split(key)
    return {"img": _stream_block_init(ka, cfg, dtype),
            "txt": _stream_block_init(kb, cfg, dtype)}


def init(key: jax.Array, cfg: MMDiTConfig = SD3_MEDIUM, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    p = cfg.patch_size
    return {
        "patch_embed": pinit.conv_params(ks[0], cfg.in_channels, cfg.dim, p, dtype=dtype),
        "context_embed": pinit.linear_params(ks[1], cfg.context_dim, cfg.dim, dtype=dtype),
        "time_mlp": {
            "fc1": pinit.linear_params(ks[2], 256, cfg.dim, dtype=dtype),
            "fc2": pinit.linear_params(ks[3], cfg.dim, cfg.dim, dtype=dtype),
        },
        "pooled_mlp": {
            "fc1": pinit.linear_params(ks[4], cfg.pooled_dim, cfg.dim, dtype=dtype),
            "fc2": pinit.linear_params(ks[5], cfg.dim, cfg.dim, dtype=dtype),
        },
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_block_init(jax.random.fold_in(ks[6], i), cfg, dtype)
              for i in range(cfg.depth)],
        ),
        "final": {
            "mod": {
                "weight": jnp.zeros((cfg.dim, 2 * cfg.dim), dtype),
                "bias": jnp.zeros((2 * cfg.dim,), dtype),
            },
            "proj": {
                "weight": jnp.zeros((cfg.dim, p * p * cfg.out_channels), dtype),
                "bias": jnp.zeros((p * p * cfg.out_channels,), dtype),
            },
        },
    }


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _rms_qk(x, weight, eps=1e-6):
    """Per-head RMSNorm over head_dim (SD3.5 attn.ln_q/ln_k), fp32 stats.
    Layout-independent of the head-interleaved fused-qkv split: the
    weight is shared across heads and applies along the hd axis."""
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (xf * rms * weight.astype(jnp.float32)).astype(x.dtype)


def _stream_pre(p, x, c, cfg: MMDiTConfig):
    """Pre-attention: modulated LN + fused qkv (head-interleaved layout,
    see models/dit.py split_fused_qkv). Returns (q,k,v (B,T,H,hd), gates)."""
    mod = ops.linear(ops.silu(c), p["mod"]["weight"], p["mod"]["bias"])
    sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)
    h = _modulate(ops.layer_norm(x), sh1, sc1)
    qkv = ops.linear(h, p["qkv"]["weight"], p["qkv"]["bias"])
    q, k, v = split_fused_qkv(qkv, cfg.num_heads)
    if cfg.qk_norm == "rms":
        q = _rms_qk(q, p["ln_q"]["weight"])
        k = _rms_qk(k, p["ln_k"]["weight"])
    elif cfg.qk_norm is not None:  # pragma: no cover
        raise ValueError(f"unsupported qk_norm {cfg.qk_norm!r}")
    return q, k, v, (g1, sh2, sc2, g2)


def _unheads(x):
    b, t, h, hd = x.shape  # bshd: heads already in place, reshape is free
    return x.reshape(b, t, h * hd)


def _stream_post(p, x, attn_out, gates):
    g1, sh2, sc2, g2 = gates
    o = ops.linear(attn_out, p["proj"]["weight"], p["proj"]["bias"])
    x = x + g1[:, None, :] * o
    h = _modulate(ops.layer_norm(x), sh2, sc2)
    h = ops.linear(h, p["mlp"]["fc1"]["weight"], p["mlp"]["fc1"]["bias"])
    h = ops.gelu_tanh(h)
    h = ops.linear(h, p["mlp"]["fc2"]["weight"], p["mlp"]["fc2"]["bias"])
    return x + g2[:, None, :] * h


def _block(p, img, txt, c, cfg: MMDiTConfig, kv_len=None):
    qi, ki, vi, gi = _stream_pre(p["img"], img, c, cfg)
    qt, kt, vt, gt = _stream_pre(p["txt"], txt, c, cfg)
    ti = img.shape[1]
    # Joint attention over [img ‖ txt] tokens (concat on the token axis —
    # q/k/v are (B, T, H, hd), heads in place). kv_len marks real tokens
    # when the txt stream was pre-padded to 128-align the joint sequence
    # (apply() pads ONCE per forward; every block's concat is then
    # exactly kernel-block-aligned — the separate per-block HBM pad +
    # unpad-slice measured ~4.4 ms/forward in the round-5 SD3 trace).
    # Two layouts, decided at trace time: channel-packed when the
    # heads-packed flash kernel can take the whole key sequence in VMEM
    # (zero relayouts); classic bhsd otherwise — SD3's 1536-wide joint
    # sequence exceeds the packed kernel's VMEM budget, and routing it
    # through the packed fallback costs extra unpack/repack copies
    # (measured ~25% of an SD3 step).
    t_all = ti + txt.shape[1]
    if cfg.attn_impl is None and ops.packed_beneficial(
            t_all, t_all, cfg.dim, cfg.num_heads,
            jnp.dtype(img.dtype).itemsize):
        q = _unheads(jnp.concatenate([qi, qt], axis=1))
        k = _unheads(jnp.concatenate([ki, kt], axis=1))
        v = _unheads(jnp.concatenate([vi, vt], axis=1))
        o = ops.sdpa_packed(q, k, v, heads=cfg.num_heads, kv_len=kv_len)
    else:
        bhsd = lambda a, b: jnp.concatenate(  # noqa: E731
            [a, b], axis=1).transpose(0, 2, 1, 3)
        o = ops.sdpa(bhsd(qi, qt), bhsd(ki, kt), bhsd(vi, vt),
                     impl=cfg.attn_impl,
                     kv_len=kv_len if cfg.attn_impl is None else None)
        # An einsum('bhtd,hdc->btc') fold of this transpose into the
        # out-projection measured null (round 5): XLA materializes the
        # same relayout inside the contraction.
        o = _unheads(o.transpose(0, 2, 1, 3))
    img = _stream_post(p["img"], img, o[:, :ti], gi)
    txt = _stream_post(p["txt"], txt, o[:, ti:], gt)
    return img, txt


def apply(
    params,
    x: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
    pooled: jax.Array,
    cfg: MMDiTConfig = SD3_MEDIUM,
) -> jax.Array:
    """x (B,H,W,C) latents, timesteps (B,) in [0,1] (flow time * 1000 is
    fine too — embedding is scale-free), context (B,T,context_dim),
    pooled (B,pooled_dim) -> velocity/noise prediction (B,H,W,C)."""
    b, h, w, _ = x.shape
    p = cfg.patch_size
    img = ops.conv2d(x, params["patch_embed"]["weight"],
                     params["patch_embed"]["bias"], stride=p)
    img = img.reshape(b, -1, cfg.dim)
    # Real SD3 checkpoints carry a LEARNED pos_embed (a 192x192 grid the
    # mapper center-crops to this resolution, io/state_map.py); without
    # one (random init / tiny configs) fall back to fixed sin-cos.
    pe = params.get("pos_embed")
    if pe is None:
        pe = _pos_embed_2d(h // p, cfg.dim)
    img = img + jnp.asarray(pe).reshape(1, img.shape[1], cfg.dim).astype(img.dtype)
    txt = ops.linear(context.astype(x.dtype),
                     params["context_embed"]["weight"],
                     params["context_embed"]["bias"])
    # Pad the txt stream ONCE so the joint [img ‖ txt] sequence is
    # 128-aligned for the flash kernel in every block (kv_len masks the
    # pad tokens as keys; their own garbage outputs ride the txt stream
    # and are never consumed — the final head reads img tokens only).
    kv_len = None
    t_all = img.shape[1] + txt.shape[1]
    if cfg.attn_impl is None and t_all >= 1024 and t_all % 128:
        txt = jnp.pad(txt, ((0, 0), (0, (-t_all) % 128), (0, 0)))
        kv_len = t_all

    t_emb = timestep_embedding(timesteps.astype(jnp.float32) * 1000.0, 256)
    c = ops.linear(t_emb.astype(x.dtype), params["time_mlp"]["fc1"]["weight"],
                   params["time_mlp"]["fc1"]["bias"])
    c = ops.linear(ops.silu(c), params["time_mlp"]["fc2"]["weight"],
                   params["time_mlp"]["fc2"]["bias"])
    pc = ops.linear(pooled.astype(x.dtype), params["pooled_mlp"]["fc1"]["weight"],
                    params["pooled_mlp"]["fc1"]["bias"])
    pc = ops.linear(ops.silu(pc), params["pooled_mlp"]["fc2"]["weight"],
                    params["pooled_mlp"]["fc2"]["bias"])
    c = c + pc

    if cfg.pipeline_microbatches:
        from ..parallel import pipeline as _pp

        def blk(bp, carry):
            # conditioning c rides the carry so it is microbatched in
            # lock-step with the streams (it has a batch dim)
            im, tx, cc = carry
            im, tx = _block(bp, im, tx, cc, cfg, kv_len=kv_len)
            return (im, tx, cc)

        img, txt, _ = _pp.pipeline_apply(
            blk, params["blocks"], (img, txt, c),
            mesh=None,  # ambient mesh (jax.set_mesh)
            microbatches=cfg.pipeline_microbatches)
    else:
        def body(carry, bp):
            img, txt = carry
            img, txt = _block(bp, img, txt, c, cfg, kv_len=kv_len)
            return (img, txt), None

        (img, txt), _ = jax.lax.scan(body, (img, txt), params["blocks"])

    mod = ops.linear(ops.silu(c), params["final"]["mod"]["weight"],
                     params["final"]["mod"]["bias"])
    shift, scale = jnp.split(mod, 2, axis=-1)
    img = _modulate(ops.layer_norm(img), shift, scale)
    out = ops.linear(img, params["final"]["proj"]["weight"],
                     params["final"]["proj"]["bias"])
    hp, wp = h // p, w // p
    out = out.reshape(b, hp, wp, p, p, cfg.out_channels)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, cfg.out_channels)
