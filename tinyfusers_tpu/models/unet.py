"""SD UNet (latent diffusion denoiser), NHWC, TPU-native.

Re-design of reference vision/unet.py + vision/resnet.py +
attention/attention.py (SpatialTransformer / BasicTransformerBlock /
CrossAttention). The reference hard-codes the SD1.x block table
(vision/unet.py:11-49); here the same topology is *generated* from a
config (LDM-style: channel_mult levels × num_res_blocks, attention at the
listed levels), so SD1.5 (mult 1/2/4/4, heads 8, ctx 768) and SDXL-style
variants (transformer depth >1, fixed head_dim, ctx 2048) share one
implementation.

The whole forward is one traced function — no per-call graph builds, no
syncs (contrast reference §3.3: cuDNN graphs rebuilt per conv per step).
Skip connections use a static Python list during tracing (lengths are
config-static), which XLA sees as straight-line code.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .. import ops
from ..utils import init as pinit


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_levels: Tuple[int, ...] = (0, 1, 2)  # levels with SpatialTransformer
    transformer_depth: Union[int, Tuple[int, ...]] = 1  # scalar or per-level
    context_dim: int = 768
    num_heads: int = 8           # fixed head count (SD1.x) ...
    head_dim: Optional[int] = None  # ... or fixed head dim (SDXL style)
    num_groups: int = 32
    # SDXL "text_time" ADM conditioning: pooled text emb + size embeddings
    # fed through a second MLP and added to the timestep embedding.
    adm_in_channels: Optional[int] = None
    # Spatial SELF-attention impl override (ops.sdpa impl string, e.g.
    # "ring:model" for sequence parallelism over the mesh's model axis).
    # Part of the frozen config so it participates in jit's static key —
    # dataclasses.replace(cfg, self_attn_impl=...) to opt in.
    self_attn_impl: Optional[str] = None

    def heads_for(self, ch: int) -> Tuple[int, int]:
        if self.head_dim is not None:
            return ch // self.head_dim, self.head_dim
        return self.num_heads, ch // self.num_heads

    def depth_for(self, level: int) -> int:
        if isinstance(self.transformer_depth, tuple):
            return self.transformer_depth[level]
        return self.transformer_depth


SD15_CONFIG = UNetConfig()

# SD 2.x: OpenCLIP-H conditioning (1024-d context), fixed 64-d heads.
SD21_CONFIG = UNetConfig(context_dim=1024, num_heads=-1, head_dim=64)

# SD 1.5 inpainting: UNet input = latent(4) + mask(1) + masked-latent(4).
SD15_INPAINT_CONFIG = UNetConfig(in_channels=9)

# SDXL-base: 3 levels, transformer depths (0, 2, 10), dual-text 2048-d
# context, pooled-text+size ADM conditioning (2816 = 1280 + 6*256).
SDXL_CONFIG = UNetConfig(
    channel_mult=(1, 2, 4),
    attention_levels=(1, 2),
    transformer_depth=(0, 2, 10),
    context_dim=2048,
    num_heads=-1,
    head_dim=64,
    adm_in_channels=2816,
)

# A tiny config for fast tests (same code paths, ~1000x fewer FLOPs).
TINY_CONFIG = UNetConfig(
    model_channels=32,
    channel_mult=(1, 2),
    attention_levels=(0, 1),
    context_dim=16,
    num_heads=4,
    num_groups=8,
)


# ---------------------------------------------------------------------------
# Topology plan: a static list of block descriptors generated from config.
# Reproduces the reference's hard-coded table (vision/unet.py:11-49) for
# SD15_CONFIG — verified by tests/test_unet.py::test_sd15_topology.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ResSpec:
    in_ch: int
    out_ch: int


@dataclass(frozen=True)
class AttnSpec:
    ch: int
    depth: int


@dataclass(frozen=True)
class SampleSpec:  # down- or up-sample
    ch: int
    mode: str  # "down" | "up"


def build_plan(cfg: UNetConfig):
    """Returns (input_blocks, middle, output_blocks) where each block is a
    list of specs; input/output block boundaries define skip push/pop."""
    ch = cfg.model_channels
    input_blocks: List[list] = [["conv_in"]]
    skip_chs = [ch]
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = mult * cfg.model_channels
        for _ in range(cfg.num_res_blocks):
            block = [ResSpec(ch, out_ch)]
            ch = out_ch
            if level in cfg.attention_levels:
                block.append(AttnSpec(ch, cfg.depth_for(level)))
            input_blocks.append(block)
            skip_chs.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_blocks.append([SampleSpec(ch, "down")])
            skip_chs.append(ch)

    mid_depth = cfg.depth_for(len(cfg.channel_mult) - 1)
    middle = [ResSpec(ch, ch), AttnSpec(ch, mid_depth), ResSpec(ch, ch)]

    output_blocks: List[list] = []
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        out_ch = mult * cfg.model_channels
        for i in range(cfg.num_res_blocks + 1):
            block = [ResSpec(ch + skip_chs.pop(), out_ch)]
            ch = out_ch
            if level in cfg.attention_levels:
                block.append(AttnSpec(ch, cfg.depth_for(level)))
            if level != 0 and i == cfg.num_res_blocks:
                block.append(SampleSpec(ch, "up"))
            output_blocks.append(block)
    assert not skip_chs
    return input_blocks, middle, output_blocks


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _res_init(key, spec: ResSpec, emb_ch: int, cfg, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": pinit.norm_params(spec.in_ch, dtype),
        "conv1": pinit.conv_params(ks[0], spec.in_ch, spec.out_ch, 3, dtype=dtype),
        "emb": pinit.linear_params(ks[1], emb_ch, spec.out_ch, dtype=dtype),
        "norm2": pinit.norm_params(spec.out_ch, dtype),
        "conv2": pinit.conv_params(ks[2], spec.out_ch, spec.out_ch, 3, dtype=dtype),
    }
    if spec.in_ch != spec.out_ch:
        p["skip"] = pinit.conv_params(ks[3], spec.in_ch, spec.out_ch, 1, dtype=dtype)
    return p


def _xattn_init(key, query_dim, context_dim, inner_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "to_q": pinit.linear_params(ks[0], query_dim, inner_dim, bias=False, dtype=dtype),
        "to_k": pinit.linear_params(ks[1], context_dim, inner_dim, bias=False, dtype=dtype),
        "to_v": pinit.linear_params(ks[2], context_dim, inner_dim, bias=False, dtype=dtype),
        "to_out": pinit.linear_params(ks[3], inner_dim, query_dim, dtype=dtype),
    }


def _transformer_block_init(key, ch, cfg: UNetConfig, dtype):
    _, head_dim = cfg.heads_for(ch)
    inner = ch
    ks = jax.random.split(key, 4)
    return {
        "norm1": pinit.norm_params(ch, dtype),
        "attn1": _xattn_init(ks[0], ch, ch, inner, dtype),
        "norm2": pinit.norm_params(ch, dtype),
        "attn2": _xattn_init(ks[1], ch, cfg.context_dim, inner, dtype),
        "norm3": pinit.norm_params(ch, dtype),
        "ff": {
            "proj": pinit.linear_params(ks[2], ch, ch * 4 * 2, dtype=dtype),
            "out": pinit.linear_params(ks[3], ch * 4, ch, dtype=dtype),
        },
    }


def _attn_init(key, spec: AttnSpec, cfg: UNetConfig, dtype):
    ks = jax.random.split(key, spec.depth + 2)
    return {
        "norm": pinit.norm_params(spec.ch, dtype),
        "proj_in": pinit.conv_params(ks[0], spec.ch, spec.ch, 1, dtype=dtype),
        "blocks": [
            _transformer_block_init(ks[1 + d], spec.ch, cfg, dtype)
            for d in range(spec.depth)
        ],
        "proj_out": pinit.conv_params(ks[-1], spec.ch, spec.ch, 1, dtype=dtype),
    }


def _block_init(key, block, cfg: UNetConfig, emb_ch: int, dtype):
    out = []
    ks = jax.random.split(key, len(block))
    for k, spec in zip(ks, block):
        if spec == "conv_in":
            out.append(pinit.conv_params(k, cfg.in_channels, cfg.model_channels, 3, dtype=dtype))
        elif isinstance(spec, ResSpec):
            out.append(_res_init(k, spec, emb_ch, cfg, dtype))
        elif isinstance(spec, AttnSpec):
            out.append(_attn_init(k, spec, cfg, dtype))
        elif isinstance(spec, SampleSpec):
            out.append({"conv": pinit.conv_params(k, spec.ch, spec.ch, 3, dtype=dtype)})
        else:
            raise ValueError(spec)
    return out


def init(key: jax.Array, cfg: UNetConfig = SD15_CONFIG, dtype=jnp.float32):
    inp, mid, outp = build_plan(cfg)
    emb_ch = cfg.model_channels * 4
    k_time, k_in, k_mid, k_out, k_final = jax.random.split(key, 5)
    params = {
        "time_embed": {
            "fc1": pinit.linear_params(
                jax.random.fold_in(k_time, 0), cfg.model_channels, emb_ch, dtype=dtype
            ),
            "fc2": pinit.linear_params(
                jax.random.fold_in(k_time, 1), emb_ch, emb_ch, dtype=dtype
            ),
        },
        **(
            {
                "label_emb": {
                    "fc1": pinit.linear_params(
                        jax.random.fold_in(k_time, 2), cfg.adm_in_channels, emb_ch, dtype=dtype
                    ),
                    "fc2": pinit.linear_params(
                        jax.random.fold_in(k_time, 3), emb_ch, emb_ch, dtype=dtype
                    ),
                }
            }
            if cfg.adm_in_channels
            else {}
        ),
        "input": [
            _block_init(jax.random.fold_in(k_in, i), b, cfg, emb_ch, dtype)
            for i, b in enumerate(inp)
        ],
        "middle": _block_init(k_mid, mid, cfg, emb_ch, dtype),
        "output": [
            _block_init(jax.random.fold_in(k_out, i), b, cfg, emb_ch, dtype)
            for i, b in enumerate(outp)
        ],
        "out_norm": pinit.norm_params(cfg.model_channels, dtype),
        "out_conv": pinit.conv_params(
            k_final, cfg.model_channels, cfg.out_channels, 3, dtype=dtype
        ),
    }
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, cos-then-sin halves (reference
    vision/unet.py:92-97 ordering)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _res_apply(p, x, emb, cfg: UNetConfig):
    h = ops.group_norm(x, cfg.num_groups, p["norm1"]["weight"], p["norm1"]["bias"])
    h = ops.conv2d(ops.silu(h), p["conv1"]["weight"], p["conv1"]["bias"], padding=1)
    e = ops.linear(ops.silu(emb), p["emb"]["weight"], p["emb"]["bias"])
    h = h + e[:, None, None, :]
    h = ops.group_norm(h, cfg.num_groups, p["norm2"]["weight"], p["norm2"]["bias"])
    h = ops.conv2d(ops.silu(h), p["conv2"]["weight"], p["conv2"]["bias"], padding=1)
    if "skip" in p:
        x = ops.conv2d(x, p["skip"]["weight"], p["skip"]["bias"])
    return x + h


def _xattn_apply(p, x, context, num_heads: int, impl=None):
    q = ops.linear(x, p["to_q"]["weight"])
    k = ops.linear(context, p["to_k"]["weight"])
    v = ops.linear(context, p["to_v"]["weight"])
    # Channel-packed attention: the projections' native (B, S, H*d)
    # layout goes straight into sdpa_packed — on TPU the heads-packed
    # flash kernel runs with NO (B,S,H,d)<->(B,H,S,d) relayout copies
    # (~8% of the whole attention block in the round-3 A/B).
    o = ops.sdpa_packed(q, k, v, heads=num_heads, impl=impl)
    return ops.linear(o, p["to_out"]["weight"], p["to_out"]["bias"])


def _transformer_block_apply(p, x, context, num_heads: int, self_impl=None):
    h = ops.layer_norm(x, p["norm1"]["weight"], p["norm1"]["bias"])
    # self-attention: the only site where tokens attend to tokens -> the
    # sequence-parallel (ring) override applies here; cross-attention
    # keys are the 77-token text context and stay on the default path.
    x = x + _xattn_apply(p["attn1"], h, h, num_heads, impl=self_impl)
    h = ops.layer_norm(x, p["norm2"]["weight"], p["norm2"]["bias"])
    x = x + _xattn_apply(p["attn2"], h, context, num_heads)
    h = ops.layer_norm(x, p["norm3"]["weight"], p["norm3"]["bias"])
    h = ops.linear(h, p["ff"]["proj"]["weight"], p["ff"]["proj"]["bias"])
    gx, gate = jnp.split(h, 2, axis=-1)
    # geglu_linear: FF tail as one op — the Pallas fused kernel under the
    # measured policy, else geglu fused into the GEMM feed by XLA
    h = ops.geglu_linear(gx, gate, p["ff"]["out"]["weight"],
                         p["ff"]["out"]["bias"])
    return x + h


def _attn_apply(p, x, context, spec: AttnSpec, cfg: UNetConfig):
    n, h, w, c = x.shape
    num_heads, _ = cfg.heads_for(c)
    x_in = x
    # SpatialTransformer's GN uses eps=1e-6 in real SD checkpoints
    # (ldm.modules.attention.Normalize), unlike the ResBlocks' 1e-5.
    x = ops.group_norm(x, cfg.num_groups, p["norm"]["weight"], p["norm"]["bias"],
                       eps=1e-6)
    x = ops.conv2d(x, p["proj_in"]["weight"], p["proj_in"]["bias"])
    x = x.reshape(n, h * w, c)
    for bp in p["blocks"]:
        x = _transformer_block_apply(bp, x, context, num_heads,
                                     self_impl=cfg.self_attn_impl)
    x = x.reshape(n, h, w, c)
    x = ops.conv2d(x, p["proj_out"]["weight"], p["proj_out"]["bias"])
    return x + x_in


def _run_block(params_list, block, x, emb, context, cfg: UNetConfig):
    for p, spec in zip(params_list, block):
        if spec == "conv_in":
            x = ops.conv2d(x, p["weight"], p["bias"], padding=1)
        elif isinstance(spec, ResSpec):
            x = _res_apply(p, x, emb, cfg)
        elif isinstance(spec, AttnSpec):
            x = _attn_apply(p, x, context, spec, cfg)
        elif isinstance(spec, SampleSpec):
            if spec.mode == "down":
                x = ops.conv2d(x, p["conv"]["weight"], p["conv"]["bias"], stride=2, padding=1)
            else:
                x = ops.upsample_nearest_2x(x)
                x = ops.conv2d(x, p["conv"]["weight"], p["conv"]["bias"], padding=1)
        else:
            raise ValueError(spec)
    return x


def _fourier_filter(x: jax.Array, threshold: int, scale: float) -> jax.Array:
    """Scale the low-frequency (centered) 2D-FFT box of an NHWC feature
    map by ``scale`` (FreeU's skip-feature filter). fp32 FFT via XLA,
    cast back to x.dtype."""
    x32 = x.astype(jnp.complex64)
    f = jnp.fft.fftshift(jnp.fft.fft2(x32, axes=(1, 2)), axes=(1, 2))
    b, h, w, c = x.shape
    hc, wc = h // 2, w // 2
    rows = jnp.abs(jnp.arange(h) - hc) < threshold
    cols = jnp.abs(jnp.arange(w) - wc) < threshold
    low = rows[:, None] & cols[None, :]
    mask = jnp.where(low, scale, 1.0)[None, :, :, None]
    f = f * mask
    out = jnp.fft.ifft2(jnp.fft.ifftshift(f, axes=(1, 2)), axes=(1, 2))
    return jnp.real(out).astype(x.dtype)


def _apply_freeu(x: jax.Array, skip: jax.Array, level: int, freeu):
    """FreeU (Si et al. 2023): amplify the first half of the BACKBONE
    channels and damp the skip's low spatial frequencies, on the two
    deepest decoder levels (level 0 -> b1/s1, level 1 -> b2/s2) —
    diffusers' apply_freeu wiring. Inference-only reweighting; no
    parameters."""
    b1, b2, s1, s2 = freeu
    if level == 0:
        b, s = b1, s1
    elif level == 1:
        b, s = b2, s2
    else:
        return x, skip
    half = x.shape[-1] // 2
    x = jnp.concatenate(
        [x[..., :half] * jnp.asarray(b, x.dtype), x[..., half:]], axis=-1)
    return x, _fourier_filter(skip, threshold=1, scale=s)


def apply(
    params,
    x: jax.Array,
    timesteps: jax.Array,
    context: jax.Array,
    cfg: UNetConfig = SD15_CONFIG,
    *,
    adm_cond: Optional[jax.Array] = None,
    deepcache: Optional[Tuple[str, int]] = None,
    cache: Optional[jax.Array] = None,
    control=None,
    freeu: Optional[Tuple[float, float, float, float]] = None,
) -> jax.Array:
    """x (B, H, W, C_in) NHWC latents, timesteps (B,) float, context
    (B, S, context_dim) -> noise prediction (B, H, W, C_out).

    adm_cond (B, adm_in_channels): SDXL text_time conditioning vector
    (pooled text embedding ‖ sinusoidal size embeddings).

    control: optional (skip_residuals, middle_residual) from
    models/controlnet.apply — each skip residual is added to its skip
    tensor as it is popped, the middle residual after the middle block
    (the original ControlledUnetModel wiring, cldm/cldm.py). In
    deepcache 'shallow' mode only the first m skips exist, so control
    may instead be just a sequence of (at least) the first m skip
    residuals — typically the CACHED residuals from the last full pass
    (pipeline/sd.py refreshes them on full calls and reuses them on
    shallow calls via the sampler aux state); the middle residual is
    baked into ``cache`` already.

    deepcache: DeepCache-style deep-feature reuse (Ma et al. 2023 — the
    deep U-Net features drift slowly across adjacent denoise steps).
    ("full", m)    — run everything; ALSO return the hidden state entering
                     the last m output blocks, for later reuse.
    ("shallow", m) — run only the first m input blocks and last m output
                     blocks, splicing ``cache`` in as the deep feature;
                     returns (eps, cache) unchanged. Both modes return an
                     (eps, cache) pair so lax.cond can switch between them.
    """
    inp, mid, outp = build_plan(cfg)
    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = ops.linear(t_emb, params["time_embed"]["fc1"]["weight"], params["time_embed"]["fc1"]["bias"])
    emb = ops.linear(ops.silu(emb), params["time_embed"]["fc2"]["weight"], params["time_embed"]["fc2"]["bias"])
    if cfg.adm_in_channels:
        assert adm_cond is not None, "SDXL-style config needs adm_cond"
        a = ops.linear(
            adm_cond.astype(x.dtype),
            params["label_emb"]["fc1"]["weight"], params["label_emb"]["fc1"]["bias"],
        )
        a = ops.linear(
            ops.silu(a),
            params["label_emb"]["fc2"]["weight"], params["label_emb"]["fc2"]["bias"],
        )
        emb = emb + a

    mode, m = deepcache if deepcache is not None else (None, 0)
    if mode is not None and not (1 <= m <= min(len(inp), len(outp))):
        raise ValueError(
            f"deepcache split m={m} out of range: need 1 <= m <= "
            f"{min(len(inp), len(outp))} (input/output block counts "
            f"{len(inp)}/{len(outp)}) — otherwise the cache tap "
            f"j == len(outp)-m is never reached and cache_out stays None")
    if mode == "shallow":
        if cache is None:
            raise ValueError("deepcache 'shallow' mode needs cache=")
        skips = []
        for p, block in zip(params["input"][:m], inp[:m]):
            x = _run_block(p, block, x, emb, context, cfg)
            skips.append(x)
        if control is not None:
            ctrl_skips = (control[0] if (isinstance(control, tuple)
                                         and len(control) == 2)
                          else control)
            skips = [s + c.astype(s.dtype)
                     for s, c in zip(skips, ctrl_skips)]
        x = cache
        for i, (p, block) in enumerate(zip(params["output"][-m:], outp[-m:])):
            s = skips.pop()
            if freeu is not None:
                level = (len(outp) - m + i) // (cfg.num_res_blocks + 1)
                x, s = _apply_freeu(x, s, level, freeu)
            x = jnp.concatenate([x, s], axis=-1)
            x = _run_block(p, block, x, emb, context, cfg)
        cache_out = cache
    else:
        skips = []
        for p, block in zip(params["input"], inp):
            x = _run_block(p, block, x, emb, context, cfg)
            skips.append(x)
        x = _run_block(params["middle"], mid, x, emb, context, cfg)
        if control is not None:
            ctrl_skips, ctrl_mid = control
            if len(ctrl_skips) != len(skips):
                raise ValueError(
                    f"control has {len(ctrl_skips)} skip residuals, "
                    f"UNet plan has {len(skips)} skips")
            x = x + ctrl_mid.astype(x.dtype)
            skips = [s + c.astype(s.dtype)
                     for s, c in zip(skips, ctrl_skips)]
        cache_out = None
        for j, (p, block) in enumerate(zip(params["output"], outp)):
            if mode == "full" and j == len(outp) - m:
                cache_out = x
            s = skips.pop()
            if freeu is not None:
                x, s = _apply_freeu(x, s, j // (cfg.num_res_blocks + 1),
                                    freeu)
            x = jnp.concatenate([x, s], axis=-1)
            x = _run_block(p, block, x, emb, context, cfg)
    x = ops.group_norm(x, cfg.num_groups, params["out_norm"]["weight"], params["out_norm"]["bias"])
    x = ops.conv2d(ops.silu(x), params["out_conv"]["weight"], params["out_conv"]["bias"], padding=1)
    if deepcache is not None:
        return x, cache_out
    return x
