"""Canonical-torch oracles for the SD UNet and VAE.

Completes the oracle coverage started by tests/test_hf_oracle.py (CLIP
towers), tests/test_t5.py (T5) and tests/test_sd3_state.py (MMDiT): the
UNet/VAE math is re-implemented here in torch EXACTLY as the code that
produced real SD checkpoints computes it (CompVis ldm: in_layers/
out_layers ResBlocks, eps=1e-6 SpatialTransformer/VAE GroupNorms,
erf-GELU GEGLU, [h ‖ skip] concat order, asymmetric (0,1,0,1) encoder
downsample padding, c^-0.5 VAE attention), reading weights straight from
the checkpoint-layout state dict. Our implementation must agree
activation-for-activation after the state mapping — this plus the
format tests (tests/test_io.py) is the hermetic equivalent of loading a
real sd-v1 checkpoint (reference example/sd1.py:40-78) in this
zero-egress environment.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tinyfusers_tpu.io import state_map  # noqa: E402
from tinyfusers_tpu.models import unet as unet_model  # noqa: E402
from tinyfusers_tpu.models import vae as vae_model  # noqa: E402

CFG = unet_model.TINY_CONFIG
VCFG = vae_model.TINY_VAE_CONFIG


def _perturbed_params(init_fn, key, scale=0.08):
    params = init_fn(jax.random.key(key))
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(key)
    leaves = [
        jnp.asarray(rng.standard_normal(l.shape).astype(np.float32)) * scale
        for l in leaves
    ]
    return jax.tree.unflatten(treedef, leaves)


class _G:
    """state-dict accessor with canonical-name bookkeeping."""

    def __init__(self, state, prefix):
        self.state, self.prefix = state, prefix

    def __call__(self, k):
        return torch.from_numpy(np.asarray(self.state[f"{self.prefix}.{k}"]))

    def has(self, k):
        return f"{self.prefix}.{k}" in self.state


def _gn(h, g, k, groups, eps):
    return F.group_norm(h, groups, g(k + ".weight"), g(k + ".bias"), eps)


def _conv(h, g, k, **kw):
    return F.conv2d(h, g(k + ".weight"), g(k + ".bias"), **kw)


def _lin(h, g, k, bias=True):
    return F.linear(h, g(k + ".weight"), g(k + ".bias") if bias else None)


def _ln(h, g, k):
    return F.layer_norm(h, (h.shape[-1],), g(k + ".weight"), g(k + ".bias"))


# ---------------------------------------------------------------------------
# UNet oracle (CompVis ldm UNetModel math)
# ---------------------------------------------------------------------------

def _o_resblock(h, emb, g, p):
    hh = _conv(F.silu(_gn(h, g, f"{p}.in_layers.0", CFG.num_groups, 1e-5)),
               g, f"{p}.in_layers.2", padding=1)
    e = _lin(F.silu(emb), g, f"{p}.emb_layers.1")
    hh = hh + e[:, :, None, None]
    hh = _conv(F.silu(_gn(hh, g, f"{p}.out_layers.0", CFG.num_groups, 1e-5)),
               g, f"{p}.out_layers.3", padding=1)
    if g.has(f"{p}.skip_connection.weight"):
        h = _conv(h, g, f"{p}.skip_connection")
    return h + hh


def _o_xattn(hseq, ctx, g, p, heads):
    b, t, _ = hseq.shape
    q = F.linear(hseq, g(p + ".to_q.weight"))
    k = F.linear(ctx, g(p + ".to_k.weight"))
    v = F.linear(ctx, g(p + ".to_v.weight"))
    hd = q.shape[-1] // heads
    hs = lambda z: z.reshape(b, -1, heads, hd).transpose(1, 2)  # noqa: E731
    o = F.scaled_dot_product_attention(hs(q), hs(k), hs(v))
    o = o.transpose(1, 2).reshape(b, t, heads * hd)
    return _lin(o, g, p + ".to_out.0")


def _o_spatial_transformer(h, ctx, g, p, depth, heads):
    x_in = h
    h = _gn(h, g, f"{p}.norm", CFG.num_groups, 1e-6)
    h = _conv(h, g, f"{p}.proj_in")
    b, c, hh, ww = h.shape
    seq = h.flatten(2).transpose(1, 2)
    for d in range(depth):
        tp = f"{p}.transformer_blocks.{d}"
        n1 = _ln(seq, g, tp + ".norm1")
        seq = seq + _o_xattn(n1, n1, g, tp + ".attn1", heads)
        seq = seq + _o_xattn(_ln(seq, g, tp + ".norm2"), ctx, g,
                             tp + ".attn2", heads)
        n3 = _ln(seq, g, tp + ".norm3")
        pr = _lin(n3, g, tp + ".ff.net.0.proj")
        a, gate = pr.chunk(2, dim=-1)
        seq = seq + _lin(a * F.gelu(gate), g, tp + ".ff.net.2")
    h = seq.transpose(1, 2).reshape(b, c, hh, ww)
    h = _conv(h, g, f"{p}.proj_out")
    return h + x_in


def _oracle_unet(state, x, t, ctx):
    g = _G(state, "model.diffusion_model")
    x = torch.from_numpy(x).permute(0, 3, 1, 2)
    ctx = torch.from_numpy(ctx)

    half = CFG.model_channels // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    args = torch.from_numpy(t).float()[:, None] * freqs
    temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    emb = _lin(F.silu(_lin(temb, g, "time_embed.0")), g, "time_embed.2")

    def run(h, p, spec):
        if spec == "conv_in":
            return _conv(h, g, p, padding=1)
        if isinstance(spec, unet_model.ResSpec):
            return _o_resblock(h, emb, g, p)
        if isinstance(spec, unet_model.AttnSpec):
            heads, _ = CFG.heads_for(h.shape[1])
            return _o_spatial_transformer(h, ctx, g, p, spec.depth, heads)
        if isinstance(spec, unet_model.SampleSpec):
            if spec.mode == "down":
                return _conv(h, g, f"{p}.op", stride=2, padding=1)
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            return _conv(h, g, f"{p}.conv", padding=1)
        raise ValueError(spec)

    inp, mid, outp = unet_model.build_plan(CFG)
    skips = []
    h = x
    for i, block in enumerate(inp):
        for j, spec in enumerate(block):
            h = run(h, f"input_blocks.{i}.{j}", spec)
        skips.append(h)
    for j, spec in enumerate(mid):
        h = run(h, f"middle_block.{j}", spec)
    for i, block in enumerate(outp):
        h = torch.cat([h, skips.pop()], dim=1)  # canonical [h ‖ skip]
        for j, spec in enumerate(block):
            h = run(h, f"output_blocks.{i}.{j}", spec)
    h = F.silu(_gn(h, g, "out.0", CFG.num_groups, 1e-5))
    h = _conv(h, g, "out.2", padding=1)
    return h.permute(0, 2, 3, 1).numpy()


class TestUNetOracle:
    def test_matches_canonical_torch(self):
        params = _perturbed_params(
            lambda k: unet_model.init(k, CFG), key=0)
        state = state_map.unet_to_state(params, CFG)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 16, 16, CFG.in_channels)).astype(np.float32)
        t = np.array([500.0, 41.0], np.float32)
        ctx = rng.standard_normal((2, 8, CFG.context_dim)).astype(np.float32)

        with torch.no_grad():
            want = _oracle_unet(state, x, t, ctx)
        re_params = state_map.unet_from_state(state, CFG)
        got = np.asarray(jax.jit(
            lambda p, a, b, c: unet_model.apply(p, a, b, c, CFG)
        )(re_params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


# ---------------------------------------------------------------------------
# VAE oracle (CompVis ldm AutoencoderKL math)
# ---------------------------------------------------------------------------

def _o_vae_resnet(h, g, p, groups):
    hh = _conv(F.silu(_gn(h, g, f"{p}.norm1", groups, 1e-6)),
               g, f"{p}.conv1", padding=1)
    hh = _conv(F.silu(_gn(hh, g, f"{p}.norm2", groups, 1e-6)),
               g, f"{p}.conv2", padding=1)
    if g.has(f"{p}.nin_shortcut.weight"):
        h = _conv(h, g, f"{p}.nin_shortcut")
    return h + hh


def _o_vae_attn(h, g, p, groups):
    hn = _gn(h, g, f"{p}.norm", groups, 1e-6)
    q = _conv(hn, g, f"{p}.q")
    k = _conv(hn, g, f"{p}.k")
    v = _conv(hn, g, f"{p}.v")
    b, c, hh, ww = q.shape
    q2 = q.reshape(b, c, hh * ww).permute(0, 2, 1)
    k2 = k.reshape(b, c, hh * ww)
    w_ = torch.softmax(torch.bmm(q2, k2) * (c ** -0.5), dim=2)
    v2 = v.reshape(b, c, hh * ww)
    h_ = torch.bmm(v2, w_.permute(0, 2, 1)).reshape(b, c, hh, ww)
    return h + _conv(h_, g, f"{p}.proj_out")


def _o_vae_mid(h, g, p, groups):
    h = _o_vae_resnet(h, g, f"{p}.block_1", groups)
    h = _o_vae_attn(h, g, f"{p}.attn_1", groups)
    return _o_vae_resnet(h, g, f"{p}.block_2", groups)


def _oracle_vae_decode(state, z):
    g = _G(state, "first_stage_model")
    groups = VCFG.num_groups
    z = torch.from_numpy(z).permute(0, 3, 1, 2)
    z = z / VCFG.scale_factor + VCFG.shift_factor
    h = _conv(z, g, "post_quant_conv")
    h = _conv(h, g, "decoder.conv_in", padding=1)
    h = _o_vae_mid(h, g, "decoder.mid", groups)
    n_levels = len(VCFG.channel_mult)
    for i in reversed(range(n_levels - 1)):  # canonical reversed level order
        for j in range(3):
            h = _o_vae_resnet(h, g, f"decoder.up.{i}.block.{j}", groups)
        if i != 0:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(h, g, f"decoder.up.{i}.upsample.conv", padding=1)
    h = F.silu(_gn(h, g, "decoder.norm_out", groups, 1e-6))
    h = _conv(h, g, "decoder.conv_out", padding=1)
    return h.permute(0, 2, 3, 1).numpy()


def _oracle_vae_encode(state, x):
    g = _G(state, "first_stage_model")
    groups = VCFG.num_groups
    h = torch.from_numpy(x).permute(0, 3, 1, 2)
    h = _conv(h, g, "encoder.conv_in", padding=1)
    n_levels = len(VCFG.channel_mult)
    for i in range(n_levels - 1):
        for j in range(2):
            h = _o_vae_resnet(h, g, f"encoder.down.{i}.block.{j}", groups)
        if i != n_levels - 2:
            h = F.pad(h, (0, 1, 0, 1))  # canonical asymmetric (0,1,0,1)
            h = _conv(h, g, f"encoder.down.{i}.downsample.conv", stride=2)
    h = _o_vae_mid(h, g, "encoder.mid", groups)
    h = F.silu(_gn(h, g, "encoder.norm_out", groups, 1e-6))
    h = _conv(h, g, "encoder.conv_out", padding=1)
    h = _conv(h, g, "quant_conv")
    means = h[:, : VCFG.latent_channels]
    out = (means - VCFG.shift_factor) * VCFG.scale_factor
    return out.permute(0, 2, 3, 1).numpy()


class TestVAEOracle:
    def test_decode_matches_canonical_torch(self):
        params = _perturbed_params(
            lambda k: vae_model.init(k, VCFG), key=2)
        state = state_map.vae_to_state(params, VCFG)
        rng = np.random.default_rng(3)
        z = rng.standard_normal((2, 8, 8, VCFG.latent_channels)).astype(np.float32)

        with torch.no_grad():
            want = _oracle_vae_decode(state, z)
        re_params = state_map.vae_from_state(state, VCFG)
        got = np.asarray(jax.jit(
            lambda p, a: vae_model.decode(p, a, VCFG)
        )(re_params, jnp.asarray(z)))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)

    def test_encode_matches_canonical_torch(self):
        params = _perturbed_params(
            lambda k: vae_model.init(k, VCFG), key=4)
        state = state_map.vae_to_state(params, VCFG)
        rng = np.random.default_rng(5)
        f = VCFG.downsample_factor
        x = rng.standard_normal((1, 8 * f, 8 * f, 3)).astype(np.float32)

        with torch.no_grad():
            want = _oracle_vae_encode(state, x)
        re_params = state_map.vae_from_state(state, VCFG)
        got = np.asarray(jax.jit(
            lambda p, a: vae_model.encode(p, a, VCFG)
        )(re_params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)
