"""SD3 checkpoint-mapping tests (VERDICT round-1 item 3).

`mmdit_from_state` is validated against a torch re-implementation of the
*canonical* SD3 MMDiT block math operating directly on the checkpoint
layout: fused [q|k|v] projections (vs our head-interleaved layout — the
permutation in io/state_map._fused_qkv_from_torch is exactly what's under
test), the pre_only last context_block, the learned 2D pos-embed grid
with center cropping, and the shift/scale/gate modulation order.

Extends reference capability storage/state.py:4-23 (recursive weight
mapper) to the SD3 backbone; test style mirrors tests/test_hf_oracle.py.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tinyfusers_tpu.io import state_map  # noqa: E402
from tinyfusers_tpu.models import mmdit  # noqa: E402
from tinyfusers_tpu.pipeline import sd3  # noqa: E402

CFG = mmdit.MMDiTConfig(input_size=8, patch_size=2, in_channels=4,
                        out_channels=4, dim=64, depth=3, num_heads=4,
                        context_dim=32, pooled_dim=16, context_len=6)
POS_GRID = 6  # stored pos-embed grid (> input grid 4 -> exercises cropping)


def _canonical_state(seed: int, qk_norm: bool = False):
    """Random state dict in the canonical SD3 single-file layout.
    qk_norm=True adds the SD3.5 attn.ln_{q,k} RMS weights."""
    rng = np.random.default_rng(seed)
    d, p, r = CFG.dim, CFG.patch_size, CFG.mlp_ratio

    def t(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    pfx = "model.diffusion_model"
    s = {
        f"{pfx}.x_embedder.proj.weight": t(d, CFG.in_channels, p, p),
        f"{pfx}.x_embedder.proj.bias": t(d),
        f"{pfx}.pos_embed": t(1, POS_GRID * POS_GRID, d),
        f"{pfx}.t_embedder.mlp.0.weight": t(d, 256),
        f"{pfx}.t_embedder.mlp.0.bias": t(d),
        f"{pfx}.t_embedder.mlp.2.weight": t(d, d),
        f"{pfx}.t_embedder.mlp.2.bias": t(d),
        f"{pfx}.y_embedder.mlp.0.weight": t(d, CFG.pooled_dim),
        f"{pfx}.y_embedder.mlp.0.bias": t(d),
        f"{pfx}.y_embedder.mlp.2.weight": t(d, d),
        f"{pfx}.y_embedder.mlp.2.bias": t(d),
        f"{pfx}.context_embedder.weight": t(d, CFG.context_dim),
        f"{pfx}.context_embedder.bias": t(d),
        f"{pfx}.final_layer.adaLN_modulation.1.weight": t(2 * d, d),
        f"{pfx}.final_layer.adaLN_modulation.1.bias": t(2 * d),
        f"{pfx}.final_layer.linear.weight": t(p * p * CFG.out_channels, d),
        f"{pfx}.final_layer.linear.bias": t(p * p * CFG.out_channels),
    }
    for i in range(CFG.depth):
        for stream in ("x_block", "context_block"):
            pre_only = stream == "context_block" and i == CFG.depth - 1
            sp = f"{pfx}.joint_blocks.{i}.{stream}"
            nmod = 2 if pre_only else 6
            s[f"{sp}.adaLN_modulation.1.weight"] = t(nmod * d, d)
            s[f"{sp}.adaLN_modulation.1.bias"] = t(nmod * d)
            s[f"{sp}.attn.qkv.weight"] = t(3 * d, d)
            s[f"{sp}.attn.qkv.bias"] = t(3 * d)
            if qk_norm:
                hd = d // CFG.num_heads
                s[f"{sp}.attn.ln_q.weight"] = 1.0 + t(hd)
                s[f"{sp}.attn.ln_k.weight"] = 1.0 + t(hd)
            if not pre_only:
                s[f"{sp}.attn.proj.weight"] = t(d, d)
                s[f"{sp}.attn.proj.bias"] = t(d)
                s[f"{sp}.mlp.fc1.weight"] = t(r * d, d)
                s[f"{sp}.mlp.fc1.bias"] = t(r * d)
                s[f"{sp}.mlp.fc2.weight"] = t(d, r * d)
                s[f"{sp}.mlp.fc2.bias"] = t(d)
    return s


def _oracle(state, x, t_in, context, pooled):
    """Canonical SD3 MMDiT forward in torch, straight off the state dict."""
    g = lambda k: torch.from_numpy(  # noqa: E731
        np.asarray(state[f"model.diffusion_model.{k}"]))
    lin = lambda h, k: F.linear(h, g(k + ".weight"), g(k + ".bias"))  # noqa: E731
    ln = lambda h: F.layer_norm(h, (h.shape[-1],))  # noqa: E731

    p = CFG.patch_size
    x = torch.from_numpy(x).permute(0, 3, 1, 2)  # NHWC -> NCHW
    h = F.conv2d(x, g("x_embedder.proj.weight"), g("x_embedder.proj.bias"),
                 stride=p)
    b, d, hp, wp = h.shape
    tok = h.flatten(2).transpose(1, 2)  # (B, T, D)
    pe = g("pos_embed").reshape(POS_GRID, POS_GRID, d)
    top, left = (POS_GRID - hp) // 2, (POS_GRID - wp) // 2
    tok = tok + pe[top:top + hp, left:left + wp].reshape(1, hp * wp, d)

    half = 128
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    args = (torch.from_numpy(t_in).float() * 1000.0)[:, None] * freqs
    temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    c = lin(F.silu(lin(temb, "t_embedder.mlp.0")), "t_embedder.mlp.2")
    y = lin(torch.from_numpy(pooled), "y_embedder.mlp.0")
    c = c + lin(F.silu(y), "y_embedder.mlp.2")
    ctx = lin(torch.from_numpy(context), "context_embedder")

    def heads(z):
        bb, tt, dd = z.shape
        hd = dd // CFG.num_heads
        return z.reshape(bb, tt, CFG.num_heads, hd).transpose(1, 2)

    def qknorm(z, key):
        # SD3.5 per-head RMS qk-norm, applied when the checkpoint carries
        # attn.ln_{q,k} weights (absent in SD3-medium layouts).
        if f"model.diffusion_model.{key}.weight" not in state:
            return z
        bb, tt, dd = z.shape
        hd = dd // CFG.num_heads
        zh = z.reshape(bb, tt, CFG.num_heads, hd)
        rms = torch.rsqrt(zh.pow(2).mean(-1, keepdim=True) + 1e-6)
        return (zh * rms * g(key + ".weight")).reshape(bb, tt, dd)

    for i in range(CFG.depth):
        last = i == CFG.depth - 1
        xb = f"joint_blocks.{i}.x_block"
        cb = f"joint_blocks.{i}.context_block"
        sh1, sc1, g1, sh2, sc2, g2 = lin(
            F.silu(c), f"{xb}.adaLN_modulation.1").chunk(6, dim=-1)
        hx = ln(tok) * (1 + sc1[:, None]) + sh1[:, None]
        qx, kx, vx = lin(hx, f"{xb}.attn.qkv").chunk(3, dim=-1)
        qx = qknorm(qx, f"{xb}.attn.ln_q")
        kx = qknorm(kx, f"{xb}.attn.ln_k")
        modc = lin(F.silu(c), f"{cb}.adaLN_modulation.1")
        if last:
            csh1, csc1 = modc.chunk(2, dim=-1)
        else:
            csh1, csc1, cg1, csh2, csc2, cg2 = modc.chunk(6, dim=-1)
        hc = ln(ctx) * (1 + csc1[:, None]) + csh1[:, None]
        qc, kc, vc = lin(hc, f"{cb}.attn.qkv").chunk(3, dim=-1)
        qc = qknorm(qc, f"{cb}.attn.ln_q")
        kc = qknorm(kc, f"{cb}.attn.ln_k")
        tc = ctx.shape[1]
        # Canonical order: context tokens first (block_mixing in the SD3
        # reference impl); attention output is order-equivariant.
        q = torch.cat([qc, qx], 1)
        k = torch.cat([kc, kx], 1)
        v = torch.cat([vc, vx], 1)
        o = F.scaled_dot_product_attention(heads(q), heads(k), heads(v))
        o = o.transpose(1, 2).reshape(q.shape)
        oc, ox = o[:, :tc], o[:, tc:]
        tok = tok + g1[:, None] * lin(ox, f"{xb}.attn.proj")
        hx = ln(tok) * (1 + sc2[:, None]) + sh2[:, None]
        hx = F.gelu(lin(hx, f"{xb}.mlp.fc1"), approximate="tanh")
        tok = tok + g2[:, None] * lin(hx, f"{xb}.mlp.fc2")
        if not last:
            ctx = ctx + cg1[:, None] * lin(oc, f"{cb}.attn.proj")
            hc2 = ln(ctx) * (1 + csc2[:, None]) + csh2[:, None]
            hc2 = F.gelu(lin(hc2, f"{cb}.mlp.fc1"), approximate="tanh")
            ctx = ctx + cg2[:, None] * lin(hc2, f"{cb}.mlp.fc2")

    sh, sc = lin(F.silu(c), "final_layer.adaLN_modulation.1").chunk(2, dim=-1)
    tok = ln(tok) * (1 + sc[:, None]) + sh[:, None]
    out = lin(tok, "final_layer.linear")
    out = out.reshape(b, hp, wp, p, p, CFG.out_channels)
    out = out.permute(0, 1, 3, 2, 4, 5).reshape(
        b, hp * p, wp * p, CFG.out_channels)
    return out.numpy()


class TestMMDiTFromState:
    def test_matches_canonical_torch_oracle(self):
        state = _canonical_state(0)
        rng = np.random.default_rng(1)
        x = rng.standard_normal(
            (2, CFG.input_size, CFG.input_size, CFG.in_channels)
        ).astype(np.float32)
        t_in = np.array([0.25, 0.9], np.float32)
        context = rng.standard_normal(
            (2, CFG.context_len, CFG.context_dim)).astype(np.float32)
        pooled = rng.standard_normal((2, CFG.pooled_dim)).astype(np.float32)

        want = _oracle(state, x, t_in, context, pooled)
        params = state_map.mmdit_from_state(state, CFG)
        got = np.asarray(jax.jit(
            lambda pr, *a: mmdit.apply(pr, *a, cfg=CFG)
        )(params, jnp.asarray(x), jnp.asarray(t_in), jnp.asarray(context),
          jnp.asarray(pooled)))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)

    def test_qk_norm_matches_canonical_torch_oracle(self):
        """SD3.5 variant: RMS qk-norm weights in the checkpoint must be
        mapped and applied per head (models/mmdit.py _rms_qk)."""
        import dataclasses

        cfg = dataclasses.replace(CFG, qk_norm="rms")
        state = _canonical_state(4, qk_norm=True)
        rng = np.random.default_rng(5)
        x = rng.standard_normal(
            (1, cfg.input_size, cfg.input_size, cfg.in_channels)
        ).astype(np.float32)
        t_in = np.array([0.7], np.float32)
        context = rng.standard_normal(
            (1, cfg.context_len, cfg.context_dim)).astype(np.float32)
        pooled = rng.standard_normal((1, cfg.pooled_dim)).astype(np.float32)

        want = _oracle(state, x, t_in, context, pooled)
        params = state_map.mmdit_from_state(state, cfg)
        got = np.asarray(jax.jit(
            lambda pr, *a: mmdit.apply(pr, *a, cfg=cfg)
        )(params, jnp.asarray(x), jnp.asarray(t_in), jnp.asarray(context),
          jnp.asarray(pooled)))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)

    def test_qk_norm_key_parity_roundtrip(self):
        import dataclasses

        cfg = dataclasses.replace(CFG, qk_norm="rms")
        state = _canonical_state(6, qk_norm=True)
        params = state_map.mmdit_from_state(state, cfg)
        back = state_map.mmdit_to_state(params, cfg)
        assert set(back) == set(state)
        np.testing.assert_array_equal(
            back["model.diffusion_model.joint_blocks.0.x_block.attn.ln_q.weight"],
            state["model.diffusion_model.joint_blocks.0.x_block.attn.ln_q.weight"])

    def test_key_parity_roundtrip(self):
        """to_state(from_state(S)) reproduces S's exact key set, and every
        value except the (cropped) pos_embed bit-exactly."""
        state = _canonical_state(2)
        params = state_map.mmdit_from_state(state, CFG)
        back = state_map.mmdit_to_state(params, CFG)
        pe_key = "model.diffusion_model.pos_embed"
        assert set(back) == set(state)
        for k in state:
            if k == pe_key:
                continue
            np.testing.assert_array_equal(back[k], state[k], err_msg=k)
        grid = CFG.input_size // CFG.patch_size
        np.testing.assert_array_equal(
            back[pe_key], state_map._crop_pos_embed(state[pe_key], grid))


class TestSD3FullPipeline:
    def test_params_from_state_runs(self):
        """Full SD3-layout state dict -> pipeline params -> generate."""
        cfg = sd3.TINY_SD3
        params = sd3.init(jax.random.key(0), cfg)
        state = state_map.sd3_state_from_params(params, cfg)
        # text-encoder / vae / mmdit prefixes all present
        assert any(k.startswith("text_encoders.clip_l.") for k in state)
        assert any(k.startswith("text_encoders.clip_g.") for k in state)
        assert any(k.startswith("model.diffusion_model.joint_blocks.") for k in state)
        assert any(k.startswith("first_stage_model.") for k in state)
        assert not any("quant_conv" in k for k in state)  # SD3 VAE drops them

        re_params = state_map.sd3_params_from_state(state, cfg)
        ids = jnp.zeros((1, cfg.clip_l.max_length), jnp.int32)
        lat = sd3.initial_latent(jax.random.key(1), 1, cfg)
        img = sd3.generate(re_params, ids, ids, ids, ids, lat,
                           jnp.float32(4.0), num_steps=2, cfg=cfg)
        assert img.shape == (1, cfg.height, cfg.width, 3)
        assert img.dtype == jnp.uint8

    def test_reload_preserves_mmdit_output(self):
        """Export -> reimport through the SD3 layout is numerically exact
        for the backbone (the trip is pure transposes/permutations)."""
        cfg = sd3.TINY_SD3.mmdit
        key = jax.random.key(3)
        params = jax.tree.map(
            lambda x: jax.random.normal(
                jax.random.fold_in(key, hash(str(x.shape)) % (2**31)),
                x.shape, x.dtype) * 0.05,
            mmdit.init(jax.random.key(4), cfg))
        state = state_map.mmdit_to_state(params, cfg)
        re_params = state_map.mmdit_from_state(state, cfg)
        x = jax.random.normal(
            jax.random.key(5),
            (1, cfg.input_size, cfg.input_size, cfg.in_channels))
        t_in = jnp.array([0.5])
        ctx = jax.random.normal(
            jax.random.key(6), (1, cfg.context_len, cfg.context_dim))
        pooled = jax.random.normal(jax.random.key(7), (1, cfg.pooled_dim))
        a = mmdit.apply(params, x, t_in, ctx, pooled, cfg)
        b = mmdit.apply(re_params, x, t_in, ctx, pooled, cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
