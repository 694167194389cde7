"""Checkpoint IO tests.

Round-trip strategy: init tiny-config params -> export to SD-format state
dict (state_map.*_to_state) -> write as a real torch zip checkpoint
(torch.save, torch used ONLY as a fixture writer / oracle) -> load through
our torch-free loader + mappers -> must equal the original tree. Also
covers fp16/bf16/stride decoding of the pickle loader and the native
safetensors reader against the safetensors library.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tinyfusers_tpu.io import checkpoints, safetensors_io, state_map, torch_pickle
from tinyfusers_tpu.models import clip, unet, vae
from tinyfusers_tpu.pipeline import sd


def tree_allclose(a, b, atol=1e-6):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


class TestTorchPickle:
    def test_basic_dtypes_and_shapes(self, tmp_path):
        sd_dict = {
            "a": torch.arange(12, dtype=torch.float32).reshape(3, 4),
            "b": torch.randn(5, dtype=torch.float16),
            "c": torch.arange(6, dtype=torch.int64),
            "d": torch.tensor(3.5),
        }
        p = tmp_path / "ckpt.pt"
        torch.save(sd_dict, p)
        got = torch_pickle.load(p)
        for k in sd_dict:
            want = sd_dict[k].numpy()
            assert got[k].dtype == want.dtype, k
            np.testing.assert_array_equal(got[k], want)

    def test_bfloat16(self, tmp_path):
        t = torch.randn(4, 4, dtype=torch.bfloat16)
        p = tmp_path / "bf16.pt"
        torch.save({"w": t}, p)
        got = torch_pickle.load(p)["w"]
        np.testing.assert_array_equal(
            got.view(np.uint16), t.view(torch.uint16).numpy()
        )

    def test_noncontiguous_tensor(self, tmp_path):
        """Strided views must decode correctly (reference unpicker.py:26
        ignores strides)."""
        base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
        view = base.t()  # non-contiguous transpose view
        p = tmp_path / "strided.pt"
        torch.save({"v": view}, p)
        got = torch_pickle.load(p)["v"]
        np.testing.assert_array_equal(got, view.numpy())

    def test_state_dict_unwrap(self, tmp_path):
        p = tmp_path / "wrapped.ckpt"
        torch.save({"state_dict": {"x": torch.ones(2)}, "epoch": 3}, p)
        got = torch_pickle.load_state_dict(p)
        assert set(got.keys()) == {"x"}

    def test_rejects_arbitrary_globals(self, tmp_path):
        """The unpickler must refuse non-whitelisted classes."""
        import pickle

        class Evil:
            def __reduce__(self):
                return (print, ("pwned",))

        p = tmp_path / "evil.pt"
        torch.save({"e": Evil()}, p)
        with pytest.raises(Exception):
            torch_pickle.load(p)


class TestSafetensors:
    def test_roundtrip_native(self, tmp_path):
        state = {
            "x": np.random.randn(3, 4).astype(np.float32),
            "y": np.random.randn(7).astype(np.float16),
        }
        p = tmp_path / "w.safetensors"
        safetensors_io.save_state_dict(state, p)
        got = safetensors_io.load_state_dict(p)
        for k in state:
            np.testing.assert_array_equal(got[k], state[k])

    def test_reads_library_written_file(self, tmp_path):
        from safetensors.numpy import save_file

        state = {"w": np.random.randn(2, 3).astype(np.float32)}
        p = tmp_path / "lib.safetensors"
        save_file(state, str(p))
        got = safetensors_io.load_state_dict(p)
        np.testing.assert_array_equal(got["w"], state["w"])

    def test_library_reads_our_file(self, tmp_path):
        from safetensors.numpy import load_file

        state = {"w": np.random.randn(2, 3).astype(np.float32)}
        p = tmp_path / "ours.safetensors"
        safetensors_io.save_state_dict(state, p)
        got = load_file(str(p))
        np.testing.assert_array_equal(got["w"], state["w"])


class TestStateMapRoundtrip:
    def test_unet_roundtrip(self):
        cfg = unet.TINY_CONFIG
        params = unet.init(jax.random.key(0), cfg)
        state = state_map.unet_to_state(params, cfg)
        back = state_map.unet_from_state(state, cfg)
        tree_allclose(params, back)

    def test_vae_roundtrip(self):
        cfg = vae.TINY_VAE_CONFIG
        params = vae.init(jax.random.key(0), cfg)
        state = state_map.vae_to_state(params, cfg)
        back = state_map.vae_from_state(state, cfg)
        tree_allclose(params, back)

    def test_clip_roundtrip(self):
        cfg = sd.TINY.clip
        params = clip.init(jax.random.key(0), cfg)
        state = state_map.clip_to_state(params, cfg)
        back = state_map.clip_from_state(state, cfg)
        tree_allclose(params, back)

    def test_full_ckpt_via_torch_zip(self, tmp_path):
        """End-to-end: our params -> SD-format torch .ckpt on disk -> our
        loader -> identical generation output."""
        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        state = state_map.sd_state_from_params(params, cfg)
        p = tmp_path / "tiny_sd.ckpt"
        torch.save({"state_dict": {k: torch.tensor(v) for k, v in state.items()}}, p)

        loaded = checkpoints.load_sd_params(p, cfg, dtype=jnp.float32)
        tree_allclose(params, loaded)

    def test_full_ckpt_via_safetensors(self, tmp_path):
        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        state = state_map.sd_state_from_params(params, cfg)
        p = tmp_path / "tiny_sd.safetensors"
        safetensors_io.save_state_dict(state, p)
        loaded = checkpoints.load_sd_params(p, cfg, dtype=jnp.float32)
        tree_allclose(params, loaded)

    def test_sd15_key_names_match_reference_layout(self):
        """Spot-check that full-size export produces the canonical SD v1
        key strings (what real checkpoints contain)."""
        cfg = sd.SD15
        # shapes only — zeros via eval_shape instead of real RNG init
        shapes = jax.eval_shape(lambda: unet.init(jax.random.key(0), cfg.unet))
        params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
        state = state_map.unet_to_state(params, cfg.unet)
        for key, shape in [
            ("model.diffusion_model.input_blocks.0.0.weight", (320, 4, 3, 3)),
            ("model.diffusion_model.input_blocks.1.0.in_layers.2.weight", (320, 320, 3, 3)),
            ("model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight", (320, 768)),
            ("model.diffusion_model.input_blocks.3.0.op.weight", (320, 320, 3, 3)),
            ("model.diffusion_model.middle_block.1.proj_out.weight", (1280, 1280, 1, 1)),
            ("model.diffusion_model.output_blocks.2.1.conv.weight", (1280, 1280, 3, 3)),
            ("model.diffusion_model.output_blocks.5.2.conv.weight", (1280, 1280, 3, 3)),
            ("model.diffusion_model.output_blocks.11.1.transformer_blocks.0.ff.net.0.proj.weight", (2560, 320)),
            ("model.diffusion_model.out.2.weight", (4, 320, 3, 3)),
        ]:
            assert key in state, key
            assert state[key].shape == shape, (key, state[key].shape, shape)


class TestQuantizeTree:
    def test_quantize_tiny_unet_and_run(self):
        from tinyfusers_tpu.io.quantize_tree import quantize_params
        from tinyfusers_tpu.ops.quant import QuantizedTensor

        cfg = unet.TINY_CONFIG
        params = unet.init(jax.random.key(0), cfg)
        qparams = quantize_params(params, jnp.int8)
        nq = sum(
            1 for leaf in jax.tree.leaves(
                qparams, is_leaf=lambda x: isinstance(x, QuantizedTensor))
            if isinstance(leaf, QuantizedTensor)
        )
        assert nq > 0
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        t = jnp.ones((1,))
        ctx = jax.random.normal(jax.random.key(2), (1, 8, cfg.context_dim))
        dense = unet.apply(params, x, t, ctx, cfg)
        quant = unet.apply(qparams, x, t, ctx, cfg)
        # int8 weight-only should track the dense output closely
        err = np.abs(np.asarray(quant) - np.asarray(dense)).mean()
        scale = np.abs(np.asarray(dense)).mean()
        assert err / scale < 0.1, (err, scale)

    def test_quantize_tiny_unet_int4_and_run(self):
        from tinyfusers_tpu.io.quantize_tree import quantize_params
        from tinyfusers_tpu.ops.quant import Int4Tensor

        cfg = unet.TINY_CONFIG
        params = unet.init(jax.random.key(0), cfg)
        qparams = quantize_params(params, "int4", group_size=32)
        nq = sum(
            1 for leaf in jax.tree.leaves(
                qparams, is_leaf=lambda x: isinstance(x, Int4Tensor))
            if isinstance(leaf, Int4Tensor)
        )
        assert nq > 0
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        t = jnp.ones((1,))
        ctx = jax.random.normal(jax.random.key(2), (1, 8, cfg.context_dim))
        dense = unet.apply(params, x, t, ctx, cfg)
        quant = unet.apply(qparams, x, t, ctx, cfg)
        err = np.abs(np.asarray(quant) - np.asarray(dense)).mean()
        scale = np.abs(np.asarray(dense)).mean()
        assert np.isfinite(np.asarray(quant)).all()
        assert err / scale < 0.5, (err, scale)  # int4: loose sanity bar


class TestSDXLStateMap:
    def test_sdxl_roundtrip_via_safetensors(self, tmp_path):
        from tinyfusers_tpu.pipeline import sdxl

        cfg = sdxl.TINY_XL
        params = sdxl.init(jax.random.key(0), cfg)
        state = state_map.sdxl_state_from_params(params, cfg)
        p = tmp_path / "tiny_xl.safetensors"
        safetensors_io.save_state_dict(
            {k: np.asarray(v, np.float32) for k, v in state.items()}, p
        )
        loaded = checkpoints.load_sdxl_params(p, cfg, dtype=jnp.float32)
        tree_allclose(params, loaded)

    def test_openclip_layout_keys(self):
        """Exported bigG keys must match the original OpenCLIP layout."""
        from tinyfusers_tpu.models import clip as clip_model
        from tinyfusers_tpu.pipeline import sdxl

        cfg = sdxl.TINY_XL.clip_g
        params = clip_model.init(jax.random.key(0), cfg)
        state = state_map.openclip_to_state(params, cfg, "conditioner.embedders.1.model")
        pfx = "conditioner.embedders.1.model"
        assert f"{pfx}.positional_embedding" in state
        assert f"{pfx}.transformer.resblocks.0.attn.in_proj_weight" in state
        assert state[f"{pfx}.transformer.resblocks.0.attn.in_proj_weight"].shape == (
            3 * cfg.dim, cfg.dim)
        assert f"{pfx}.text_projection" in state
        assert f"{pfx}.ln_final.weight" in state


class TestSaveFacade:
    def test_save_and_reload(self, tmp_path):
        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        p = tmp_path / "export.safetensors"
        checkpoints.save_sd_checkpoint(params, p, cfg)
        back = checkpoints.load_sd_params(p, cfg, dtype=jnp.float32)
        tree_allclose(params, back)

    def test_save_bf16_roundtrip(self, tmp_path):
        cfg = sd.TINY
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                              sd.init(jax.random.key(0), cfg))
        p = tmp_path / "export_bf16.safetensors"
        checkpoints.save_sd_checkpoint(params, p, cfg)
        back = checkpoints.load_sd_params(p, cfg, dtype=jnp.bfloat16)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32))
