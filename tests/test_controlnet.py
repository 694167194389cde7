"""ControlNet tests: zero-init no-op identity, control actually steers,
hint encoder geometry, checkpoint mapping round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyfusers_tpu.models import controlnet, unet
from tinyfusers_tpu.pipeline import sd


def setup_tiny():
    cfg = sd.TINY
    params = sd.init(jax.random.key(0), cfg)
    cn = controlnet.init(jax.random.key(1), cfg.unet)
    ids = jnp.ones((1, cfg.clip.max_length), jnp.int32)
    uids = jnp.zeros((1, cfg.clip.max_length), jnp.int32)
    lat = sd.initial_latent(jax.random.key(2), 1, cfg)
    # the hint encoder downsamples 8x (like the SD VAE); TINY's toy VAE
    # only downsamples 2x, so build the hint from the LATENT grid
    hh, ww = lat.shape[1] * 8, lat.shape[2] * 8
    hint = jnp.linspace(0, 1, hh * ww * 3).reshape(1, hh, ww, 3)
    return cfg, params, cn, ids, uids, lat, hint


class TestControlNet:
    def test_zero_init_is_exact_noop(self):
        """Freshly-initialized zero convs gate every residual to exactly
        0, so a controlled generation must equal the base generation
        bit-for-bit (the ControlNet training premise)."""
        cfg, params, cn, ids, uids, lat, hint = setup_tiny()
        base = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                           num_steps=2, cfg=cfg)
        ctrl = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                           num_steps=2, cfg=cfg,
                           control=(cn, hint, 1.0))
        np.testing.assert_array_equal(np.asarray(base), np.asarray(ctrl))

    def test_nonzero_control_steers_output(self):
        cfg, params, cn, ids, uids, lat, hint = setup_tiny()
        # un-zero the gates so the control branch actually contributes
        cn = jax.tree.map(lambda x: x, cn)
        cn["zero_convs"] = [
            {"weight": jnp.full_like(z["weight"], 0.05),
             "bias": z["bias"]} for z in cn["zero_convs"]]
        cn["middle_out"] = {
            "weight": jnp.full_like(cn["middle_out"]["weight"], 0.05),
            "bias": cn["middle_out"]["bias"]}
        cn["input_hint"][-1] = {
            "weight": jnp.full_like(cn["input_hint"][-1]["weight"], 0.05),
            "bias": cn["input_hint"][-1]["bias"]}
        base = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                           num_steps=2, cfg=cfg)
        ctrl = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                           num_steps=2, cfg=cfg,
                           control=(cn, hint, 1.0))
        assert not np.array_equal(np.asarray(base), np.asarray(ctrl))
        # scale=0 kills the residuals again
        off = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                          num_steps=2, cfg=cfg,
                          control=(cn, hint, 0.0))
        np.testing.assert_array_equal(np.asarray(base), np.asarray(off))

    def test_hint_encoder_geometry(self):
        cfg, _params, cn, *_rest = setup_tiny()
        hint = jnp.zeros((2, 128, 128, 3))
        g = controlnet.encode_hint(cn, hint)
        assert g.shape == (2, 16, 16, cfg.unet.model_channels)

    def test_residual_count_matches_unet_skips(self):
        cfg, params, cn, ids, uids, lat, hint = setup_tiny()
        res, mid = controlnet.apply(
            cn, lat, hint, jnp.full((1,), 500.0),
            jnp.zeros((1, cfg.clip.max_length, cfg.unet.context_dim)),
            cfg.unet)
        inp, _, _ = unet.build_plan(cfg.unet)
        assert len(res) == len(inp)
        assert mid.shape == res[-1].shape

    @pytest.mark.parametrize("method", ["ddim", "euler"])
    @pytest.mark.parametrize("kw", [
        {"uncond_interval": 2},
        {"deepcache_interval": 2, "deepcache_split": 1},
        {"deepcache_interval": 2, "deepcache_split": 1,
         "uncond_interval": 2},
    ], ids=["cached_cfg", "deepcache", "both"])
    def test_cache_composition_zero_control_matches_plain(self, method, kw):
        """ControlNet composes with cached-CFG/DeepCache (round-4 verdict
        item 3). With a zero-init (exact no-op) ControlNet, the composed
        path must equal the same cached approximation WITHOUT control,
        bit-for-bit — proving the residual plumbing adds nothing but the
        residuals, under ddim and a sigma-space sampler."""
        cfg, params, cn, ids, uids, lat, hint = setup_tiny()
        plain = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                            num_steps=4, cfg=cfg, method=method, **kw)
        ctrl = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                           num_steps=4, cfg=cfg, method=method,
                           control=(cn, hint, 1.0), **kw)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(ctrl))

    def test_cache_composition_nonzero_control_steers(self):
        """Non-neutral control must still steer the cached paths, and the
        composed image should approximate the exact controlled image
        (same-ballpark PSNR, like cached-CFG/DeepCache without control)."""
        cfg, params, cn, ids, uids, lat, hint = setup_tiny()
        cn["zero_convs"] = [
            {"weight": jnp.full_like(z["weight"], 0.05),
             "bias": z["bias"]} for z in cn["zero_convs"]]
        cn["middle_out"] = {
            "weight": jnp.full_like(cn["middle_out"]["weight"], 0.05),
            "bias": cn["middle_out"]["bias"]}
        exact = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                            num_steps=4, cfg=cfg, control=(cn, hint, 1.0))
        base_cached = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                                  num_steps=4, cfg=cfg,
                                  deepcache_interval=2, deepcache_split=1,
                                  uncond_interval=2)
        composed = sd.generate(params, ids, uids, lat, jnp.float32(5.0),
                               num_steps=4, cfg=cfg, control=(cn, hint, 1.0),
                               deepcache_interval=2, deepcache_split=1,
                               uncond_interval=2)
        composed = np.asarray(composed)
        # control steers the cached path...
        assert not np.array_equal(composed, np.asarray(base_cached))
        # ...toward the exact controlled image (closer than no-control is)
        def mse(a, b):
            return float(np.mean((np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64)) ** 2))
        assert mse(composed, exact) < mse(base_cached, exact)


class TestControlNetStateMap:
    def test_round_trip(self):
        from tinyfusers_tpu.io import state_map

        cfg = sd.TINY
        cn = controlnet.init(jax.random.key(3), cfg.unet)
        state = state_map.controlnet_to_state(cn, cfg.unet)
        assert all(k.startswith("control_model.") for k in state)
        back = state_map.controlnet_from_state(state, cfg.unet)
        for a, b in zip(jax.tree.leaves(cn), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_key_scheme_pins(self):
        """Pin the lllyasviel key scheme the mapper expects: hint convs
        at even input_hint_block indices, zero convs under .0, middle
        gate under middle_block_out.0."""
        from tinyfusers_tpu.io import state_map

        cfg = sd.TINY
        cn = controlnet.init(jax.random.key(3), cfg.unet)
        keys = set(state_map.controlnet_to_state(cn, cfg.unet))
        assert "control_model.input_hint_block.0.weight" in keys
        assert "control_model.input_hint_block.14.weight" in keys
        assert "control_model.zero_convs.0.0.weight" in keys
        assert "control_model.middle_block_out.0.weight" in keys
        assert "control_model.time_embed.0.weight" in keys
        assert "control_model.input_blocks.1.0.in_layers.2.weight" in keys
