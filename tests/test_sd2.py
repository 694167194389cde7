"""SD 2.x support: v-prediction, OpenCLIP-H conditioning, penultimate
final-norm tap, OpenCLIP tokenizer padding."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tinyfusers_tpu.models import clip
from tinyfusers_tpu.pipeline import ddim, sd


TINY_V = dataclasses.replace(
    sd.TINY, prediction_type="v", clip_skip_layers=1,
    clip_final_norm_on_skip=True)


class TestVPrediction:
    def test_model_out_to_eps_inverts_v_parameterization(self):
        """v = sqrt(a) eps - sqrt(1-a) x0 at x_t = sqrt(a) x0 + sqrt(1-a) eps
        must map back to eps exactly."""
        key = jax.random.key(0)
        x0 = jax.random.normal(key, (2, 8, 8, 4))
        eps = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
        for t in (11, 501, 981):
            a = ddim.alphas_cumprod()[t]
            x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps
            v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
            got = sd.model_out_to_eps(v, x_t, jnp.float32(t), TINY_V)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(eps), atol=1e-5, rtol=1e-5)

    def test_epsilon_config_is_identity(self):
        out = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
        got = sd.model_out_to_eps(out, jnp.zeros_like(out),
                                  jnp.float32(500), sd.TINY)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(out))

    def test_per_batch_timesteps_broadcast(self):
        out = jax.random.normal(jax.random.key(0), (2, 4, 4, 4))
        lat = jax.random.normal(jax.random.key(1), (2, 4, 4, 4))
        ts = jnp.array([11.0, 981.0])
        got = sd.model_out_to_eps(out, lat, ts, TINY_V)
        one = sd.model_out_to_eps(out[:1], lat[:1], ts[0], TINY_V)
        np.testing.assert_allclose(np.asarray(got[:1]), np.asarray(one),
                                   atol=1e-6)

    def test_tiny_v_pipeline_end_to_end(self):
        params = sd.init(jax.random.key(0), TINY_V)
        ids = jnp.zeros((1, TINY_V.clip.max_length), jnp.int32)
        lat = sd.initial_latent(jax.random.key(1), 1, TINY_V)
        img = sd.generate(params, ids, ids, lat, 7.5, num_steps=4,
                          cfg=TINY_V)
        assert img.shape == (1, 32, 32, 3)
        assert img.dtype == jnp.uint8


class TestPenultimateConditioning:
    def test_final_norm_on_skip_differs_from_plain_skip(self):
        cfg = clip.CLIPConfig(vocab_size=64, max_length=8, dim=16,
                              num_layers=3, num_heads=2, mlp_dim=32,
                              act="gelu")
        params = clip.init(jax.random.key(0), cfg)
        ids = jnp.arange(8, dtype=jnp.int32)[None]
        plain = clip.apply(params, ids, cfg, skip_final_norm_layers=1)
        normed = clip.apply(params, ids, cfg, skip_final_norm_layers=1,
                            final_norm_on_skip=True)
        w = params["final_layer_norm"]["weight"]
        b = params["final_layer_norm"]["bias"]
        from tinyfusers_tpu import ops
        np.testing.assert_allclose(
            np.asarray(normed), np.asarray(ops.layer_norm(plain, w, b)),
            atol=1e-5, rtol=1e-5)
        assert np.abs(np.asarray(normed) - np.asarray(plain)).max() > 1e-3


class TestSD2StateMap:
    def test_openclip_layout_maps_and_runs(self):
        from tinyfusers_tpu.io import state_map

        cfg = clip.CLIPConfig(vocab_size=64, max_length=8, dim=16,
                              num_layers=2, num_heads=2, mlp_dim=32,
                              act="gelu")
        rng = np.random.default_rng(0)
        state = {
            "cond_stage_model.model.token_embedding.weight":
                rng.standard_normal((64, 16)).astype(np.float32),
            "cond_stage_model.model.positional_embedding":
                rng.standard_normal((8, 16)).astype(np.float32),
            "cond_stage_model.model.ln_final.weight":
                np.ones(16, np.float32),
            "cond_stage_model.model.ln_final.bias":
                np.zeros(16, np.float32),
        }
        for i in range(2):
            lp = f"cond_stage_model.model.transformer.resblocks.{i}"
            state[f"{lp}.attn.in_proj_weight"] = (
                rng.standard_normal((48, 16)).astype(np.float32))
            state[f"{lp}.attn.in_proj_bias"] = (
                rng.standard_normal(48).astype(np.float32))
            state[f"{lp}.attn.out_proj.weight"] = (
                rng.standard_normal((16, 16)).astype(np.float32))
            state[f"{lp}.attn.out_proj.bias"] = (
                rng.standard_normal(16).astype(np.float32))
            for ln in ("ln_1", "ln_2"):
                state[f"{lp}.{ln}.weight"] = np.ones(16, np.float32)
                state[f"{lp}.{ln}.bias"] = np.zeros(16, np.float32)
            state[f"{lp}.mlp.c_fc.weight"] = (
                rng.standard_normal((32, 16)).astype(np.float32))
            state[f"{lp}.mlp.c_fc.bias"] = (
                rng.standard_normal(32).astype(np.float32))
            state[f"{lp}.mlp.c_proj.weight"] = (
                rng.standard_normal((16, 32)).astype(np.float32))
            state[f"{lp}.mlp.c_proj.bias"] = (
                rng.standard_normal(16).astype(np.float32))

        params = state_map.openclip_from_state(
            state, cfg, "cond_stage_model.model")
        params = jax.tree.map(jnp.asarray, params)
        ids = jnp.arange(8, dtype=jnp.int32)[None]
        out = clip.apply(params, ids, cfg, skip_final_norm_layers=1,
                         final_norm_on_skip=True)
        assert out.shape == (1, 8, 16)
        assert bool(jnp.all(jnp.isfinite(out)))
        # q/k/v split of the fused in_proj: first d rows are q (out, in)
        lp = "cond_stage_model.model.transformer.resblocks.0"
        want_q = state[f"{lp}.attn.in_proj_weight"][:16].T
        got_q = np.asarray(
            jax.tree.map(lambda x: x,
                         params["layers"]["self_attn"]["q_proj"]["weight"]))[0]
        np.testing.assert_allclose(got_q, want_q, atol=1e-6)


class TestOpenCLIPTokenizerPadding:
    def test_pad_token_zero(self):
        from tinyfusers_tpu.tokenizer import bpe

        tok = bpe.ClipTokenizer.load_default()
        ids_sd1 = tok.encode("a cat", 10)
        ids_sd2 = tok.encode("a cat", 10, pad_token=0)
        assert len(ids_sd1) == len(ids_sd2) == 10
        assert ids_sd1[0] == ids_sd2[0] == bpe.SOT
        # same content tokens + EOT, different padding
        n = next(i for i, t in enumerate(ids_sd1) if t == bpe.EOT)
        assert ids_sd2[: n + 1] == ids_sd1[: n + 1]
        assert all(t == bpe.EOT for t in ids_sd1[n + 1:])
        assert all(t == 0 for t in ids_sd2[n + 1:])
