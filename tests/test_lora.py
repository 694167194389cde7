"""LoRA merge tests (kohya key convention, synthetic adapters)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyfusers_tpu.io import lora
from tinyfusers_tpu.models import unet
from tinyfusers_tpu.pipeline import sd


def make_lora_entry(name, in_dim, out_dim, r=4, alpha=2.0, seed=0):
    rng = np.random.default_rng(seed)
    return {
        f"{name}.lora_down.weight": rng.standard_normal((r, in_dim)).astype(np.float32) * 0.1,
        f"{name}.lora_up.weight": rng.standard_normal((out_dim, r)).astype(np.float32) * 0.1,
        f"{name}.alpha": np.float32(alpha),
    }


class TestKohyaParsing:
    def test_down_block_attn(self):
        path = lora.parse_kohya_module(
            "lora_unet_down_blocks_0_attentions_1_transformer_blocks_0_attn1_to_q",
            sd.SD15.unet,
        )
        # input block 2 is the second attention of down group 0
        assert path[:2] == ("input", 2)
        assert path[-1] == "to_q"

    def test_mid_block(self):
        path = lora.parse_kohya_module(
            "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_out_0",
            sd.SD15.unet,
        )
        assert path[0] == "middle"
        assert path[-1] == "to_out"

    def test_up_block_ff(self):
        path = lora.parse_kohya_module(
            "lora_unet_up_blocks_1_attentions_2_transformer_blocks_0_ff_net_0_proj",
            sd.SD15.unet,
        )
        assert path[:2] == ("output", 5)
        assert path[-2:] == ("ff", "proj")

    def test_text_encoder(self):
        path = lora.parse_kohya_module(
            "lora_te_text_model_encoder_layers_3_self_attn_v_proj",
            sd.SD15.unet,
        )
        assert path[:2] == ("__te__", 3)
        assert path[-1] == "v_proj"

    def test_unknown_module_raises(self):
        with pytest.raises(KeyError):
            lora.parse_kohya_module("lora_unet_conv_in", sd.SD15.unet)


class TestMerge:
    def test_unet_delta_applied(self):
        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        # TINY unet: input block 1 has an attention at element 1
        name = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        dim = cfg.unet.model_channels
        state = make_lora_entry(name, dim, dim, r=2, alpha=4.0)
        new, skipped = lora.merge_lora(params, state, scale=0.5, cfg=cfg)
        assert skipped == []
        old_w = np.asarray(params["unet"]["input"][1][1]["blocks"][0]["attn1"]["to_q"]["weight"])
        new_w = np.asarray(new["unet"]["input"][1][1]["blocks"][0]["attn1"]["to_q"]["weight"])
        down = state[f"{name}.lora_down.weight"]
        up = state[f"{name}.lora_up.weight"]
        want = old_w + (up @ down).T * (4.0 / 2) * 0.5
        np.testing.assert_allclose(new_w, want, atol=1e-5)
        # other leaves untouched
        np.testing.assert_array_equal(
            np.asarray(params["unet"]["out_conv"]["weight"]),
            np.asarray(new["unet"]["out_conv"]["weight"]),
        )

    def test_text_encoder_delta_applied(self):
        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        name = "lora_te_text_model_encoder_layers_1_mlp_fc1"
        state = make_lora_entry(name, cfg.clip.dim, cfg.clip.mlp_dim, r=2)
        new, skipped = lora.merge_lora(params, state, cfg=cfg)
        assert skipped == []
        old = np.asarray(params["clip"]["layers"]["mlp"]["fc1"]["weight"])
        got = np.asarray(new["clip"]["layers"]["mlp"]["fc1"]["weight"])
        assert not np.allclose(old[1], got[1])     # layer 1 changed
        np.testing.assert_array_equal(old[0], got[0])  # layer 0 untouched

    def test_unknown_modules_reported(self):
        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        state = make_lora_entry("lora_unet_some_unknown_thing", 8, 8)
        new, skipped = lora.merge_lora(params, state, cfg=cfg)
        assert skipped == ["lora_unet_some_unknown_thing"]

    def test_merged_model_changes_output(self):
        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        name = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn2_to_k"
        state = make_lora_entry(name, cfg.unet.context_dim,
                                cfg.unet.model_channels, r=2, seed=3)
        new, _ = lora.merge_lora(params, state, scale=5.0, cfg=cfg)
        x = jnp.ones((1, 16, 16, 4))
        t = jnp.ones((1,))
        # context must vary across tokens: with identical keys the softmax
        # is uniform and a to_k delta would be invisible
        ctx = jax.random.normal(jax.random.key(7), (1, 8, cfg.unet.context_dim))
        y0 = unet.apply(params["unet"], x, t, ctx, cfg.unet)
        y1 = unet.apply(new["unet"], x, t, ctx, cfg.unet)
        assert not np.allclose(np.asarray(y0), np.asarray(y1))
