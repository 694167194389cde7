"""T5 encoder differential tests vs HuggingFace T5EncoderModel.

Same strategy as tests/test_hf_oracle.py: the canonical implementation
(the code real t5xxl checkpoints were trained/exported with) is run with
random weights exported through OUR state mapping; activations must
agree at real-model block geometry (relative-position bucketing, RMSNorm,
unscaled attention, gated-GELU FFN)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tinyfusers_tpu.io import state_map  # noqa: E402
from tinyfusers_tpu.models import t5  # noqa: E402

CFG = t5.TINY_T5


def _hf_t5(seed: int):
    from transformers import T5Config, T5EncoderModel

    hf_cfg = T5Config(
        vocab_size=CFG.vocab_size,
        d_model=CFG.dim,
        d_kv=CFG.head_dim,
        d_ff=CFG.ff_dim,
        num_layers=CFG.num_layers,
        num_heads=CFG.num_heads,
        relative_attention_num_buckets=CFG.rel_buckets,
        relative_attention_max_distance=CFG.rel_max_distance,
        feed_forward_proj="gated-gelu",
        is_encoder_decoder=False,
        use_cache=False,
        dropout_rate=0.0,
    )
    torch.manual_seed(seed)
    model = T5EncoderModel(hf_cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return model


def _export(model):
    """HF module -> SD3-checkpoint-layout numpy state dict."""
    return {
        f"{state_map.T5_PREFIX}.{k}": v.detach().numpy()
        for k, v in model.state_dict().items()
    }


class TestT5Oracle:
    @pytest.mark.parametrize("seq", [5, 12])
    def test_matches_hf(self, seq):
        model = _hf_t5(0)
        params = state_map.t5_from_state(_export(model), CFG)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, CFG.vocab_size, (2, seq)).astype(np.int32)

        with torch.no_grad():
            want = model(
                input_ids=torch.from_numpy(ids).long()
            ).last_hidden_state.numpy()
        got = np.asarray(jax.jit(
            lambda p, i: t5.apply(p, i, CFG)
        )(params, jnp.asarray(ids)))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)

    def test_padding_mask_matches_hf(self):
        model = _hf_t5(1)
        params = state_map.t5_from_state(_export(model), CFG)
        rng = np.random.default_rng(1)
        ids = rng.integers(0, CFG.vocab_size, (2, 9)).astype(np.int32)
        mask = np.ones((2, 9), np.int32)
        mask[0, 6:] = 0
        mask[1, 3:] = 0

        with torch.no_grad():
            want = model(
                input_ids=torch.from_numpy(ids).long(),
                attention_mask=torch.from_numpy(mask).long(),
            ).last_hidden_state.numpy()
        got = np.asarray(jax.jit(
            lambda p, i, m: t5.apply(p, i, CFG, mask=m)
        )(params, jnp.asarray(ids), jnp.asarray(mask)))
        # only compare non-padded rows (HF zeroes nothing, but padded
        # positions' outputs are meaningless either way)
        np.testing.assert_allclose(got[0, :6], want[0, :6], atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(got[1, :3], want[1, :3], atol=2e-4, rtol=2e-3)

    def test_state_roundtrip(self):
        params = t5.init(jax.random.key(0), CFG)
        state = state_map.t5_to_state(params, CFG)
        re = state_map.t5_from_state(state, CFG)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            params, re)


class TestT5InSD3:
    def test_tiny_sd3_t5_generate_and_state(self):
        from tinyfusers_tpu.pipeline import sd3

        cfg = sd3.TINY_SD3_T5
        params = sd3.init(jax.random.key(0), cfg)
        state = state_map.sd3_state_from_params(params, cfg)
        assert any(k.startswith("text_encoders.t5xxl.") for k in state)
        re = state_map.sd3_params_from_state(state, cfg)
        assert "t5" in re
        ids = jnp.zeros((1, cfg.clip_l.max_length), jnp.int32)
        ids_t5 = jnp.zeros((1, 8), jnp.int32)
        lat = sd3.initial_latent(jax.random.key(1), 1, cfg)
        img = sd3.generate(re, ids, ids, ids, ids, lat, jnp.float32(4.0),
                           num_steps=2, cfg=cfg, ids_t5=ids_t5,
                           uids_t5=ids_t5)
        assert img.shape == (1, cfg.height, cfg.width, 3)
