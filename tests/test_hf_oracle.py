"""Differential tests against HuggingFace `transformers` model code.

No real SD checkpoints or CLIP vocab assets exist in this (zero-egress)
environment, so end-to-end real-weight validation is impossible here.
These tests are the strongest hermetic substitute: the *canonical
implementations* (HF CLIPTextModel & friends — the exact code that
produced/consumes real SD checkpoints) are instantiated with random
weights, those weights are exported through OUR state mapping, and the
two implementations must agree activation-for-activation at the real
model geometry. If these pass, loading a real checkpoint reduces to the
file-format path (covered by tests/test_io.py) plus the vendored BPE
file (tokenizer/vendor.py; oracle-tested in tests/test_tokenizer_oracle.py).

Covers reference capability: vae/encoder.py:36-81 CLIPTextTransformer
correctness against real SD v1 conditioning, extended to SD2.x / SDXL /
SD3 towers.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tinyfusers_tpu.io import safetensors_io, state_map
from tinyfusers_tpu.models import clip as clip_model

SD_PREFIX = "cond_stage_model.transformer.text_model"


def _hf_clip(cfg: clip_model.CLIPConfig, seed: int, with_projection: bool):
    from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection

    hf_cfg = CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.dim,
        intermediate_size=cfg.mlp_dim,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_length,
        hidden_act=cfg.act,
        projection_dim=cfg.projection_dim or cfg.dim,
        bos_token_id=cfg.vocab_size - 2,
        eos_token_id=cfg.vocab_size - 1,
    )
    torch.manual_seed(seed)
    cls = CLIPTextModelWithProjection if with_projection else CLIPTextModel
    model = cls(hf_cfg).eval()
    # Perturb from default init so layers are not near-identity.
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return model


def _ids(cfg: clip_model.CLIPConfig, batch: int, seed: int) -> np.ndarray:
    """CLIP-style id rows: SOT, tokens, EOT, then EOT padding (so both
    pooling conventions — argmax(ids) and first-EOS — agree)."""
    rng = np.random.default_rng(seed)
    sot, eot = cfg.vocab_size - 2, cfg.vocab_size - 1
    out = np.full((batch, cfg.max_length), eot, np.int64)
    for b in range(batch):
        n = int(rng.integers(3, cfg.max_length - 2))
        out[b, 0] = sot
        out[b, 1 : 1 + n] = rng.integers(1, sot - 1, size=n)
        out[b, 1 + n :] = eot
    return out


def _params_from_hf(model, cfg):
    state = {
        f"cond_stage_model.transformer.{k}": v.detach().numpy()
        for k, v in model.state_dict().items()
    }
    return state_map.clip_from_state(state, cfg)


class TestCLIPvsTransformers:
    def _check_hidden(self, cfg, seed, atol):
        model = _hf_clip(cfg, seed, with_projection=False)
        params = _params_from_hf(model, cfg)
        ids = _ids(cfg, batch=2, seed=seed)

        with torch.no_grad():
            hf = model(torch.tensor(ids), output_hidden_states=True)
        ours = np.asarray(clip_model.apply(params, jnp.asarray(ids), cfg))
        ref = hf.last_hidden_state.numpy()
        np.testing.assert_allclose(ours, ref, atol=atol, rtol=0)

        # clip-skip: hidden state entering the last layer, no final norm
        ours_pen = np.asarray(
            clip_model.apply(params, jnp.asarray(ids), cfg,
                             skip_final_norm_layers=1))
        np.testing.assert_allclose(
            ours_pen, hf.hidden_states[-2].numpy(), atol=atol, rtol=0)

        # SD2.x-style: final layer norm applied to the penultimate state
        ours_pen_ln = np.asarray(
            clip_model.apply(params, jnp.asarray(ids), cfg,
                             skip_final_norm_layers=1,
                             final_norm_on_skip=True))
        pen_ln = model.text_model.final_layer_norm(
            hf.hidden_states[-2]).detach().numpy()
        np.testing.assert_allclose(ours_pen_ln, pen_ln, atol=atol, rtol=0)

    def test_clip_vit_l_sd1x_geometry(self):
        """Full CLIP ViT-L/14 text geometry (SD1.x conditioning encoder):
        49408 vocab, 77 ctx, 768 width, 12 layers, quick-gelu."""
        self._check_hidden(clip_model.CLIPConfig(), seed=0, atol=2e-4)

    def test_openclip_h_sd2x_geometry(self):
        """Full OpenCLIP ViT-H/14 text geometry (SD2.x conditioning):
        1024 width, 24 layers, exact-erf gelu."""
        self._check_hidden(clip_model.OPENCLIP_H_CONFIG, seed=1, atol=4e-4)

    def test_pooled_projection_matches_hf(self):
        """apply_pooled (EOT-position pooling + text_projection) against
        CLIPTextModelWithProjection.text_embeds."""
        cfg = clip_model.CLIPConfig(
            vocab_size=512, max_length=16, dim=64, num_layers=3,
            num_heads=4, mlp_dim=128, act="gelu", projection_dim=48)
        model = _hf_clip(cfg, seed=2, with_projection=True)
        params = _params_from_hf(model, cfg)
        assert "text_projection" in params
        ids = _ids(cfg, batch=3, seed=2)
        with torch.no_grad():
            ref = model(torch.tensor(ids)).text_embeds.numpy()
        ours = np.asarray(
            clip_model.apply_pooled(params, jnp.asarray(ids), cfg))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=0)

    def test_hf_weights_through_disk_roundtrip(self, tmp_path):
        """The full real-checkpoint path for the text encoder: HF weights
        -> SD-layout safetensors on disk -> our loader -> our model ==
        the HF forward. (What loading sd-v1-x's cond_stage_model does,
        minus the unobtainable weights themselves.)"""
        cfg = clip_model.CLIPConfig(
            vocab_size=512, max_length=16, dim=64, num_layers=3,
            num_heads=4, mlp_dim=128)
        model = _hf_clip(cfg, seed=3, with_projection=False)
        state = {
            f"cond_stage_model.transformer.{k}": v.detach().numpy()
            for k, v in model.state_dict().items()
        }
        p = tmp_path / "clip_only.safetensors"
        safetensors_io.save_state_dict(state, p)
        loaded = safetensors_io.load_state_dict(p)
        params = state_map.clip_from_state(loaded, cfg)
        ids = _ids(cfg, batch=2, seed=3)
        with torch.no_grad():
            ref = model(torch.tensor(ids)).last_hidden_state.numpy()
        ours = np.asarray(clip_model.apply(params, jnp.asarray(ids), cfg))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=0)

    def test_openclip_orig_layout_matches_hf(self):
        """The SDXL bigG path: original-OpenCLIP-layout state (fused
        in_proj qkv, resblocks.*) -> openclip_from_state -> our model
        must equal the HF forward of the same weights. Uses our
        openclip_to_state exporter as the HF->orig-layout bridge (itself
        round-trip-pinned in test_io)."""
        cfg = clip_model.CLIPConfig(
            vocab_size=512, max_length=16, dim=64, num_layers=3,
            num_heads=4, mlp_dim=128, act="gelu", projection_dim=48)
        model = _hf_clip(cfg, seed=4, with_projection=True)
        hf_params = _params_from_hf(model, cfg)
        orig_layout = state_map.openclip_to_state(hf_params, cfg, "m")
        params = state_map.openclip_from_state(orig_layout, cfg, "m")
        ids = _ids(cfg, batch=2, seed=4)
        with torch.no_grad():
            out = model(torch.tensor(ids))
        ours_h = np.asarray(clip_model.apply(params, jnp.asarray(ids), cfg))
        np.testing.assert_allclose(
            ours_h, out.last_hidden_state.numpy(), atol=2e-5, rtol=0)
        ours_p = np.asarray(
            clip_model.apply_pooled(params, jnp.asarray(ids), cfg))
        np.testing.assert_allclose(
            ours_p, out.text_embeds.numpy(), atol=2e-5, rtol=0)
