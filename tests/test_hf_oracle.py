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


class TestCLIPVisionVsTransformers:
    """The CLIP-score image tower (models/clip_vision.py) against HF
    CLIPVisionModelWithProjection — the exact code that consumes the
    openai/clip-vit-large-patch14 weights the scorer will load."""

    def _hf_vision(self, cfg, seed):
        from transformers import CLIPVisionConfig as HFVC
        from transformers import CLIPVisionModelWithProjection

        hf_cfg = HFVC(
            hidden_size=cfg.dim,
            intermediate_size=cfg.mlp_dim,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            projection_dim=cfg.projection_dim,
            hidden_act=cfg.act,
        )
        torch.manual_seed(seed)
        model = CLIPVisionModelWithProjection(hf_cfg).eval()
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.randn_like(p) * 0.02)
        return model

    def test_image_embeds_match_hf(self):
        from tinyfusers_tpu.models import clip_vision

        cfg = clip_vision.TINY_VISION
        model = self._hf_vision(cfg, seed=11)
        state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = state_map.clip_vision_from_state(state, cfg)

        rng = np.random.default_rng(5)
        pixels = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)
                                     ).astype(np.float32)
        with torch.no_grad():
            ref = model(torch.tensor(
                pixels.transpose(0, 3, 1, 2))).image_embeds.numpy()
        ours = np.asarray(clip_vision.apply(params, jnp.asarray(pixels), cfg))
        np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=0)

    def test_clip_score_pipeline(self):
        """End-to-end scorer sanity on random weights: scores land in
        [-100, 100], identical (image, text) pairs give identical
        scores, and the uint8 preprocessing path runs."""
        from tinyfusers_tpu.eval import clip_score as cs
        from tinyfusers_tpu.models import clip_vision

        vcfg = clip_vision.TINY_VISION
        tcfg = clip_model.CLIPConfig(vocab_size=128, max_length=16, dim=64,
                                     num_layers=2, num_heads=4, mlp_dim=128,
                                     projection_dim=vcfg.projection_dim)
        scorer = {
            "text": clip_model.init(jax.random.key(0), tcfg),
            "text_cfg": tcfg,
            "vision": clip_vision.init(jax.random.key(1), vcfg),
            "vision_cfg": vcfg,
        }
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
        ids = _ids(tcfg, batch=3, seed=2)
        scores = cs.clip_score(scorer, jnp.asarray(imgs), jnp.asarray(ids))
        assert scores.shape == (3,)
        assert np.all(np.abs(scores) <= 100.0 + 1e-4)
        again = cs.clip_score(scorer, jnp.asarray(imgs), jnp.asarray(ids))
        np.testing.assert_array_equal(scores, again)

    def test_scorer_loader_from_hf_checkpoint_file(self, tmp_path):
        """load_scorer_params: a full CLIPModel-layout safetensors file
        (text_model.* + vision_model.* + both projections) -> scorer."""
        from transformers import CLIPConfig as HFCC, CLIPModel

        from tinyfusers_tpu.eval import clip_score as cs
        from tinyfusers_tpu.models import clip_vision

        vcfg = clip_vision.TINY_VISION
        tcfg = clip_model.CLIPConfig(vocab_size=128, max_length=16, dim=48,
                                     num_layers=2, num_heads=4, mlp_dim=96,
                                     projection_dim=vcfg.projection_dim)
        hf_cfg = HFCC(
            projection_dim=vcfg.projection_dim,
            text_config={
                "vocab_size": tcfg.vocab_size, "hidden_size": tcfg.dim,
                "intermediate_size": tcfg.mlp_dim,
                "num_hidden_layers": tcfg.num_layers,
                "num_attention_heads": tcfg.num_heads,
                "max_position_embeddings": tcfg.max_length,
                "hidden_act": tcfg.act,
                "bos_token_id": tcfg.vocab_size - 2,
                "eos_token_id": tcfg.vocab_size - 1,
            },
            vision_config={
                "hidden_size": vcfg.dim, "intermediate_size": vcfg.mlp_dim,
                "num_hidden_layers": vcfg.num_layers,
                "num_attention_heads": vcfg.num_heads,
                "image_size": vcfg.image_size, "patch_size": vcfg.patch_size,
                "hidden_act": vcfg.act,
            },
        )
        torch.manual_seed(7)
        model = CLIPModel(hf_cfg).eval()
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.randn_like(p) * 0.02)
        state = {k: v.detach().numpy() for k, v in model.state_dict().items()
                 if "position_ids" not in k}
        path = tmp_path / "clip_scorer.safetensors"
        safetensors_io.save_state_dict(state, path)

        scorer = cs.load_scorer_params(path, tcfg, vcfg)
        rng = np.random.default_rng(1)
        pixels = rng.standard_normal(
            (2, vcfg.image_size, vcfg.image_size, 3)).astype(np.float32)
        ids = _ids(tcfg, batch=2, seed=9)
        with torch.no_grad():
            ref_i = model.get_image_features(
                torch.tensor(pixels.transpose(0, 3, 1, 2))).numpy()
            ref_t = model.get_text_features(torch.tensor(ids)).numpy()
        ref_i /= np.linalg.norm(ref_i, axis=-1, keepdims=True)
        ref_t /= np.linalg.norm(ref_t, axis=-1, keepdims=True)
        want = 100.0 * np.sum(ref_i * ref_t, axis=-1)
        # bypass preprocess (pixels already "preprocessed" here): score
        # manually through the embed fns
        import jax.numpy as jnp_
        from tinyfusers_tpu.models import clip_vision as cv
        e_img = cv.apply(scorer["vision"], jnp_.asarray(pixels), vcfg)
        e_img = np.array(e_img)
        e_img /= np.linalg.norm(e_img, axis=-1, keepdims=True)
        e_txt = np.asarray(cs.embed_texts(scorer, jnp_.asarray(ids)))
        got = 100.0 * np.sum(e_img * e_txt, axis=-1)
        np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)
