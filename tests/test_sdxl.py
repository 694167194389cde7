"""SDXL pipeline tests (tiny config; full-size topology checked statically)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyfusers_tpu.models import clip, unet
from tinyfusers_tpu.pipeline import sdxl


class TestSDXLTopology:
    def test_plan_shape(self):
        """SDXL-base: 9 input blocks (conv_in + 2*3 res + 2 down), depths
        (0,2,10), no attention at level 0, middle depth 10."""
        cfg = unet.SDXL_CONFIG
        inp, mid, outp = unet.build_plan(cfg)
        assert len(inp) == 9
        attn_depths = [
            s.depth for b in inp for s in b if isinstance(s, unet.AttnSpec)
        ]
        assert attn_depths == [2, 2, 10, 10]
        assert isinstance(mid[1], unet.AttnSpec) and mid[1].depth == 10
        # output side: 3 levels x 3 blocks
        assert len(outp) == 9
        out_attn = [
            s.depth for b in outp for s in b if isinstance(s, unet.AttnSpec)
        ]
        assert out_attn == [10, 10, 10, 2, 2, 2]

    def test_channels(self):
        cfg = unet.SDXL_CONFIG
        inp, mid, outp = unet.build_plan(cfg)
        res = [s for b in inp for s in b if isinstance(s, unet.ResSpec)]
        assert (res[0].in_ch, res[0].out_ch) == (320, 320)
        assert (res[-1].in_ch, res[-1].out_ch) == (1280, 1280)
        assert mid[0].in_ch == 1280


class TestTinyXL:
    def test_generate(self):
        cfg = sdxl.TINY_XL
        params = sdxl.init(jax.random.key(0), cfg)
        ids_l = jnp.zeros((1, cfg.clip_l.max_length), jnp.int32)
        ids_g = jnp.zeros((1, cfg.clip_g.max_length), jnp.int32)
        lat = sdxl.initial_latent(jax.random.key(1), 1, cfg)
        img = sdxl.generate(
            params, ids_l, ids_g, ids_l, ids_g, lat, jnp.float32(5.0),
            num_steps=2, cfg=cfg,
        )
        assert img.shape == (1, cfg.height, cfg.width, 3)
        assert img.dtype == jnp.uint8

    def test_dual_encoder_context_dims(self):
        cfg = sdxl.TINY_XL
        params = sdxl.init(jax.random.key(0), cfg)
        ids_l = jnp.zeros((2, cfg.clip_l.max_length), jnp.int32)
        ids_g = jnp.zeros((2, cfg.clip_g.max_length), jnp.int32)
        ctx, pooled = sdxl.encode_text(params, ids_l, ids_g, cfg)
        assert ctx.shape == (2, cfg.clip_l.max_length,
                             cfg.clip_l.dim + cfg.clip_g.dim)
        assert pooled.shape == (2, cfg.clip_g.projection_dim)

    def test_penultimate_differs_from_final(self):
        cfg = sdxl.TINY_XL
        params = clip.init(jax.random.key(0), cfg.clip_g)
        ids = jnp.arange(cfg.clip_g.max_length, dtype=jnp.int32)[None] % 100
        final = clip.apply(params, ids, cfg.clip_g)
        penult = clip.apply(params, ids, cfg.clip_g, skip_final_norm_layers=1)
        assert final.shape == penult.shape
        assert not np.allclose(np.asarray(final), np.asarray(penult))

    def test_size_embeddings(self):
        sizes = sdxl.default_sizes(2, sdxl.TINY_XL)
        emb = sdxl.size_embeddings(sizes, 8)
        assert emb.shape == (2, 48)
        adm = sdxl.make_adm_cond(jnp.ones((2, 32)), sizes, sdxl.TINY_XL)
        assert adm.shape == (2, sdxl.TINY_XL.unet.adm_in_channels)


class TestSDXLSamplerSurface:
    """Round-5 parity with pipeline/sd.py: samplers, karras schedule,
    cached CFG, guidance rescale on the SDXL pipeline."""

    def _setup(self):
        cfg = sdxl.TINY_XL
        params = sdxl.init(jax.random.key(0), cfg)
        ids = jnp.zeros((1, cfg.clip_l.max_length), jnp.int32)
        uids = jnp.ones((1, cfg.clip_l.max_length), jnp.int32)
        lat = sdxl.initial_latent(jax.random.key(1), 1, cfg)
        return cfg, params, ids, uids, lat

    @pytest.mark.parametrize("kw", [
        dict(method="euler"),
        dict(method="dpmpp_2m", schedule="karras"),
        dict(method="euler_ancestral"),
        dict(uncond_interval=2),
        dict(cfg_rescale=0.7),
        dict(method="euler", schedule="karras", uncond_interval=2,
             cfg_rescale=0.7),
    ])
    def test_generate_variants(self, kw):
        cfg, params, ids, uids, lat = self._setup()
        key = (jax.random.key(2) if "ancestral" in kw.get("method", "")
               else None)
        img = sdxl.generate(params, ids, ids, uids, uids, lat,
                            jnp.float32(7.5), num_steps=3, cfg=cfg,
                            key=key, **kw)
        assert img.shape == (1, cfg.height, cfg.width, 3)
        assert img.dtype == jnp.uint8
        assert np.asarray(img).std() > 0

    def test_variants_change_output(self):
        cfg, params, ids, uids, lat = self._setup()
        base = sdxl.generate(params, ids, ids, uids, uids, lat,
                             jnp.float32(9.0), num_steps=3, cfg=cfg)
        for kw in (dict(method="euler", schedule="karras"),
                   dict(cfg_rescale=0.7), dict(uncond_interval=2)):
            v = sdxl.generate(params, ids, ids, uids, uids, lat,
                              jnp.float32(9.0), num_steps=3, cfg=cfg, **kw)
            assert not np.array_equal(np.asarray(v), np.asarray(base)), kw
