"""MMDiT + rectified-flow tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyfusers_tpu.models import mmdit
from tinyfusers_tpu.pipeline import rectified_flow as rf


def make_inputs(cfg, b=1):
    x = jax.random.normal(jax.random.key(1), (b, cfg.input_size, cfg.input_size,
                                              cfg.in_channels))
    t = jnp.full((b,), 0.5)
    ctx = jax.random.normal(jax.random.key(2), (b, cfg.context_len, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim))
    return x, t, ctx, pooled


class TestMMDiT:
    def test_forward_shape(self):
        cfg = mmdit.TINY_MMDIT
        params = mmdit.init(jax.random.key(0), cfg)
        x, t, ctx, pooled = make_inputs(cfg, b=2)
        y = mmdit.apply(params, x, t, ctx, pooled, cfg)
        assert y.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_adaln_zero_at_init(self):
        cfg = mmdit.TINY_MMDIT
        params = mmdit.init(jax.random.key(0), cfg)
        x, t, ctx, pooled = make_inputs(cfg)
        y = mmdit.apply(params, x, t, ctx, pooled, cfg)
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)

    def test_text_tokens_affect_image_stream(self):
        """Joint attention must couple the streams: changing context must
        change image output (with non-trivial weights)."""
        cfg = mmdit.TINY_MMDIT
        params = mmdit.init(jax.random.key(0), cfg)
        # make gates + final proj non-zero so signal flows
        def perturb(p, path_leaf_scale=0.1):
            return jax.tree.map(
                lambda a: a + path_leaf_scale * jax.random.normal(
                    jax.random.key(9), a.shape, a.dtype),
                p,
            )
        params["blocks"] = perturb(params["blocks"])
        params["final"] = perturb(params["final"])
        x, t, ctx, pooled = make_inputs(cfg)
        y1 = mmdit.apply(params, x, t, ctx, pooled, cfg)
        y2 = mmdit.apply(params, x, t, ctx + 1.0, pooled, cfg)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))


class TestRectifiedFlow:
    def test_timestep_schedule(self):
        ts = np.asarray(rf.timesteps(10, shift=3.0))
        assert ts.shape == (11,)
        assert ts[0] == 1.0 and ts[-1] == 0.0
        assert np.all(np.diff(ts) < 0)
        # shift pushes mass toward t=1 (more steps at high noise)
        assert ts[5] > 0.5

    def test_perfect_velocity_recovers_x0(self):
        """v = noise - x0 exactly -> Euler integration lands on x0
        regardless of step count (the field is constant along the path)."""
        x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        noise = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))

        def model_fn(x, t):
            # x = (1-t) x0 + t noise -> noise = x0 + (x - x0)/... direct:
            return noise - x0

        out = rf.sample(model_fn, noise, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-5, rtol=1e-5)

    def test_mmdit_in_flow_loop(self):
        cfg = mmdit.TINY_MMDIT
        params = mmdit.init(jax.random.key(0), cfg)
        _, _, ctx, pooled = make_inputs(cfg)
        noise = jax.random.normal(
            jax.random.key(5), (1, cfg.input_size, cfg.input_size, cfg.in_channels))

        def model_fn(x, t):
            return mmdit.apply(params, x, t, ctx, pooled, cfg)

        out = jax.jit(lambda n: rf.sample(model_fn, n, 4))(noise)
        assert out.shape == noise.shape and bool(jnp.all(jnp.isfinite(out)))


class TestSD3Pipeline:
    def test_tiny_generate(self):
        from tinyfusers_tpu.pipeline import sd3

        cfg = sd3.TINY_SD3
        params = sd3.init(jax.random.key(0), cfg)
        idl = jnp.zeros((1, cfg.clip_l.max_length), jnp.int32)
        idg = jnp.zeros((1, cfg.clip_g.max_length), jnp.int32)
        lat = sd3.initial_latent(jax.random.key(1), 1, cfg)
        img = sd3.generate(params, idl, idg, idl, idg, lat, jnp.float32(5.0),
                           num_steps=2, cfg=cfg)
        assert img.shape == (1, cfg.height, cfg.width, 3)
        assert img.dtype == jnp.uint8

    def test_context_padding_layout(self):
        from tinyfusers_tpu.pipeline import sd3

        cfg = sd3.TINY_SD3
        params = sd3.init(jax.random.key(0), cfg)
        idl = jnp.zeros((2, cfg.clip_l.max_length), jnp.int32)
        idg = jnp.zeros((2, cfg.clip_g.max_length), jnp.int32)
        ctx, pooled = sd3.encode_text(params, idl, idg, cfg)
        joint = cfg.clip_l.dim + cfg.clip_g.dim
        assert ctx.shape == (2, cfg.clip_l.max_length, cfg.mmdit.context_dim)
        # the T5 span must be zeros
        assert float(jnp.abs(ctx[..., joint:]).max()) == 0.0
        assert pooled.shape == (2, cfg.clip_l.projection_dim + cfg.clip_g.projection_dim)


class TestHeunFlow:
    def test_perfect_velocity_recovers_x0(self):
        x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        noise = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
        out = rf.sample(lambda x, t: noise - x0, noise, 8, method="heun")
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-5, rtol=1e-5)

    def test_heun_beats_euler_on_curved_field(self):
        """On a t-dependent velocity field the 2nd-order method must
        integrate more accurately than Euler at the same step count.
        Field: dx/dt = 2t * c (exact: x(0) = x(1) - c). Shift=1 keeps
        the ladder uniform so local truncation orders are comparable."""
        c = jax.random.normal(jax.random.key(0), (1, 4, 4, 2))
        x1 = jax.random.normal(jax.random.key(1), (1, 4, 4, 2))
        exact = x1 - c

        def vf(x, t):
            return 2.0 * t[0] * c

        e = rf.sample(vf, x1, 6, shift=1.0, method="euler")
        h = rf.sample(vf, x1, 6, shift=1.0, method="heun")
        err_e = float(jnp.abs(e - exact).max())
        err_h = float(jnp.abs(h - exact).max())
        assert err_h < err_e / 5, (err_e, err_h)

    def test_unknown_method_rejected(self):
        import pytest
        with pytest.raises(ValueError):
            rf.sample(lambda x, t: x, jnp.zeros((1, 4, 4, 2)), 4,
                      method="rk4")

    def test_sd3_generate_heun(self):
        from tinyfusers_tpu.pipeline import sd3

        cfg = sd3.TINY_SD3
        params = sd3.init(jax.random.key(0), cfg)
        # adaLN-zero init makes the MMDiT velocity identically zero — a
        # constant field on which euler and heun coincide exactly. Kick
        # every leaf so the field is t-dependent and the orders separate.
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.key(7), len(leaves))
        params = jax.tree.unflatten(treedef, [
            l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)])
        idl = jnp.zeros((1, cfg.clip_l.max_length), jnp.int32)
        idg = jnp.zeros((1, cfg.clip_g.max_length), jnp.int32)
        lat = sd3.initial_latent(jax.random.key(1), 1, cfg)
        img_h = sd3.generate(params, idl, idg, idl, idg, lat,
                             jnp.float32(5.0), num_steps=3, cfg=cfg,
                             method="heun")
        img_e = sd3.generate(params, idl, idg, idl, idg, lat,
                             jnp.float32(5.0), num_steps=3, cfg=cfg)
        assert img_h.shape == img_e.shape and img_h.dtype == jnp.uint8
        assert not np.array_equal(np.asarray(img_h), np.asarray(img_e))
