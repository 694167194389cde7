"""Differential tests for the ops layer vs torch CPU oracles.

Same strategy as the reference's tests (torch as primary oracle,
SURVEY.md §4) but hermetic, seed-fixed, and far tighter tolerances —
fp32 on CPU should agree to ~1e-5, not the reference's 1e-2.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tinyfusers_tpu import ops

RNG = np.random.default_rng(0)


def rand(*shape, scale=1.0):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


def assert_close(got, want, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol, rtol=rtol)


class TestActivations:
    def test_silu(self):
        x = rand(4, 33)
        assert_close(ops.silu(jnp.array(x)), F.silu(torch.tensor(x)).numpy())

    def test_gelu_tanh(self):
        x = rand(4, 33)
        assert_close(
            ops.gelu_tanh(jnp.array(x)),
            F.gelu(torch.tensor(x), approximate="tanh").numpy(),
            atol=1e-4,
        )

    def test_quick_gelu(self):
        x = rand(4, 33)
        want = torch.tensor(x) * torch.sigmoid(1.702 * torch.tensor(x))
        assert_close(ops.quick_gelu(jnp.array(x)), want.numpy())


class TestLinear:
    @pytest.mark.parametrize("bias", [True, False])
    def test_matches_torch(self, bias):
        x, w = rand(3, 77, 64), rand(48, 64)  # torch weight is (out, in)
        b = rand(48) if bias else None
        want = F.linear(
            torch.tensor(x), torch.tensor(w), torch.tensor(b) if bias else None
        ).numpy()
        got = ops.linear(
            jnp.array(x), jnp.array(w.T), jnp.array(b) if bias else None
        )
        assert_close(got, want, atol=1e-4, rtol=1e-4)

    def test_quantized_close_to_dense(self):
        x, w = rand(5, 256), rand(256, 128)
        qw = ops.quantize(jnp.array(w), jnp.int8, axis=-1)
        dense = ops.linear(jnp.array(x), jnp.array(w))
        quant = ops.linear(jnp.array(x), qw)
        # int8 per-channel weight-only: ~1% relative error bar.
        err = np.abs(np.asarray(quant) - np.asarray(dense)).max()
        ref = np.abs(np.asarray(dense)).max()
        assert err / ref < 0.02

    def test_quantize_roundtrip_exact_for_grid_values(self):
        w = jnp.array([[0.0, 64.0], [-127.0, 127.0]], dtype=jnp.float32)
        qw = ops.quantize(w, jnp.int8, axis=-1)
        assert_close(qw.dequantize(), w, atol=1e-5)


class TestInt4:
    def test_dequant_error_bounded_by_half_step(self):
        w = rand(256, 96)
        qw = ops.quantize_int4(jnp.array(w), axis=0, group_size=64)
        assert qw.packed.dtype == jnp.uint8
        assert qw.packed.shape == (128, 96)
        assert qw.scales.shape == (4, 96)
        dq = np.asarray(qw.dequantize())
        # per-group scale: |w - dq| <= scale/2 elementwise (clip range
        # covers absmax since scale = absmax/7 and values reach +-7)
        step = np.repeat(np.asarray(qw.scales), 64, axis=0)
        assert (np.abs(w - dq) <= step / 2 + 1e-7).all()

    def test_roundtrip_exact_for_grid_values(self):
        w = jnp.array([[-7.0, 7.0, 1.0, -3.0] * 4], jnp.float32).reshape(8, 2)
        qw = ops.quantize_int4(w, axis=0, group_size=8)
        assert_close(qw.dequantize(), w, atol=1e-6)

    def test_linear_close_to_dense(self):
        x, w = rand(5, 256), rand(256, 128)
        qw = ops.quantize_int4(jnp.array(w), axis=0, group_size=64)
        dense = np.asarray(ops.linear(jnp.array(x), jnp.array(w)))
        quant = np.asarray(ops.linear(jnp.array(x), qw))
        # int4 on iid gaussian weights (worst case — no structure):
        # quantization noise accumulates with sqrt(K), same as the signal,
        # so judge by relative RMS, not elementwise max.
        # theory: noise std per weight = step/sqrt(12), step = absmax/7,
        # absmax(64 iid gaussians) ~ 2.4 sigma -> rel rms ~ 0.10
        rms = np.sqrt(((quant - dense) ** 2).mean())
        assert rms / np.sqrt((dense ** 2).mean()) < 0.13
        # and the result must equal matmul against the dequantized weight
        manual = x @ np.asarray(qw.dequantize())
        assert_close(quant, manual, atol=1e-3, rtol=1e-3)

    def test_conv_close_to_dense(self):
        x, w = rand(1, 8, 8, 32), rand(3, 3, 32, 16)
        qw = ops.quantize_int4(jnp.array(w), axis=2, group_size=16)
        dense = np.asarray(ops.conv2d(jnp.array(x), jnp.array(w), padding=1))
        quant = np.asarray(ops.conv2d(jnp.array(x), qw, padding=1))
        rms = np.sqrt(((quant - dense) ** 2).mean())
        assert rms / np.sqrt((dense ** 2).mean()) < 0.11  # theory ~0.075 at g=16
        manual = np.asarray(
            ops.conv2d(jnp.array(x), qw.dequantize(jnp.float32), padding=1))
        assert_close(quant, manual, atol=1e-3, rtol=1e-3)

    def test_group_size_clipped_to_axis(self):
        w = rand(4, 16)  # axis len 4 < default group 64
        qw = ops.quantize_int4(jnp.array(w), axis=0)
        assert qw.group_size == 4
        assert qw.scales.shape == (1, 16)

    def test_memory_halved_vs_int8(self):
        w = jnp.array(rand(256, 128))
        q8 = ops.quantize(w, jnp.int8, axis=-1)
        q4 = ops.quantize_int4(w, axis=0, group_size=64)
        assert q4.packed.size == q8.values.size // 2


class TestNorms:
    @pytest.mark.parametrize("dim", [768, 1280])
    def test_layer_norm(self, dim):
        x, w, b = rand(2, 77, dim), rand(dim), rand(dim)
        want = F.layer_norm(
            torch.tensor(x), (dim,), torch.tensor(w), torch.tensor(b)
        ).numpy()
        got = ops.layer_norm(jnp.array(x), jnp.array(w), jnp.array(b))
        assert_close(got, want, atol=1e-5, rtol=1e-4)

    def test_layer_norm_fast_accum_close(self):
        """bf16 normalize pass under fast-accum stays within bf16 ulp of
        the fp32-elementwise default (stats are fp32 either way)."""
        from tinyfusers_tpu.ops import policy

        x = jnp.array(rand(2, 77, 768), jnp.bfloat16)
        w, b = jnp.array(rand(768)), jnp.array(rand(768))
        base = np.asarray(ops.layer_norm(x, w, b), dtype=np.float32)
        policy.set_fast_accum(True)
        try:
            fast = np.asarray(ops.layer_norm(x, w, b), dtype=np.float32)
        finally:
            policy.set_fast_accum(False)
        assert_close(fast, base, atol=0.125, rtol=0.05)

    @pytest.mark.parametrize("c,groups", [(320, 32), (64, 32), (512, 32)])
    def test_group_norm(self, c, groups):
        # torch is NCHW; ours is NHWC.
        x_nchw = rand(2, c, 6, 5)
        w, b = rand(c), rand(c)
        want = F.group_norm(
            torch.tensor(x_nchw), groups, torch.tensor(w), torch.tensor(b)
        ).numpy()
        got = ops.group_norm(
            jnp.array(x_nchw.transpose(0, 2, 3, 1)), groups, jnp.array(w), jnp.array(b)
        )
        assert_close(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4, rtol=1e-3)


class TestConv2d:
    def test_bf16_grad_matches_f32(self):
        """bf16 conv must be differentiable (custom_vjp works around
        JAX's mixed-dtype conv-transpose rejection with an f32
        preferred_element_type) and track the f32 gradient."""
        import jax
        import jax.numpy as jnp
        from tinyfusers_tpu import ops

        x32 = jnp.asarray(rand(2, 6, 6, 8), jnp.float32)
        w32 = jnp.asarray(rand(3, 3, 8, 4, scale=0.2), jnp.float32)

        def loss(x, w):
            y = ops.conv2d(x, w, stride=2, padding=(0, 1, 0, 1))
            return jnp.sum(y.astype(jnp.float32) ** 2)

        gx32, gw32 = jax.grad(loss, argnums=(0, 1))(x32, w32)
        gx16, gw16 = jax.grad(loss, argnums=(0, 1))(
            x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16))
        assert gx16.dtype == jnp.bfloat16 and gw16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(gx16, np.float32), np.asarray(gx32),
            rtol=0.1, atol=0.1)
        np.testing.assert_allclose(
            np.asarray(gw16, np.float32), np.asarray(gw32),
            rtol=0.1, atol=0.5)

    @pytest.mark.parametrize(
        "cin,cout,k,stride,padding",
        [
            (3, 16, 3, 1, 1),
            (16, 16, 3, 2, 1),
            (8, 4, 1, 1, 0),
        ],
    )
    def test_matches_torch(self, cin, cout, k, stride, padding):
        x_nchw = rand(2, cin, 9, 8)
        w_oihw = rand(cout, cin, k, k, scale=0.2)
        b = rand(cout)
        want = F.conv2d(
            torch.tensor(x_nchw), torch.tensor(w_oihw), torch.tensor(b),
            stride=stride, padding=padding,
        ).numpy()
        got = ops.conv2d(
            jnp.array(x_nchw.transpose(0, 2, 3, 1)),
            jnp.array(w_oihw.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            jnp.array(b),
            stride=stride, padding=padding,
        )
        assert_close(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4, rtol=1e-3)

    def test_asymmetric_padding(self):
        """VAE encoder downsample: pad [0,1,0,1] stride 2 (SURVEY §2.3)."""
        x_nchw = rand(1, 4, 8, 8)
        w_oihw = rand(4, 4, 3, 3, scale=0.2)
        want = F.conv2d(
            F.pad(torch.tensor(x_nchw), (0, 1, 0, 1)),  # torch pad: (w_l, w_r, h_t, h_b)
            torch.tensor(w_oihw), stride=2,
        ).numpy()
        got = ops.conv2d(
            jnp.array(x_nchw.transpose(0, 2, 3, 1)),
            jnp.array(w_oihw.transpose(2, 3, 1, 0)),
            stride=2, padding=(0, 1, 0, 1),
        )
        assert_close(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4, rtol=1e-3)

    def test_upsample_nearest_2x(self):
        x_nchw = rand(1, 3, 4, 4)
        want = F.interpolate(torch.tensor(x_nchw), scale_factor=2, mode="nearest").numpy()
        got = ops.upsample_nearest_2x(jnp.array(x_nchw.transpose(0, 2, 3, 1)))
        assert_close(np.asarray(got).transpose(0, 3, 1, 2), want)

    def test_gemm9_path_matches_conv_emitter_and_torch(self):
        """Channel-heavy stride-1 3x3 convs dispatch to the
        9-shifted-GEMM decomposition (ops/conv.py _gemm9_eligible);
        it must agree with the conv emitter, torch, and support grads."""
        import jax

        from tinyfusers_tpu.ops import policy
        from tinyfusers_tpu.ops.conv import _gemm9_eligible

        c = 256  # minimum eligible channel count
        x_nchw = rand(1, c, 6, 5)
        w_oihw = rand(c, c, 3, 3, scale=0.05)
        b = rand(c)
        x = jnp.array(x_nchw.transpose(0, 2, 3, 1))
        w = jnp.array(w_oihw.transpose(2, 3, 1, 0))
        assert _gemm9_eligible(x, w, (1, 1), ((1, 1), (1, 1)), (1, 1), 1)
        # small-channel / spatial-heavy / strided shapes stay on the emitter
        assert not _gemm9_eligible(x, w[:, :, :, :64], (1, 1), ((1, 1), (1, 1)), (1, 1), 1)
        assert not _gemm9_eligible(x, w, (2, 2), ((1, 1), (1, 1)), (1, 1), 1)
        assert not _gemm9_eligible(
            jnp.zeros((1, 256, 256, c), x.dtype), w, (1, 1), ((1, 1), (1, 1)), (1, 1), 1)

        want = F.conv2d(
            torch.tensor(x_nchw), torch.tensor(w_oihw), torch.tensor(b), padding=1
        ).numpy()
        prior = policy.conv_gemm()
        policy.set_conv_gemm(True)  # pin both paths regardless of env
        try:
            got9 = ops.conv2d(x, w, jnp.array(b), padding=1)
            policy.set_conv_gemm(False)
            got_emitter = ops.conv2d(x, w, jnp.array(b), padding=1)
        finally:
            policy.set_conv_gemm(prior)
        assert_close(np.asarray(got9).transpose(0, 3, 1, 2), want, atol=1e-3, rtol=1e-3)
        assert_close(np.asarray(got9), np.asarray(got_emitter), atol=1e-4, rtol=1e-4)

        # grad flows through the custom_vjp regardless of forward impl
        g = jax.grad(lambda xx: jnp.sum(ops.conv2d(xx, w, padding=1) ** 2))(x)
        assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))


class TestEmbedding:
    def test_matches_torch(self):
        w = rand(100, 16)
        ids = RNG.integers(0, 100, size=(2, 7))
        want = F.embedding(torch.tensor(ids), torch.tensor(w)).numpy()
        got = ops.embedding(jnp.array(ids), jnp.array(w))
        assert_close(got, want)


class TestSDPA:
    @pytest.mark.parametrize("sq,sk", [(77, 77), (256, 77), (130, 130)])
    def test_matches_torch(self, sq, sk):
        q, k, v = rand(2, 4, sq, 32), rand(2, 4, sk, 32), rand(2, 4, sk, 32)
        want = F.scaled_dot_product_attention(
            torch.tensor(q), torch.tensor(k), torch.tensor(v)
        ).numpy()
        got = ops.sdpa_xla(jnp.array(q), jnp.array(k), jnp.array(v))
        assert_close(got, want, atol=1e-4, rtol=1e-3)

    def test_additive_mask(self):
        """CLIP-style causal mask: additive -inf upper triangle."""
        q = rand(1, 12, 77, 64)
        mask = np.triu(np.full((1, 1, 77, 77), -np.inf, np.float32), k=1)
        mask[np.isneginf(mask)] = -1e9  # torch SDPA dislikes full -inf rows? keep finite
        want = F.scaled_dot_product_attention(
            torch.tensor(q), torch.tensor(q), torch.tensor(q),
            attn_mask=torch.tensor(mask),
        ).numpy()
        got = ops.sdpa_xla(jnp.array(q), jnp.array(q), jnp.array(q), jnp.array(mask))
        assert_close(got, want, atol=1e-4, rtol=1e-3)

    def test_boolean_mask(self):
        q = rand(1, 2, 16, 8)
        keep = np.tril(np.ones((16, 16), bool))
        want = F.scaled_dot_product_attention(
            torch.tensor(q), torch.tensor(q), torch.tensor(q),
            attn_mask=torch.tensor(keep),
        ).numpy()
        got = ops.sdpa_xla(jnp.array(q), jnp.array(q), jnp.array(q), jnp.array(keep))
        assert_close(got, want, atol=1e-4, rtol=1e-3)


class TestGroupedConv:
    """groups>1 conv vs torch (reference depthwise kernel capability,
    native/cuda/conv2d.cu:4-60 -> ops/conv.py feature_group_count)."""

    @pytest.mark.parametrize("groups,cin,cout", [(2, 8, 12), (4, 8, 8)])
    def test_grouped_matches_torch(self, groups, cin, cout):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 9, 9, cin)).astype(np.float32)
        w = rng.standard_normal((3, 3, cin // groups, cout)).astype(np.float32)
        b = rng.standard_normal((cout,)).astype(np.float32)

        got = np.asarray(ops.conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            padding=1, groups=groups))
        with torch.no_grad():
            want = torch.nn.functional.conv2d(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(w).permute(3, 2, 0, 1),
                torch.from_numpy(b), padding=1, groups=groups,
            ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    def test_depthwise_matches_torch(self):
        """groups == C_in == C_out: the reference's depthwise kernel
        (conv2d.cu), incl. stride and dilation."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        c = 6
        x = rng.standard_normal((1, 12, 12, c)).astype(np.float32)
        w = rng.standard_normal((3, 3, 1, c)).astype(np.float32)

        got = np.asarray(ops.conv2d(
            jnp.asarray(x), jnp.asarray(w), None,
            stride=2, padding=2, dilation=2, groups=c))
        with torch.no_grad():
            want = torch.nn.functional.conv2d(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(w).permute(3, 2, 0, 1),
                None, stride=2, padding=2, dilation=2, groups=c,
            ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
