"""Prompt-weighting syntax tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyfusers_tpu.pipeline import sd
from tinyfusers_tpu.tokenizer import bpe, prompt_weights as pw


class TestParse:
    def test_plain(self):
        assert pw.parse("a cat") == [("a cat", 1.0)]

    def test_emphasis(self):
        got = pw.parse("a (cat) dog")
        assert got == [("a ", 1.0), ("cat", 1.1), (" dog", 1.0)]

    def test_deemphasis(self):
        got = pw.parse("a [cat]")
        assert got[1][0] == "cat"
        assert abs(got[1][1] - 1 / 1.1) < 1e-9

    def test_explicit_weight(self):
        got = pw.parse("a (cat:1.5) dog")
        assert ("cat", 1.5) in got

    def test_nesting_multiplies(self):
        got = pw.parse("((cat))")
        assert got == [("cat", pytest.approx(1.21))]

    def test_escaped_parens(self):
        got = pw.parse(r"a \(literal\)")
        assert got == [("a (literal)", 1.0)]

    def test_explicit_weight_nested(self):
        got = pw.parse("(a (b:2.0))")
        weights = dict(got)
        assert weights["b"] == pytest.approx(2.2)
        assert weights["a "] == pytest.approx(1.1)


class TestEncodeWeighted:
    def test_alignment_and_padding(self):
        tok = bpe.ClipTokenizer(None)
        ids, w = pw.encode_weighted(tok, "hi (you:2.0)", length=16)
        assert len(ids) == len(w) == 16
        assert ids[0] == bpe.SOT and w[0] == 1.0
        # the weighted fragment's token span carries 2.0
        n_hi = len(tok.encode_text("hi "))
        n_you = len(tok.encode_text("you"))
        assert all(x == 1.0 for x in w[1:1 + n_hi])
        assert all(x == 2.0 for x in w[1 + n_hi:1 + n_hi + n_you])

    def test_truncation(self):
        tok = bpe.ClipTokenizer(None)
        ids, w = pw.encode_weighted(tok, "(word:1.3) " * 100, length=16)
        assert len(ids) == len(w) == 16


class TestApply:
    def test_weight_one_is_identity(self):
        ctx = jax.random.normal(jax.random.key(0), (1, 8, 16))
        out = sd.apply_prompt_weights(ctx, jnp.ones((1, 8)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ctx), atol=1e-6)

    def test_weights_scale_about_mean(self):
        ctx = jax.random.normal(jax.random.key(0), (1, 8, 16))
        w = jnp.ones((1, 8)).at[0, 3].set(2.0)
        out = sd.apply_prompt_weights(ctx, w)
        mean = np.asarray(ctx).mean(axis=1, keepdims=True)
        want3 = mean[0] + (np.asarray(ctx)[0, 3] - mean[0]) * 2.0
        np.testing.assert_allclose(np.asarray(out)[0, 3], want3[0], atol=1e-5)
        # unweighted tokens unchanged
        np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(ctx)[0, 0],
                                   atol=1e-6)
