"""Textual inversion: file loading (A1111 .pt + safetensors), table
extension, placeholder tokenization, end-to-end conditioning effect."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyfusers_tpu.io import textual_inversion as ti
from tinyfusers_tpu.models import clip
from tinyfusers_tpu.pipeline import sd
from tinyfusers_tpu.tokenizer import bpe


def tok():
    return bpe.ClipTokenizer.load_default(allow_fallback=True)


class TestLoad:
    def test_a1111_pt_format(self, tmp_path):
        torch = pytest.importorskip("torch")
        vec = torch.randn(2, 16)
        torch.save({"string_to_param": {"*": vec},
                    "name": "concept", "step": 999},
                   tmp_path / "emb.pt")
        got = ti.load_embedding(tmp_path / "emb.pt")
        np.testing.assert_allclose(got, vec.numpy(), rtol=1e-6)

    def test_safetensors_format(self, tmp_path):
        from tinyfusers_tpu.io import safetensors_io

        vec = np.random.RandomState(0).randn(3, 16).astype(np.float32)
        safetensors_io.save_state_dict(
            {"emb_params": vec}, tmp_path / "emb.safetensors")
        got = ti.load_embedding(tmp_path / "emb.safetensors")
        np.testing.assert_array_equal(got, vec)

    def test_single_vector_promoted_to_2d(self, tmp_path):
        from tinyfusers_tpu.io import safetensors_io

        vec = np.ones(16, np.float32)
        safetensors_io.save_state_dict(
            {"whatever": vec}, tmp_path / "e.safetensors")
        assert ti.load_embedding(tmp_path / "e.safetensors").shape == (1, 16)


class TestExtend:
    def test_extend_and_ids(self):
        cfg = sd.TINY.clip
        params = clip.init(jax.random.key(0), cfg)
        vocab = params["token_embedding"]["weight"].shape[0]
        vecs = np.full((2, cfg.dim), 0.5, np.float32)
        new, ids = ti.extend_clip(params, {"<cat>": vecs})
        assert ids == {"<cat>": [vocab, vocab + 1]}
        table = new["token_embedding"]["weight"]
        assert table.shape[0] == vocab + 2
        np.testing.assert_allclose(np.asarray(table[vocab:]), vecs)

    def test_dim_mismatch_raises(self):
        cfg = sd.TINY.clip
        params = clip.init(jax.random.key(0), cfg)
        with pytest.raises(ValueError):
            ti.extend_clip(params, {"<x>": np.ones((1, cfg.dim + 1))})

    def test_clip_forward_uses_learned_vectors(self):
        """Conditioning must change when the placeholder id is swapped in
        (the learned vector enters the transformer), and pooled readout
        must still find the true EOT (not the larger placeholder id)."""
        cfg = sd.TINY.clip
        params = clip.init(jax.random.key(0), cfg)
        vocab = params["token_embedding"]["weight"].shape[0]
        new, ids = ti.extend_clip(
            params, {"<cat>": np.random.RandomState(0)
                     .randn(1, cfg.dim).astype(np.float32)})
        base_ids = [vocab - 2, 5, 6, vocab - 1] + [vocab - 1] * (
            cfg.max_length - 4)
        ti_ids = list(base_ids)
        ti_ids[2] = ids["<cat>"][0]
        a = clip.apply(new, jnp.array([base_ids], jnp.int32), cfg)
        b = clip.apply(new, jnp.array([ti_ids], jnp.int32), cfg)
        assert not np.allclose(np.asarray(a), np.asarray(b))
        pa = clip.apply_pooled(new, jnp.array([ti_ids], jnp.int32), cfg)
        assert np.all(np.isfinite(np.asarray(pa)))


class TestEncode:
    def test_placeholder_substitution(self):
        t = tok()
        ph = {"<my-cat>": [70001, 70002]}
        ids = ti.encode_with_placeholders(
            t, "a photo of <my-cat> swimming", ph, 77)
        assert ids[0] == t.sot_id and 70001 in ids and 70002 in ids
        i = ids.index(70001)
        assert ids[i + 1] == 70002
        plain = ti.encode_with_placeholders(
            t, "a photo of  swimming", {"<unused>": [70001]}, 77)
        # surrounding text tokenizes the same with the placeholder gone
        # (compare up to the first EOT — padding counts differ by the
        # two placeholder slots)
        cut = lambda seq: seq[: seq.index(t.eot_id) + 1]  # noqa: E731
        assert ([x for x in cut(ids) if x < 70000]
                == [x for x in cut(plain) if x < 70000])

    def test_case_insensitive(self):
        t = tok()
        ph = {"<Cat>": [70001]}
        ids = ti.encode_with_placeholders(t, "a <CAT> photo", ph, 77)
        assert 70001 in ids

    def test_composes_with_prompt_weighting(self):
        """(word:1.3) emphasis and <placeholder> substitution in one
        prompt: the placeholder inherits its fragment's weight and the
        emphasis weights survive."""
        from tinyfusers_tpu.tokenizer import prompt_weights as pw

        t = tok()
        ph = {"<cat>": [70001]}
        ids, w = pw.encode_weighted(
            t, "a photo of (<cat>:1.3) swimming", 77, placeholders=ph)
        assert 70001 in ids
        assert w[ids.index(70001)] == pytest.approx(1.3)
        # plain words keep weight 1.0
        assert w[1] == 1.0

    def test_truncation_and_padding(self):
        t = tok()
        ids = ti.encode_with_placeholders(
            t, "word " * 200, {"<x>": [70001]}, 77)
        assert len(ids) == 77 and ids[-1] == t.eot_id
