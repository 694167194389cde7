"""Differential tokenizer test against transformers.CLIPTokenizer.

The real CLIP merges file cannot ship in this repo (and there is no
network in CI), so algorithmic exactness is proven instead: train a
small CLIP-style BPE (same ``</w>`` end-of-word convention) with a
from-scratch pair-count trainer, write HF-format vocab.json/merges.txt,
and require our from-scratch tokenizer to agree token-for-token with
HuggingFace's CLIPTokenizer loaded from those same files — over prompts
covering punctuation, contractions, digits, unicode, emphasis edge
cases, truncation, and special-token literals. With the real merges
file vendored, the same agreement then holds for real SD checkpoints
by construction (the data file is the only remaining input).

NOTE: ftfy is not installed, so HF's CLIPTokenizer uses its
BasicTokenizer cleanup path; for the non-CJK prompts used here that is
identical to CLIP's whitespace_clean+lower (CJK chars would get extra
spaces under HF-without-ftfy — avoided below, exercised nowhere in SD
prompts anyway).
"""
import json

import pytest

transformers = pytest.importorskip("transformers")

from tinyfusers_tpu.tokenizer import bpe
from tinyfusers_tpu.tokenizer.native import NativeClipTokenizer


# ---------------------------------------------------------------------------
# Mini CLIP-style BPE trainer (pair counting over </w>-terminated words).
# ---------------------------------------------------------------------------

_CORPUS = """
a photo of a cat a photo of a dog a photograph of an astronaut riding
a horse in the style of monet highly detailed masterpiece best quality
the quick brown fox jumps over the lazy dog an oil painting of a
futuristic city at night neon lights cinematic lighting 8k ultra
realistic portrait of a young woman with long red hair soft studio
light a bowl of fruit on a wooden table still life sharp focus wide
angle photo landscape with mountains and a river at sunset golden hour
volumetric light trending on artstation concept art by greg rutkowski
don't stop believing it's a beautiful day we've been here before
""".split()


def _train_merges(words, n_merges):
    b2u = bpe.byte_to_unicode()
    seqs = {}
    for w in words:
        mapped = "".join(b2u[b] for b in w.encode("utf-8"))
        sym = tuple(mapped[:-1]) + (mapped[-1] + "</w>",)
        seqs[sym] = seqs.get(sym, 0) + 1
    merges = []
    for _ in range(n_merges):
        counts = {}
        for sym, c in seqs.items():
            for p in zip(sym[:-1], sym[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        # Deterministic tie-break: count desc, then lexicographic.
        best = max(sorted(counts), key=lambda p: counts[p])
        if counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        new_seqs = {}
        for sym, c in seqs.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + c
        seqs = new_seqs
    return merges


@pytest.fixture(scope="module")
def tok_pair(tmp_path_factory):
    """(ours, HF oracle) built from the same synthetic merges."""
    d = tmp_path_factory.mktemp("clip_tok")
    merges = _train_merges(_CORPUS, 400)

    merges_path = d / "merges.txt"
    merges_path.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")

    ours = bpe.ClipTokenizer.from_merges_file(merges_path)

    # vocab.json in CLIP's construction order = our encoder dict.
    vocab_path = d / "vocab.json"
    vocab_path.write_text(json.dumps(ours.encoder))

    oracle = transformers.CLIPTokenizer(str(vocab_path), str(merges_path))
    return ours, oracle


PROMPTS = [
    "a photo of a cat",
    "a photo of a dog.",                      # trailing punctuation splits
    "A   Photo\tOf \n a CAT",                 # case + whitespace cleanup
    "don't stop, we've only just begun!",     # contractions
    "8k ultra-realistic, 4x upscale, 100%",   # digits split one-by-one
    "masterpiece,best quality,(sharp focus)", # punctuation runs
    "café naïve über",         # latin-1 accents (multi-byte)
    "snake_case_prompt and file.png",         # underscore is \p{..} punct
    "<|endoftext|> literal inside",           # special token literal
    "a 'quoted' word",
    "....",
    "word " * 100,                            # long: exercises truncation
    "",
]


class TestAgainstHFOracle:
    def test_unpadded_ids_match(self, tok_pair):
        ours, oracle = tok_pair
        for prompt in PROMPTS:
            theirs = oracle.convert_tokens_to_ids(oracle.tokenize(prompt))
            assert ours.encode_text(prompt) == theirs, prompt

    def test_padded_encode_matches_oracle_framing(self, tok_pair):
        ours, oracle = tok_pair
        assert ours.sot_id == oracle.bos_token_id
        assert ours.eot_id == oracle.eos_token_id
        for prompt in PROMPTS:
            body = oracle.convert_tokens_to_ids(oracle.tokenize(prompt))[:75]
            want = [oracle.bos_token_id] + body + [oracle.eos_token_id]
            got = ours.encode(prompt)
            assert got[: len(want)] == want, prompt
            assert got[len(want):] == [ours.eot_id] * (77 - len(want))

    def test_native_cpp_matches_python(self, tok_pair, tmp_path):
        ours, _ = tok_pair
        merges_blob = "\n".join(
            f"{a} {b}" for (a, b) in
            sorted(ours.ranks, key=ours.ranks.get)).encode()
        native = NativeClipTokenizer(merges_blob)
        if not native.is_native:
            pytest.skip("libtfnative.so unavailable")
        for prompt in PROMPTS:
            assert native.encode_text(prompt) == ours.encode_text(prompt), prompt
            assert native.encode(prompt) == ours.encode(prompt), prompt


class TestRealCLIPRegression:
    """The word-split must be OpenAI's, not the reference's [^\\s]+
    simplification (reference tokenizer/clip.py:24) — they disagree on
    punctuation-attached words, and real checkpoints expect OpenAI's."""

    def test_punctuation_splits_off(self):
        t = bpe.ClipTokenizer(None)
        assert t.words("a photo of a dog.") == \
            ["a", "photo", "of", "a", "dog", "."]

    def test_digits_split_individually(self):
        t = bpe.ClipTokenizer(None)
        assert t.words("8k 123") == ["8", "k", "1", "2", "3"]

    def test_contractions(self):
        t = bpe.ClipTokenizer(None)
        assert t.words("don't it's") == ["don", "'t", "it", "'s"]

    def test_strict_load_raises_without_merges(self, monkeypatch):
        monkeypatch.delenv("TINYFUSERS_BPE_PATH", raising=False)
        monkeypatch.setattr(bpe, "_ASSET_CANDIDATES", [])
        with pytest.raises(FileNotFoundError):
            bpe.ClipTokenizer.load_default(allow_fallback=False)

    def test_fallback_keeps_sd_special_ids(self):
        t = bpe.ClipTokenizer(None)
        assert t.sot_id == 49406 and t.eot_id == 49407
        assert t.encode_text("<|endoftext|>") == [49407]
