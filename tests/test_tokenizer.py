"""Tokenizer tests.

Without the real CLIP merges file (no network in CI), correctness is
checked against a small synthetic merges file exercising the same
algorithm, plus structural invariants (SOT/EOT framing, padding,
truncation, byte fallback id ranges). If a real merges file is present
(TINYFUSERS_BPE_PATH), a golden test against known CLIP encodings runs
too.
"""
import os

import pytest

from tinyfusers_tpu.tokenizer import bpe


def make_tokenizer_with_merges(tmp_path, merges_lines):
    p = tmp_path / "merges.txt"
    p.write_text("#version\n" + "\n".join(merges_lines) + "\n")
    return bpe.ClipTokenizer.from_merges_file(p)


class TestByteMapping:
    def test_bijective_256(self):
        m = bpe.byte_to_unicode()
        assert len(m) == 256
        assert len(set(m.values())) == 256
        assert m[ord("a")] == "a"

    def test_clip_vocab_id_order(self):
        """Base vocab ids follow CLIP's printable-first ordering:
        id('a') = 64 (position of byte 97 in the printable list), and the
        end-of-word variant lives 256 later ('a</w>' = 320)."""
        tok = bpe.ClipTokenizer(None)
        assert tok.encoder["a"] == ord("a") - ord("!")
        assert tok.encoder["a</w>"] == 256 + ord("a") - ord("!")
        assert tok.encode_text("a") == [320]


class TestEncodeStructure:
    def test_framing_and_padding(self):
        tok = bpe.ClipTokenizer(None)
        ids = tok.encode("hi")
        assert len(ids) == 77
        assert ids[0] == bpe.SOT
        assert ids[-1] == bpe.EOT
        body = [i for i in ids[1:] if i != bpe.EOT]
        assert all(0 <= i < 512 for i in body)  # byte-level fallback range

    def test_truncation(self):
        tok = bpe.ClipTokenizer(None)
        ids = tok.encode("word " * 200)
        assert len(ids) == 77

    def test_empty_prompt(self):
        tok = bpe.ClipTokenizer(None)
        ids = tok.encode("")
        assert ids[0] == bpe.SOT and all(i == bpe.EOT for i in ids[1:])

    def test_case_and_whitespace_normalization(self):
        tok = bpe.ClipTokenizer(None)
        assert tok.encode("Hello   World") == tok.encode("hello world")


class TestBPEMerges:
    def test_merge_applies_by_rank(self, tmp_path):
        # merges: ('h','e') then ('he','l') — "hel" -> "hel" + rest
        tok = make_tokenizer_with_merges(tmp_path, ["h e", "he l"])
        ids = tok.encode_text("hel")
        # 'hel' with final-char </w>: symbols h,e,l</w> -> merge h+e -> he, l</w>
        # ('he','l</w>') is not a merge (merge is ('he','l')), so two tokens.
        sym_he = tok.encoder["he"]
        assert ids[0] == sym_he
        assert len(ids) == 2

    def test_end_of_word_distinct(self, tmp_path):
        tok = make_tokenizer_with_merges(tmp_path, ["h e"])
        a = tok.encode_text("he")     # -> h + e</w> (no merge: e</w> != e)
        b = tok.encode_text("hex")    # -> he merged, x</w>
        assert a != b[:1]

    def test_cache_consistency(self, tmp_path):
        tok = make_tokenizer_with_merges(tmp_path, ["a b"])
        first = tok.encode_text("ab ab")
        second = tok.encode_text("ab ab")
        assert first == second


@pytest.mark.skipif(
    not os.environ.get("TINYFUSERS_BPE_PATH"),
    reason="real CLIP merges file not available",
)
class TestGoldenCLIP:
    def test_known_encodings(self):
        tok = bpe.ClipTokenizer.load_default()
        # Golden ids from OpenAI CLIP tokenizer for this prompt.
        ids = tok.encode("a photograph of an astronaut riding a horse")
        assert ids[0] == 49406
        assert ids[1] == 320  # "a"
