"""CLIP BPE tokenizer, from scratch.

Behavioral parity target: OpenAI CLIP's simple_tokenizer (what SD
checkpoints were trained with), which the reference wraps in
tokenizer/clip.py: lowercase + whitespace-normalize, regex word split,
byte->unicode mapping, greedy lowest-rank BPE merges with end-of-word
``</w>`` markers, truncate to 75 tokens, wrap with SOT 49406 and pad
with EOT 49407 to length 77.

Two deliberate differences from the reference:

- word split: the reference (tokenizer/clip.py:24) uses a simplified
  ``[^\\s]+`` word pattern; real CLIP splits letter-runs, single
  numerals, and punctuation-runs separately
  (``[\\p{L}]+|[\\p{N}]|[^\\s\\p{L}\\p{N}]+``). The two disagree on any
  prompt with punctuation attached to a word ("a photo of a dog.") or
  mixed alphanumerics ("8k"), and real checkpoints expect CLIP's ids —
  so this implementation uses the exact OpenAI pattern (via the
  ``regex`` module; differentially tested against
  transformers.CLIPTokenizer in tests/test_tokenizer_oracle.py).
- no network fetch (the reference fetches the vocab from github at
  import, tokenizer/clip.py:6-8). The merges file is located via (in
  order) an explicit path, $TINYFUSERS_BPE_PATH, or vendored assets/
  (populate with ``python -m tinyfusers_tpu.tokenizer.vendor``). If
  none is found, ``load_default(allow_fallback=True)`` falls back to a
  **byte-level** tokenizer (byte symbols occupy ids 0..511, specials
  keep 49406/49407) that is deterministic and in-range but NOT
  CLIP-compatible — fine for smoke/perf runs with random weights,
  wrong for real checkpoints. Pass ``allow_fallback=False`` (the CLI
  does whenever --ckpt is given) to hard-fail instead.
"""
from __future__ import annotations

import gzip
import os
import re
from functools import lru_cache
from pathlib import Path
from typing import Dict, List, Optional, Tuple

SOT = 49406
EOT = 49407
CONTEXT_LENGTH = 77

_ASSET_CANDIDATES = [
    Path(__file__).parent / "assets" / "bpe_simple_vocab_16e6.txt.gz",
    Path(__file__).parent / "assets" / "bpe_simple_vocab_16e6.txt",
    Path(__file__).parent / "assets" / "merges.txt",
]


@lru_cache()
def byte_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP printable-unicode byte mapping: the 188 printable latin
    bytes map to themselves; the rest get shifted into 0x100+.

    NOTE: insertion order matters — CLIP's vocab lists base symbols in
    this dict's order (printable bytes first, then the shifted rest), and
    vocab *ids* are positions in that list. E.g. id('a') = 64, not 97.
    """
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping = {b: chr(b) for b in printable}
    shift = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


_CLIP_PATTERN = (
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
)

try:  # exact OpenAI pattern needs \p classes -> the `regex` module
    import regex as _regex

    _WORD_RE = _regex.compile(_CLIP_PATTERN, _regex.IGNORECASE)
except ImportError:  # pragma: no cover - regex ships with transformers
    # stdlib-re approximation: [^\W\d_]+ ~ \p{L}+ (unicode letters),
    # \d ~ \p{N} (misses non-decimal numerals like '²'),
    # (?:[^\s\w]|_)+ ~ punctuation runs (underscore is \w but not \p{L}).
    _WORD_RE = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[^\W\d_]+|\d|(?:[^\s\w]|_)+",
        re.IGNORECASE,
    )

_SPECIALS = ("<|startoftext|>", "<|endoftext|>")


class ClipTokenizer:
    def __init__(self, merges: Optional[List[Tuple[str, str]]] = None):
        self._b2u = byte_to_unicode()
        self.byte_level_only = merges is None
        merges = merges or []
        # Vocab id layout (must match CLIP): 256 byte symbols, then the
        # same 256 with </w>, then one id per merge, then SOT/EOT. With
        # the real 48894-merge file the specials land at 49406/49407; the
        # byte-level fallback pins them there explicitly so the id space
        # is SD-compatible either way.
        base = list(self._b2u.values())
        vocab = base + [v + "</w>" for v in base]
        for a, b in merges:
            vocab.append(a + b)
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        if self.byte_level_only:
            self.encoder[_SPECIALS[0]] = SOT
            self.encoder[_SPECIALS[1]] = EOT
        else:
            self.encoder[_SPECIALS[0]] = len(vocab)
            self.encoder[_SPECIALS[1]] = len(vocab) + 1
        self.sot_id: int = self.encoder[_SPECIALS[0]]
        self.eot_id: int = self.encoder[_SPECIALS[1]]
        self.ranks: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        # Special literals pass through the merge step untouched (real
        # CLIP pre-seeds its bpe cache the same way).
        self._cache: Dict[str, str] = {s: s for s in _SPECIALS}

    # -- construction -----------------------------------------------------

    @classmethod
    def from_merges_file(cls, path) -> "ClipTokenizer":
        """Accepts OpenAI's bpe_simple_vocab_16e6.txt(.gz) or an HF-style
        merges.txt — both carry a one-line version header then one
        space-separated pair per line; CLIP uses merges[1:48895]."""
        path = Path(path)
        raw = path.read_bytes()
        if path.suffix == ".gz":
            raw = gzip.decompress(raw)
        lines = raw.decode("utf-8").split("\n")
        # First line is a version header; CLIP uses merges[1:48894+1].
        lines = lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(l.split()) for l in lines if l.strip()]
        return cls(merges)  # type: ignore[arg-type]

    @classmethod
    def load_default(cls, allow_fallback: bool = True) -> "ClipTokenizer":
        envp = os.environ.get("TINYFUSERS_BPE_PATH")
        candidates = ([Path(envp)] if envp else []) + _ASSET_CANDIDATES
        for c in candidates:
            if c.is_file():
                return cls.from_merges_file(c)
        msg = (
            "no CLIP BPE merges file found — set TINYFUSERS_BPE_PATH or "
            "vendor it into tokenizer/assets/ (one-time: `python -m "
            "tinyfusers_tpu.tokenizer.vendor /path/to/"
            "bpe_simple_vocab_16e6.txt.gz`)"
        )
        if not allow_fallback:
            raise FileNotFoundError(
                msg + "; refusing the byte-level fallback because real "
                "weights are loaded — its ids are NOT CLIP's and would "
                "produce garbage conditioning"
            )
        print("warning: " + msg + "; using byte-level fallback — NOT "
              "CLIP-compatible (ok for random-weight smoke/perf runs)")
        return cls(None)

    # -- BPE --------------------------------------------------------------

    def _merge_word(self, token: str) -> str:
        """Apply greedy lowest-rank merges to one word; returns space-joined
        subword symbols, last one carrying </w>."""
        if token in self._cache:
            return self._cache[token]
        symbols: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        while len(symbols) > 1:
            pairs = set(zip(symbols[:-1], symbols[1:]))
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 30))
            if best not in self.ranks:
                break
            a, b = best
            merged: List[str] = []
            i = 0
            while i < len(symbols):
                if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            symbols = merged
        out = " ".join(symbols)
        self._cache[token] = out
        return out

    def words(self, text: str) -> List[str]:
        """Cleaned, lowercased, CLIP-regex-split words (pre-byte-mapping).
        Exposed for the native (C++) merge path, which consumes pre-split
        words so the unicode-aware regex lives in exactly one place."""
        return _WORD_RE.findall(_whitespace_clean(text).lower())

    def encode_text(self, text: str) -> List[int]:
        """Raw BPE ids, unpadded."""
        ids: List[int] = []
        for word in self.words(text):
            mapped = "".join(self._b2u[b] for b in word.encode("utf-8"))
            for sym in self._merge_word(mapped).split(" "):
                ids.append(self.encoder[sym])
        return ids

    def encode(self, text: str, length: int = CONTEXT_LENGTH,
               pad_token: Optional[int] = None) -> List[int]:
        """SOT + up to (length-2) tokens + EOT, padded to fixed length.

        SD1.x pads with EOT (reference tokenizer/clip.py:66-75); OpenCLIP
        (SD2.x / SDXL's second encoder) pads with 0: pass pad_token=0."""
        if pad_token is None:
            pad_token = self.eot_id
        ids = self.encode_text(text)[: length - 2]
        return ([self.sot_id] + ids + [self.eot_id]
                + [pad_token] * (length - 2 - len(ids)))
