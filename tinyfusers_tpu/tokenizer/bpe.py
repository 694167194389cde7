"""CLIP BPE tokenizer, from scratch.

Behavioral parity target: reference tokenizer/clip.py (itself OpenAI
CLIP's tokenizer): lowercase + whitespace-normalize, regex word split,
byte->unicode mapping, greedy lowest-rank BPE merges with end-of-word
``</w>`` markers, truncate to 75 tokens, wrap with SOT 49406 and pad with
EOT 49407 to length 77.

Differences from the reference:
- no network fetch (reference fetches the vocab from github at import,
  tokenizer/clip.py:6-8). The merges file is located via (in order) an
  explicit path, $TINYFUSERS_BPE_PATH, or vendored assets/; if none is
  found, ``load_default`` falls back to a **byte-level** tokenizer
  (same id space: byte symbols occupy ids 0..511) that is deterministic
  and in-range but NOT CLIP-compatible — fine for smoke/perf runs with
  random weights, wrong for real checkpoints (a warning is printed).
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


_WORD_RE = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[^\s]+",
    re.IGNORECASE,
)


class ClipTokenizer:
    def __init__(self, merges: Optional[List[Tuple[str, str]]] = None):
        self._b2u = byte_to_unicode()
        self.byte_level_only = merges is None
        merges = merges or []
        # Vocab id layout (must match CLIP): 256 byte symbols, then the
        # same 256 with </w>, then one id per merge, then SOT/EOT.
        base = list(self._b2u.values())
        vocab = base + [v + "</w>" for v in base]
        for a, b in merges:
            vocab.append(a + b)
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.ranks: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self._cache: Dict[str, str] = {}

    # -- construction -----------------------------------------------------

    @classmethod
    def from_merges_file(cls, path) -> "ClipTokenizer":
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
    def load_default(cls) -> "ClipTokenizer":
        envp = os.environ.get("TINYFUSERS_BPE_PATH")
        candidates = ([Path(envp)] if envp else []) + _ASSET_CANDIDATES
        for c in candidates:
            if c.is_file():
                return cls.from_merges_file(c)
        print(
            "warning: no BPE merges file found (set TINYFUSERS_BPE_PATH or "
            "vendor tokenizer/assets/bpe_simple_vocab_16e6.txt.gz); using "
            "byte-level fallback — NOT CLIP-compatible"
        )
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

    def encode_text(self, text: str) -> List[int]:
        """Raw BPE ids, unpadded."""
        ids: List[int] = []
        text = _whitespace_clean(text).lower()
        for word in _WORD_RE.findall(text):
            mapped = "".join(self._b2u[b] for b in word.encode("utf-8"))
            for sym in self._merge_word(mapped).split(" "):
                ids.append(self.encoder[sym])
        return ids

    def encode(self, text: str, length: int = CONTEXT_LENGTH,
               pad_token: int = EOT) -> List[int]:
        """SOT + up to (length-2) tokens + EOT, padded to fixed length.

        SD1.x pads with EOT (reference tokenizer/clip.py:66-75); OpenCLIP
        (SD2.x / SDXL's second encoder) pads with 0: pass pad_token=0."""
        ids = self.encode_text(text)[: length - 2]
        return ([SOT] + ids + [EOT]
                + [pad_token] * (length - 2 - len(ids)))
