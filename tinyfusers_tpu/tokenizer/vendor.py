"""One-time vendoring of the CLIP BPE merges file into tokenizer/assets/.

Usage:
    python -m tinyfusers_tpu.tokenizer.vendor /path/to/bpe_simple_vocab_16e6.txt.gz
    python -m tinyfusers_tpu.tokenizer.vendor https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz

The reference instead fetches this file from github at import time
(reference tokenizer/clip.py:6-8); we vendor once and never touch the
network again. Accepts the OpenAI .txt.gz, a plain .txt, or an HF-style
merges.txt. Validates the merge count and the SOT/EOT id positions
before installing.
"""
from __future__ import annotations

import gzip
import shutil
import sys
import tempfile
from pathlib import Path

from . import bpe

ASSETS = Path(__file__).parent / "assets"
EXPECTED_MERGES = 49152 - 256 - 2 - 256  # 48894


def validate(path: Path) -> None:
    tok = bpe.ClipTokenizer.from_merges_file(path)
    n_merges = len(tok.ranks)
    if n_merges != EXPECTED_MERGES:
        raise SystemExit(
            f"{path}: {n_merges} merges, expected {EXPECTED_MERGES} — not "
            "the CLIP bpe_simple_vocab_16e6 file")
    if tok.sot_id != bpe.SOT or tok.eot_id != bpe.EOT:
        raise SystemExit(
            f"{path}: SOT/EOT landed at {tok.sot_id}/{tok.eot_id}, "
            f"expected {bpe.SOT}/{bpe.EOT}")
    probe = tok.encode_text("a")
    if probe != [320]:
        raise SystemExit(f"{path}: id('a</w>') = {probe}, expected [320]")


def install(src: str) -> Path:
    if src.startswith(("http://", "https://")):
        from urllib.request import urlopen

        with tempfile.NamedTemporaryFile(
                suffix=Path(src).suffix or ".txt", delete=False) as f:
            with urlopen(src) as r:  # noqa: S310 - explicit user-given URL
                shutil.copyfileobj(r, f)
            local = Path(f.name)
    else:
        local = Path(src)
        if not local.is_file():
            raise SystemExit(f"not a file: {src}")
    validate(local)
    ASSETS.mkdir(exist_ok=True)
    # Store decompressed under the canonical name so load_default finds it.
    dst = ASSETS / "bpe_simple_vocab_16e6.txt.gz"
    if local.suffix == ".gz":
        shutil.copyfile(local, dst)
    else:
        with open(local, "rb") as fin, gzip.open(dst, "wb") as fout:
            shutil.copyfileobj(fin, fout)
    print(f"installed {dst} — ClipTokenizer.load_default() now exact-CLIP")
    return dst


if __name__ == "__main__":
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    install(sys.argv[1])
