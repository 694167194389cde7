"""Prompt attention weighting — "(word:1.2)" / "(word)" / "[word]" syntax.

Capability beyond the reference (plain prompts only): emphasis syntax as
popularized by SD web UIs. Parsing rules:

- "(text)"      weight x1.1 (nesting multiplies)
- "[text]"      weight /1.1
- "(text:1.3)"  explicit weight
- "\\(" "\\)"    literal parens

Application (models-side, sd.apply_prompt_weights): CLIP runs on the
plain token stream, then each token's hidden state is scaled about the
sequence mean: h_i <- mean + (h_i - mean) * w_i — the standard recipe
that preserves the overall embedding magnitude.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

from . import bpe

_ESCAPED = {"\\(": "(", "\\)": ")", "\\[": "[", "\\]": "]"}

_TOKEN_RE = re.compile(
    r"\\\(|\\\)|\\\[|\\]|\(|\)|\[|\]|:([0-9]*\.?[0-9]+)\)|[^\\()\[\]:]+|:"
)


def parse(text: str) -> List[Tuple[str, float]]:
    """-> [(fragment, weight)]; fragments preserve order, weight is the
    product of enclosing emphasis groups."""
    out: List[Tuple[str, float]] = []
    stack: List[float] = []  # multiplier per open group
    i = 0
    buf = ""

    def flush():
        nonlocal buf
        if buf:
            w = 1.0
            for m in stack:
                w *= m
            out.append((buf, w))
            buf = ""

    while i < len(text):
        two = text[i:i + 2]
        ch = text[i]
        if two in _ESCAPED:
            buf += _ESCAPED[two]
            i += 2
            continue
        if ch == "(":
            flush()
            stack.append(1.1)
            i += 1
            continue
        if ch == "[":
            flush()
            stack.append(1.0 / 1.1)
            i += 1
            continue
        if ch == ":" and stack:
            # possible explicit weight terminating a "(" group
            m = re.match(r":([0-9]*\.?[0-9]+)\)", text[i:])
            if m:
                stack[-1] = float(m.group(1))
                flush_weighted = buf
                buf = ""
                if flush_weighted:
                    w = 1.0
                    for x in stack:
                        w *= x
                    out.append((flush_weighted, w))
                stack.pop()
                i += m.end()
                continue
            buf += ch
            i += 1
            continue
        if ch in ")]":
            flush()
            if stack:
                stack.pop()
            i += 1
            continue
        buf += ch
        i += 1
    flush()
    return [(t, w) for t, w in out if t.strip() or t == " "]


def encode_weighted(
    tokenizer: "bpe.ClipTokenizer", text: str, length: int = bpe.CONTEXT_LENGTH,
    pad_token: Optional[int] = None,
    placeholders: Optional[dict] = None,
) -> Tuple[List[int], List[float]]:
    """-> (ids padded to length, per-token weights). SOT/EOT/padding get
    weight 1.0.

    pad_token mirrors ClipTokenizer.encode: SD1.x CLIP pads with EOT,
    OpenCLIP (SD2.x / SDXL's second encoder) pads with 0 — pass
    pad_token=0 there so weighted and plain prompts build identical ids.

    placeholders: optional {"<word>": [learned ids]} textual-inversion
    substitutions (io/textual_inversion.extend_clip output) — composes
    with (word:1.2) emphasis: the placeholder inherits the weight of the
    fragment it appears in."""
    ids: List[int] = []
    weights: List[float] = []

    def frag_encode(frag: str) -> List[int]:
        if not placeholders:
            return tokenizer.encode_text(frag)
        import re

        lowered = {k.lower(): v for k, v in placeholders.items()}
        pattern = "(" + "|".join(
            re.escape(k) for k in sorted(placeholders, key=len, reverse=True)
        ) + ")"
        out: List[int] = []
        for part in re.split(pattern, frag, flags=re.IGNORECASE):
            learned = lowered.get(part.lower())
            if learned is not None:
                out.extend(learned)
            elif part:
                out.extend(tokenizer.encode_text(part))
        return out

    for frag, w in parse(text):
        frag_ids = frag_encode(frag)
        ids.extend(frag_ids)
        weights.extend([w] * len(frag_ids))
    if pad_token is None:
        pad_token = tokenizer.eot_id
    ids = ids[: length - 2]
    weights = weights[: length - 2]
    full_ids = ([tokenizer.sot_id] + ids + [tokenizer.eot_id]
                + [pad_token] * (length - 2 - len(ids)))
    full_w = [1.0] + weights + [1.0] * (length - 1 - len(weights))
    return full_ids, full_w
