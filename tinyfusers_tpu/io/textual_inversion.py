"""Textual inversion: learned token embeddings spliced into CLIP.

Loads the two common embedding file formats —

- A1111 ``.pt``: ``{"string_to_param": {"*": (n, dim) tensor}, ...}``
  (torch-zip pickle; read by our torch-free unpickler)
- safetensors: ``{"emb_params": (n, dim)}`` or per-encoder keys
  (``clip_l`` / ``clip_g``)

— and applies them the TPU-idiomatic way: the CLIP token-embedding
TABLE is extended with the learned vectors once at load time (a single
concat on the (V, D) weight), and the tokenizer substitutes the new ids
wherever the placeholder word appears. The jitted pipeline is unchanged
— same gather, one extra table row per vector, no per-step branching.

No reference analog (inference-only SD1.4); ecosystem parity for real
SD deployments. Pooled readout stays correct because models/clip.py
locates EOT by id, not argmax.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp


def load_embedding(path) -> np.ndarray:
    """Read a textual-inversion file -> (n_vectors, dim) float array."""
    from pathlib import Path

    from . import safetensors_io, torch_pickle

    if Path(path).suffix == ".safetensors":
        state = safetensors_io.load_state_dict(path)
    else:
        # raw unpickle: A1111 files nest the tensor under
        # string_to_param, which the flat state-dict reader drops
        state = torch_pickle.load(path)
    # A1111 torch format: nested {"string_to_param": {"*": tensor}}
    for key in ("string_to_param", "string_to_param.*"):
        if key in state:
            obj = state[key]
            arr = obj["*"] if isinstance(obj, dict) else obj
            return _as_2d(np.asarray(arr))
    for key in ("emb_params", "clip_l", "emp_params"):
        if key in state:
            return _as_2d(np.asarray(state[key]))
    # single-tensor file of any name
    tensors = [v for v in state.values()
               if isinstance(v, np.ndarray) and v.ndim in (1, 2)]
    if len(tensors) == 1:
        return _as_2d(tensors[0])
    raise ValueError(
        f"unrecognized textual-inversion layout: keys {sorted(state)[:8]}")


def _as_2d(a: np.ndarray) -> np.ndarray:
    return a[None] if a.ndim == 1 else a


def extend_clip(
    clip_params,
    embeddings: Dict[str, np.ndarray],
) -> Tuple[dict, Dict[str, List[int]]]:
    """Append each placeholder's vectors to the token-embedding table.

    embeddings: {"<concept>": (n, dim)} mapping placeholder words to
    loaded vectors. Returns (new_clip_params, placeholder_ids) where
    placeholder_ids["<concept>"] is the list of new token ids to splice
    into prompts (tokenizer.encode_with_placeholders).
    """
    table = clip_params["token_embedding"]["weight"]
    vocab, dim = table.shape
    rows = []
    ids: Dict[str, List[int]] = {}
    next_id = vocab
    for word, vecs in embeddings.items():
        vecs = np.asarray(vecs, np.float32)
        if vecs.ndim != 2 or vecs.shape[1] != dim:
            raise ValueError(
                f"{word}: embedding shape {vecs.shape} does not match "
                f"CLIP dim {dim}")
        ids[word] = list(range(next_id, next_id + len(vecs)))
        next_id += len(vecs)
        rows.append(vecs)
    new_table = jnp.concatenate(
        [table] + [jnp.asarray(r, table.dtype) for r in rows], axis=0)
    out = dict(clip_params)
    out["token_embedding"] = {"weight": new_table}
    return out, ids


def encode_with_placeholders(
    tok,
    text: str,
    placeholders: Dict[str, List[int]],
    length: int,
    *,
    pad_token=None,
) -> List[int]:
    """ClipTokenizer.encode, but placeholder strings (e.g. "<my-cat>",
    matched case-insensitively on the RAW text — CLIP's word regex would
    split bracketed names apart) expand to their learned ids instead of
    BPE tokens."""
    import re

    if pad_token is None:
        pad_token = tok.eot_id
    lowered = {w.lower(): v for w, v in placeholders.items()}
    pattern = "(" + "|".join(
        re.escape(w) for w in sorted(placeholders, key=len, reverse=True)
    ) + ")"
    ids: List[int] = []
    for part in re.split(pattern, text, flags=re.IGNORECASE):
        learned = lowered.get(part.lower())
        if learned is not None:
            ids.extend(learned)
        elif part:
            ids.extend(tok.encode_text(part))
    ids = ids[: length - 2]
    return ([tok.sot_id] + ids + [tok.eot_id]
            + [pad_token] * (length - 2 - len(ids)))
