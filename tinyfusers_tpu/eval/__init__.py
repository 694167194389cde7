"""Evaluation / accuracy tooling (CLIP score, FID, quantization deltas).

Import the submodule (``from tinyfusers_tpu.eval import clip_score``)
and call ``clip_score.clip_score(...)`` — the module is deliberately not
shadowed by a same-named function re-export.
"""
from . import clip_score, fid  # noqa: F401
from .clip_score import load_scorer_params  # noqa: F401
