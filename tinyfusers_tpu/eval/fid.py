"""FID: Fréchet distance between image feature distributions.

The feature-distribution half of the BASELINE.json accuracy bar ("CLIP
score / FID parity at the same bit-width"). The reference has no
accuracy tooling at all (SURVEY.md §5); this module provides

- ``frechet_distance`` — the exact FID formula (Heusel et al. 2017)
      ||mu1 - mu2||^2 + tr(S1 + S2 - 2 (S1 S2)^{1/2})
  computed via symmetric eigendecompositions (no scipy.linalg.sqrtm):
  with A = S1^{1/2} (from eigh of S1), tr((S1 S2)^{1/2}) =
  tr((A S2 A)^{1/2}) = sum(sqrt(eigvals(A S2 A))), A S2 A symmetric PSD.
- ``clip_features`` — image features from the HF-oracle-tested CLIP ViT
  tower (models/clip_vision.py), the asset-light "CLIP-FID" variant
  (Kynkäänniemi et al. 2022 showed it ranks models consistently with
  Inception-FID and is better aligned with human judgment). Uses the
  UNNORMALIZED projected embedding — FID is about the feature
  distribution, so the norm carries signal (unlike CLIP score's cosine).
- canonical Inception-V3 FID needs torchvision's pretrained pool3
  weights — an asset this zero-egress environment cannot fetch; the
  harness (benchmarks/accuracy_eval.py --fid-tower inception) hard-fails
  with instructions until a checkpoint is provided, the same policy as
  the CLIP BPE merges file.

Statistical note: FID estimates a 2nd-moment statistic of a D-dim
feature space; with N < D samples the covariances are rank-deficient and
the estimate is biased upward (shared bias between two same-N sets, so
DELTAS at fixed N remain meaningful — exactly how the accuracy harness
uses it). Canonical absolute numbers want N >= 10k images.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp

from ..models import clip_vision


def feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D)) in float64."""
    f = np.asarray(feats, np.float64)
    if f.ndim != 2:
        raise ValueError(f"features must be (N, D), got {f.shape}")
    mu = f.mean(axis=0)
    c = f - mu
    # rowvar convention: unbiased (N-1) normalization, matching the
    # canonical pytorch-fid / np.cov defaults
    sigma = c.T @ c / max(f.shape[0] - 1, 1)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-12) -> float:
    """Fréchet distance between N(mu1, S1) and N(mu2, S2)."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    diff = mu1 - mu2
    # S1^{1/2} via symmetric eigendecomposition (PSD: clip tiny negatives
    # from finite-sample noise)
    w1, v1 = np.linalg.eigh(np.asarray(sigma1, np.float64))
    a = (v1 * np.sqrt(np.clip(w1, 0.0, None))) @ v1.T
    m = a @ np.asarray(sigma2, np.float64) @ a
    wm = np.linalg.eigvalsh((m + m.T) / 2.0)
    tr_sqrt = float(np.sqrt(np.clip(wm, 0.0, None)).sum())
    fid = (float(diff @ diff) + float(np.trace(sigma1))
           + float(np.trace(sigma2)) - 2.0 * tr_sqrt)
    # exact-same-distribution round-off can land epsilon-negative
    return max(fid, 0.0) if fid < eps else fid


def fid_from_features(feats1: np.ndarray, feats2: np.ndarray) -> float:
    mu1, s1 = feature_stats(feats1)
    mu2, s2 = feature_stats(feats2)
    return frechet_distance(mu1, s1, mu2, s2)


def clip_features(scorer, images, batch_size: int = 16) -> np.ndarray:
    """(B, H, W, 3) uint8/float images -> (B, P) CLIP-ViT features.

    Unnormalized projected embeddings from the scorer's vision tower
    (eval/clip_score.py load_scorer_params layout).
    """
    cfg = scorer["vision_cfg"]
    out = []
    images = np.asarray(images)
    for i in range(0, images.shape[0], batch_size):
        px = clip_vision.preprocess(jnp.asarray(images[i:i + batch_size]), cfg)
        out.append(np.asarray(
            clip_vision.apply(scorer["vision"], px, cfg), np.float64))
    return np.concatenate(out, axis=0)


def clip_fid(scorer, images1, images2) -> float:
    """CLIP-FID between two image sets (the asset-light FID variant)."""
    return fid_from_features(clip_features(scorer, images1),
                             clip_features(scorer, images2))
