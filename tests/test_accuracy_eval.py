"""Accuracy-harness smoke: benchmarks/accuracy_eval.py end-to-end on the
tiny config (random weights = pipeline proof; real weights are a flag
swap — see the harness docstring)."""
import json
import subprocess
import sys
from pathlib import Path


def test_accuracy_eval_produces_delta_table(tmp_path):
    out = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, "benchmarks/accuracy_eval.py", "--preset", "tiny",
         "--cpu", "--steps", "2", "--prompts", "2",
         "--variants", "int8,cached_cfg", "--json", str(out)],
        capture_output=True, text=True,
        cwd=Path(__file__).resolve().parent.parent, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    report = json.loads(out.read_text())
    rows = {row["variant"]: row for row in report["rows"]}
    assert set(rows) == {"fp16", "int8", "cached_cfg"}
    for name in ("int8", "cached_cfg"):
        row = rows[name]
        assert "delta_clip_score" in row and "psnr_vs_fp16_db" in row
        assert row["psnr_vs_fp16_db"] > 5.0  # same-ballpark images
        assert row["fid_vs_fp16"] >= 0.0  # FID column (round-5 bar)
    assert all(abs(r_["clip_score_mean"]) <= 100.0 for r_ in report["rows"])
    assert report["fid_tower"] == "clip"


def test_proof_mode_ids_stable_across_processes():
    """Proof-mode pseudo-ids must not depend on the per-process str-hash
    salt (round-4 advisor): two fresh interpreters with different
    PYTHONHASHSEED must derive identical seeds."""
    import os
    import subprocess
    import sys

    code = ("import hashlib;"
            "t='a photograph of an astronaut riding a horse';"
            "print(int.from_bytes(hashlib.sha256(t.encode()).digest()[:4],"
            "'little'))")
    outs = []
    for salt in ("0", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=salt)
        outs.append(subprocess.run([sys.executable, "-c", code], env=env,
                                   capture_output=True, text=True,
                                   timeout=60).stdout.strip())
    assert outs[0] == outs[1] != ""


def test_inception_tower_gated_without_ckpt():
    r = subprocess.run(
        [sys.executable, "benchmarks/accuracy_eval.py", "--preset", "tiny",
         "--cpu", "--fid-tower", "inception"],
        capture_output=True, text=True,
        cwd=Path(__file__).resolve().parent.parent, timeout=120,
    )
    assert r.returncode != 0
    assert "--inception-ckpt" in r.stderr


def test_fid_math():
    """frechet_distance against closed forms (no assets needed)."""
    import numpy as np

    from tinyfusers_tpu.eval import fid

    # identical distributions -> 0
    rng = np.random.default_rng(0)
    f = rng.standard_normal((64, 8))
    mu, s = fid.feature_stats(f)
    assert abs(fid.frechet_distance(mu, s, mu, s)) < 1e-8

    # diagonal case: FID = ||dmu||^2 + sum (sqrt(a_i) - sqrt(b_i))^2
    a = np.array([1.0, 4.0]); b = np.array([9.0, 1.0])
    m1 = np.zeros(2); m2 = np.array([2.0, -1.0])
    want = 5.0 + (1 - 3) ** 2 + (2 - 1) ** 2
    got = fid.frechet_distance(m1, np.diag(a), m2, np.diag(b))
    assert abs(got - want) < 1e-9, (got, want)

    # shifting a sample set by a constant vector -> FID = ||shift||^2
    g = f + np.array([0.5] * 8)
    got = fid.fid_from_features(f, g)
    assert abs(got - 0.25 * 8) < 1e-8, got
    # and FID is symmetric
    assert abs(fid.fid_from_features(g, f) - got) < 1e-8


def test_memory_footprint_harness(tmp_path):
    """AOT engine-step HBM analysis (round-5): quant variants must show
    strictly decreasing measured argument bytes."""
    out = tmp_path / "mem.json"
    r = subprocess.run(
        [sys.executable, "benchmarks/memory_footprint.py", "--preset",
         "tiny", "--cpu", "--json", str(out)],
        capture_output=True, text=True,
        cwd=Path(__file__).resolve().parent.parent, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rows = {x["variant"]: x for x in json.loads(out.read_text())}
    assert rows["fp16"]["argument_mb"] > rows["int8"]["argument_mb"] > \
        rows["int4"]["argument_mb"] > 0
    for x in rows.values():
        assert x["total_mb"] > 0 and x["temp_mb"] >= 0
