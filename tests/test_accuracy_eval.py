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
    assert all(abs(r_["clip_score_mean"]) <= 100.0 for r_ in report["rows"])
