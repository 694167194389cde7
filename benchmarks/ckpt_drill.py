"""Full-geometry checkpoint drill (round-4 verdict item 3).

Writes a REAL-SIZE SD1.5-layout synthetic checkpoint (1.066B params,
fp16: ~2.1 GB — the standard fp16-pruned SD1.5 size) in BOTH container
formats (torch-zip .ckpt and .safetensors), then loads each through the
production CLI path (`examples/txt2img.py --ckpt`) on this host and
generates, recording load time and peak RSS. This proves the loader's
memory/time behavior at real scale — the one derisking step tiny-config
tests can't cover (reference equivalent: example/sd1.py:40-41 loading
v1-5-pruned-emaonly).

Usage: python benchmarks/ckpt_drill.py [--dir /tmp/ckpt_drill] [--keep]
"""
import argparse
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_state(cfg):
    """Full-geometry SD1.5 state dict, checkpoint key layout, fp16."""
    import jax
    import jax.numpy as jnp

    from tinyfusers_tpu.pipeline import sd
    from tinyfusers_tpu.io import state_map

    shapes = jax.eval_shape(
        lambda: sd.init(jax.random.key(0), cfg, dtype=jnp.float16))
    rng = np.random.default_rng(0)
    pool = (rng.standard_normal(1 << 20) * 0.02).astype(np.float16)

    def fill(leaf):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        reps = -(-n // pool.size)
        return np.tile(pool, reps)[:n].reshape(leaf.shape).astype(np.float16)

    params = jax.tree.map(fill, shapes)
    state = state_map.sd_state_from_params(params, cfg)
    return {k: np.asarray(v, np.float16) for k, v in state.items()}


def write_ckpts(state, out_dir: Path):
    import torch

    from tinyfusers_tpu.io import safetensors_io

    out_dir.mkdir(parents=True, exist_ok=True)
    total = sum(v.nbytes for v in state.values())
    print(f"state: {len(state)} tensors, {total/1e9:.2f} GB fp16")

    t0 = time.monotonic()
    st_path = out_dir / "sd15_synth.safetensors"
    safetensors_io.save_state_dict(state, st_path)
    print(f"wrote {st_path.name}: {st_path.stat().st_size/1e9:.2f} GB "
          f"in {time.monotonic()-t0:.1f}s")

    t0 = time.monotonic()
    pt_path = out_dir / "sd15_synth.ckpt"
    # .copy(): torch.from_numpy warns on non-writable arrays (these come
    # from a read-only view); a writable copy keeps the drill warning-free
    torch.save({"state_dict": {k: torch.from_numpy(v.copy())
                               for k, v in state.items()}}, pt_path)
    print(f"wrote {pt_path.name}: {pt_path.stat().st_size/1e9:.2f} GB "
          f"in {time.monotonic()-t0:.1f}s")
    return st_path, pt_path


_RUNNER = r"""
import resource, subprocess, sys
r = subprocess.run(sys.argv[1:])
peak_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
print(f"CHILD_PEAK_RSS_KB={peak_kb}", flush=True)
sys.exit(r.returncode)
"""


def drive_cli(ckpt: Path, steps: int = 4):
    """Run the production CLI under a peak-RSS-recording wrapper
    (no /usr/bin/time in this image); parse load time, wall, peak RSS."""
    cmd = [
        sys.executable, "-c", _RUNNER,
        sys.executable, "examples/txt2img.py",
        "--ckpt", str(ckpt), "--steps", str(steps), "--timing",
        "--fallback-tokenizer",  # synthetic weights: CLIP ids irrelevant
        "--out", f"/tmp/drill_{ckpt.suffix.lstrip('.')}.png",
    ]
    t0 = time.monotonic()
    r = subprocess.run(cmd, capture_output=True, text=True,
                       cwd=Path(__file__).resolve().parent.parent)
    wall = time.monotonic() - t0
    out = r.stdout + r.stderr
    load = re.search(r"params ready in ([0-9.]+)s", out)
    rss = re.search(r"CHILD_PEAK_RSS_KB=(\d+)", out)
    ok = r.returncode == 0 and "saved" in out
    msg = (f"[{ckpt.suffix}] ok={ok} wall={wall:.1f}s "
           f"load={load.group(1) if load else '?'}s")
    if rss:
        msg += f" peak_rss={int(rss.group(1))/1e6:.2f}GB"
    print(msg, flush=True)
    if not ok:
        print(out[-3000:])
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="/tmp/ckpt_drill")
    p.add_argument("--keep", action="store_true")
    p.add_argument("--steps", type=int, default=4)
    args = p.parse_args()
    out_dir = Path(args.dir)

    from tinyfusers_tpu.pipeline import sd

    t0 = time.monotonic()
    state = build_state(sd.SD15)
    print(f"built full-geometry state in {time.monotonic()-t0:.1f}s")
    st_path, pt_path = write_ckpts(state, out_dir)
    del state

    ok = drive_cli(st_path, args.steps)
    ok = drive_cli(pt_path, args.steps) and ok

    if not args.keep:
        st_path.unlink(missing_ok=True)
        pt_path.unlink(missing_ok=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
