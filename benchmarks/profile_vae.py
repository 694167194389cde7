"""Capture and summarize a device trace of one VAE decode (512x512).

Same methodology as profile_unet.py: TensorBoard trace -> aggregate
op-level device time. The VAE decode is ~19% of the SD1.5 e2e wall time
(benchmarks/breakdown.py) yet its conv FLOPs put it near ~9 ms ideal on
v5e — this pins down where the rest goes (GroupNorm passes, upsample
materialization, layout changes).

Usage: python benchmarks/profile_vae.py [--out /tmp/tf_trace_vae]
"""
import argparse
import collections
import glob
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def summarize(out_dir, runs):
    traces = sorted(glob.glob(f"{out_dir}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        print("no trace written (platform may not support profiling)")
        return
    with gzip.open(traces[-1]) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.Counter()
    total = 0
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e.get("pid"), ""):
            agg[e["name"]] += e["dur"]
            total += e["dur"]
    print(f"device time total: {total/1e3/runs:.2f} ms/run")
    for name, d in agg.most_common(25):
        print(f"  {d/1e3/runs:8.3f} ms/run  {name[:90]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/tf_trace_vae")
    p.add_argument("--runs", type=int, default=5)
    args = p.parse_args()

    import bench as B
    from tinyfusers_tpu.models import vae
    from tinyfusers_tpu.pipeline import sd

    cfg = sd.SD15
    params = B.fast_random_params(cfg, jnp.bfloat16)["vae"]
    lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    f = jax.jit(lambda p_, l: vae.decode(p_, l, cfg.vae))
    for _ in range(2):
        np.asarray(f(params, lat)).ravel()[:1]

    jax.profiler.start_trace(args.out)
    for _ in range(args.runs):
        r = f(params, lat)
    np.asarray(r).ravel()[:1]
    jax.profiler.stop_trace()
    summarize(args.out, args.runs)


if __name__ == "__main__":
    main()
