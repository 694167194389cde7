"""Capture and summarize a device trace of one UNet forward.

Writes a TensorBoard-loadable trace and prints the top op-level costs
(aggregated from the trace's device timeline). Round-1 finding kept here
for reference: SD1.5 UNet fwd (b=2, bf16) = ~26 ms on-device, of which
~42% is the five 64x64-level flash-attention calls (s=4096, d_head=40 —
lane-padded 40/128 on the MXU, so that cost is geometry-bound).

Usage: python benchmarks/profile_unet.py [--out /tmp/tf_trace]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/tf_trace")
    p.add_argument("--runs", type=int, default=3)
    args = p.parse_args()

    import bench as B
    from tinyfusers_tpu.models import unet
    from tinyfusers_tpu.pipeline import sd

    cfg = sd.SD15
    params = B.fast_random_params(cfg, jnp.bfloat16)["unet"]
    lat2 = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
    ts2 = jnp.full((2,), 500.0)
    ctx2 = jnp.zeros((2, 77, 768), jnp.bfloat16)
    f = jax.jit(lambda p_, x, t, c: unet.apply(p_, x, t, c, cfg.unet))
    for _ in range(2):
        np.asarray(f(params, lat2, ts2, ctx2)).ravel()[:1]

    jax.profiler.start_trace(args.out)
    for _ in range(args.runs):
        r = f(params, lat2, ts2, ctx2)
    np.asarray(r).ravel()[:1]
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{args.out}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        print("no trace written (platform may not support profiling)")
        return
    with gzip.open(traces[-1]) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    def family(name: str) -> str:
        """Coarse op-family bucket from the XLA op name."""
        n = name.split("(")[0]
        for pat, fam in (
            ("flash_attention", "flash-attention"),
            ("convolution", "conv"),
            ("conv", "conv"),
            ("dot", "matmul"),
            ("all-reduce", "collective"),
            ("copy", "copy/relayout"),
            ("transpose", "copy/relayout"),
            ("reduce", "reduce/norm"),
            ("add_convert", "elementwise"),
            ("fusion", "fusion(other)"),
        ):
            if pat in n:
                return fam
        return n.split(".")[0]

    agg = collections.Counter()
    fams = collections.Counter()
    total = 0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        name = e["name"]
        if name.startswith("jit_") or name.startswith("jit__"):
            continue  # whole-module parent span (double-counts children)
        agg[name] += e["dur"]
        fams[family(name)] += e["dur"]
        total += e["dur"]
    print(f"device time total (leaf ops): {total/1e3/args.runs:.2f} ms/run")
    print("-- by op family --")
    for name, d in fams.most_common():
        print(f"  {d/1e3/args.runs:8.3f} ms/run  {100*d/max(total,1):5.1f}%  {name}")
    print("-- top leaf ops --")
    for name, d in agg.most_common(15):
        print(f"  {d/1e3/args.runs:8.3f} ms/run  {name[:80]}")


if __name__ == "__main__":
    main()
