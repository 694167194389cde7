"""Capture and summarize a device trace of one SD3 MMDiT forward.

The SD3 analog of profile_unet.py (round-4 verdict: SD3 carries
~11 ms/step of relayout copies around the bhsd flash path — this tool
locates and re-measures them). Same op-family summarization.

Usage: python benchmarks/profile_mmdit.py [--out /tmp/tf_trace_sd3]
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


def summarize(out, runs):
    traces = sorted(glob.glob(f"{out}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        print("no trace written (platform may not support profiling)")
        return
    with gzip.open(traces[-1]) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}

    def family(name: str) -> str:
        n = name.split("(")[0]
        for pat, fam in (
            ("flash_attention", "flash-attention"),
            ("convolution", "conv"),
            ("conv", "conv"),
            ("dot", "matmul"),
            ("all-reduce", "collective"),
            ("copy", "copy/relayout"),
            ("transpose", "copy/relayout"),
            ("concatenate", "copy/relayout"),
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
            continue
        agg[name] += e["dur"]
        fams[family(name)] += e["dur"]
        total += e["dur"]
    print(f"device time total (leaf ops): {total/1e3/runs:.2f} ms/run")
    print("-- by op family --")
    for name, d in fams.most_common():
        print(f"  {d/1e3/runs:8.3f} ms/run  {100*d/max(total,1):5.1f}%  {name}")
    print("-- top leaf ops --")
    for name, d in agg.most_common(20):
        print(f"  {d/1e3/runs:8.3f} ms/run  {name[:90]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/tf_trace_sd3")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--batch", type=int, default=2)  # CFG batch
    args = p.parse_args()

    from benchmarks.sd3_bench import tree_random
    from tinyfusers_tpu.models import mmdit

    cfg = mmdit.SD3_MEDIUM
    shapes = jax.eval_shape(
        lambda: mmdit.init(jax.random.key(0), cfg, dtype=jnp.bfloat16))
    params = tree_random(shapes)
    b = args.batch
    x = jnp.zeros((b, cfg.input_size, cfg.input_size, cfg.in_channels),
                  jnp.bfloat16)
    t = jnp.full((b,), 0.5, jnp.float32)
    ctx = jnp.zeros((b, cfg.context_len, cfg.context_dim), jnp.bfloat16)
    pooled = jnp.zeros((b, cfg.pooled_dim), jnp.bfloat16)
    f = jax.jit(lambda p_, x_, t_, c_, pl_: mmdit.apply(p_, x_, t_, c_, pl_, cfg))
    for _ in range(2):
        np.asarray(f(params, x, t, ctx, pooled)).ravel()[:1]

    jax.profiler.start_trace(args.out)
    for _ in range(args.runs):
        r = f(params, x, t, ctx, pooled)
    np.asarray(r).ravel()[:1]
    jax.profiler.stop_trace()
    summarize(args.out, args.runs)


if __name__ == "__main__":
    main()
