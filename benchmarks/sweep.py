"""Throughput sweep: batch sizes x quantization x numerics policy.

Produces the numbers behind BASELINE.md's measured table. Every timing
uses a full host readback as the sync point (block_until_ready is
unreliable on tunneled transports — see utils/profiling.hard_sync).

Usage: python benchmarks/sweep.py [--steps 20] [--batches 1,2,4]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batches", default="1,2,4")
    p.add_argument("--quant", default="none,int8")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import bench as B
    from tinyfusers_tpu.io.quantize_tree import quantize_params
    from tinyfusers_tpu.pipeline import sd

    cfg = sd.SD15
    dtype = jnp.bfloat16
    params = B.fast_random_params(cfg, dtype)

    def run(tag, prm, batch):
        ids = jnp.full((batch, 77), 49407, jnp.int32).at[:, 0].set(49406)
        lat = sd.initial_latent(jax.random.key(7), batch, cfg, dtype)
        g = jnp.float32(7.5)
        for _ in range(2):
            img = sd.generate(prm, ids, ids, lat, g, num_steps=args.steps, cfg=cfg)
            np.asarray(img)
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            img = sd.generate(prm, ids, ids, lat, g, num_steps=args.steps, cfg=cfg)
            np.asarray(img)
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:24s} {best:7.3f}s  {batch/best:6.3f} img/s", flush=True)

    variants = {"none": params}
    for q in args.quant.split(","):
        if q == "int8":
            variants["int8"] = {**params, "unet": quantize_params(params["unet"], jnp.int8)}
        elif q == "fp8":
            variants["fp8"] = {**params, "unet": quantize_params(params["unet"], jnp.float8_e4m3fn)}

    for qname, prm in variants.items():
        for b in [int(x) for x in args.batches.split(",")]:
            run(f"quant={qname} b={b}", prm, b)


if __name__ == "__main__":
    main()
