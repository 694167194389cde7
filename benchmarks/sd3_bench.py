"""SD3-medium 1024x1024 single-chip throughput (BASELINE config 5 family).

MMDiT backbone + rectified-flow sampler, dual-CLIP conditioning, 16ch
VAE. Random weights (no checkpoint assets in this environment);
FLOPs/traffic match real weights. Optional --quant int8|int4 quantizes
the MMDiT weights (int4 = BASELINE config 5's "DiT-style backbone, INT4
weight-only" stretch datum).
"""
import argparse
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tinyfusers_tpu.pipeline import sd3


def tree_random(shapes, seed=0):
    rng = np.random.default_rng(seed)
    pool = (rng.standard_normal(1 << 20).astype(np.float32) * 0.02)

    def fill(leaf):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        reps = -(-n // pool.size)
        arr = np.tile(pool, reps)[:n].reshape(leaf.shape)
        return jnp.asarray(arr, dtype=leaf.dtype)

    return jax.tree.map(fill, shapes)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=28)
    p.add_argument("--flow-method", choices=["euler", "heun"],
                   default="euler")
    p.add_argument("--quant", choices=["none", "int8", "int4"],
                   default="none")
    args = p.parse_args()

    cfg = sd3.SD3_MEDIUM_CFG
    dtype = jnp.bfloat16
    t0 = time.monotonic()
    shapes = jax.eval_shape(lambda: sd3.init(jax.random.key(0), cfg, dtype=dtype))
    params = tree_random(shapes)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
    print(f"params: {n_params/1e9:.2f}B, built+uploading {time.monotonic()-t0:.0f}s",
          flush=True)

    if args.quant != "none":
        from tinyfusers_tpu.io.quantize_tree import quantize_params

        qdtype = jnp.int8 if args.quant == "int8" else "int4"
        params["mmdit"] = quantize_params(params["mmdit"], qdtype)
        print(f"mmdit weights quantized: {args.quant}", flush=True)

    ids_l = jnp.full((1, 77), 49407, jnp.int32)
    ids_g = jnp.full((1, 77), 49407, jnp.int32)
    lat = sd3.initial_latent(jax.random.key(1), 1, cfg, dtype)
    g = jnp.float32(5.0)

    t0 = time.monotonic()
    for _ in range(2):
        img = sd3.generate(params, ids_l, ids_g, ids_l, ids_g, lat, g,
                           num_steps=args.steps, cfg=cfg,
                           method=args.flow_method)
        np.asarray(img)
    print(f"warmup {time.monotonic()-t0:.0f}s", flush=True)

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        img = sd3.generate(params, ids_l, ids_g, ids_l, ids_g, lat, g,
                           num_steps=args.steps, cfg=cfg,
                           method=args.flow_method)
        np.asarray(img)
        best = min(best, time.perf_counter() - t0)
    print(f"SD3-medium 1024x1024 {args.steps}-step flow-CFG b=1 "
          f"quant={args.quant}: {best:.3f}s ({1/best:.4f} img/s/chip, "
          f"{best/args.steps*1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
