"""Measured HBM footprint of the serving Engine step via AOT compile.

The axon tunnel's runtime HBM counters are a no-op
(device_memory_stats == {}), so round-4's quantization footprint column
was checkpoint-size arithmetic. This harness compiles the Engine's
jitted slot-step AOT (jit(...).lower(shapes).compile()
.memory_analysis()) and reports the compiler's actual reservation:
argument bytes (weights + slot state), output, temp (activation
workspace), and total — a transport-independent measurement (round-4
verdict item 4).

Usage:
  python benchmarks/memory_footprint.py [--preset sd15] [--slots 4]
      [--variants fp16,int8,int4] [--cpu]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["tiny", "sd15"], default="sd15")
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--variants", default="fp16,int8,int4")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--json", default=None)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tinyfusers_tpu.io.quantize_tree import quantize_params
    from tinyfusers_tpu.pipeline import sd
    from tinyfusers_tpu.serve.engine import Engine

    cfg = {"tiny": sd.TINY, "sd15": sd.SD15}[args.preset]
    dtype = jnp.bfloat16
    base_shapes = jax.eval_shape(
        lambda: sd.init(jax.random.key(0), cfg, dtype=dtype))

    S = args.slots
    h, w, c = cfg.latent_shape
    lat_s = jax.ShapeDtypeStruct((S, h, w, c), dtype)
    ctx_s = jax.ShapeDtypeStruct((2 * S, cfg.clip.max_length, cfg.clip.dim),
                                 dtype)
    vec_s = jax.ShapeDtypeStruct((S,), jnp.float32)
    act_s = jax.ShapeDtypeStruct((S,), jnp.bool_)

    def quant_shapes(q):
        return jax.eval_shape(
            lambda t: quantize_params(t, q), base_shapes["unet"])

    rows = []
    for name in [v for v in args.variants.split(",") if v]:
        unet_s = {
            "fp16": base_shapes["unet"],
            "int8": quant_shapes(jnp.int8),
            "fp8": quant_shapes(jnp.float8_e4m3fn),
            "int4": quant_shapes("int4"),
        }[name]
        # A shape-only Engine: __init__ builds small slot buffers + jits;
        # the step program is lowered AOT, never executed.
        eng = Engine({"unet": unet_s, "vae": base_shapes["vae"],
                      "clip": base_shapes["clip"]}, cfg, num_slots=S,
                     prefer_native=False)
        compiled = eng._step.lower(
            unet_s, lat_s, ctx_s, vec_s, vec_s, vec_s, vec_s, act_s
        ).compile()
        ma = compiled.memory_analysis()
        row = {
            "variant": name,
            "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            "total_mb": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 2**20, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(f"\n== engine-step HBM reservation ({args.preset}, {S} slots, "
          f"AOT memory_analysis) ==")
    print(f"{'variant':8s} {'args(MB)':>9s} {'temp(MB)':>9s} "
          f"{'out(MB)':>8s} {'total(MB)':>10s}")
    for r in rows:
        print(f"{r['variant']:8s} {r['argument_mb']:9.1f} "
              f"{r['temp_mb']:9.1f} {r['output_mb']:8.1f} "
              f"{r['total_mb']:10.1f}")
    if args.json:
        Path(args.json).write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
