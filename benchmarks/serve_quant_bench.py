"""Serving-regime quantization datum (round-4 verdict item 6).

Runs the continuous-batching Engine on the chip with the UNet in fp16 /
int8 / int4 / int4+fused-Pallas-kernel and measures steady-state
images/s plus device HBM in use — the end-to-end number for the regime
the fused dequant kernels were built for. The quant-kernel knob is
trace-time (ops/policy.py), so each variant builds a fresh Engine.

Usage: python benchmarks/serve_quant_bench.py [--requests 12] [--slots 4]
       [--steps 20] [--variants fp16,int8,int4,int4_kernel]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=12)
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--variants", default="fp16,int8,int4,int4_kernel")
    args = p.parse_args()

    import bench as B
    from tinyfusers_tpu.io.quantize_tree import quantize_params
    from tinyfusers_tpu.ops import policy
    from tinyfusers_tpu.pipeline import sd
    from tinyfusers_tpu.serve import Engine
    from tinyfusers_tpu.utils.profiling import device_memory_stats

    cfg = sd.SD15
    params = B.fast_random_params(cfg, jnp.bfloat16)
    ids = np.full((77,), 49407, np.int32)
    ids[0] = 49406

    for variant in args.variants.split(","):
        policy.set_quant_kernel(variant == "int4_kernel")
        prm = dict(params)
        if variant.startswith("int4"):
            prm["unet"] = quantize_params(params["unet"], "int4")
        elif variant == "int8":
            prm["unet"] = quantize_params(params["unet"], jnp.int8)
        eng = Engine(prm, cfg, num_slots=args.slots)

        # warmup: one full request (compile step + decode paths)
        eng.submit(eng.make_request(ids, ids, num_steps=4, seed=0))
        eng.run_until_idle()
        hbm = device_memory_stats()

        for i in range(args.requests):
            eng.submit(eng.make_request(ids, ids, num_steps=args.steps,
                                        seed=i + 1))
        t0 = time.perf_counter()
        results = eng.run_until_idle()
        wall = time.perf_counter() - t0
        assert len(results) == args.requests
        print(json.dumps({
            "variant": variant,
            "images_per_s": round(args.requests / wall, 3),
            "wall_s": round(wall, 2),
            "hbm_gb": round(hbm.get("bytes_in_use", 0) / 1e9, 2),
            "slots": args.slots, "steps": args.steps,
        }), flush=True)
        del eng, prm


if __name__ == "__main__":
    main()
