"""Fused Pallas dequant-matmul vs XLA fallback at SD/SDXL linear shapes.

VERDICT r1 item 7: "benchmark quant_matmul on/off at SD and SDXL shapes,
flip the default where it wins". Shapes are the hot linears of the SD1.5
and SDXL UNets at b=2 (CFG batch): attention qkv/out projections and the
GEGLU/FF matmuls at each resolution level, plus the SD3 MMDiT trunk.

Methodology matches flash_sweep.py: 200 calls chained in a lax.scan
inside one jit so device time dominates the axon tunnel's ~5-8 ms
dispatch jitter.

Usage: python benchmarks/quant_kernel_bench.py [--dtype bf16]
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

from tinyfusers_tpu import ops
from tinyfusers_tpu.kernels.quant_matmul import quant_matmul, quant_matmul_int4
from tinyfusers_tpu.ops.quant import quantize_int4

ITERS = 200

# (name, M, K, N): M = tokens (b=2 CFG batch x spatial), K->N the weight.
SHAPES = [
    ("sd15 64x64 qkv", 8192, 320, 320),
    ("sd15 64x64 geglu", 8192, 320, 2560),
    ("sd15 64x64 ff-out", 8192, 1280, 320),
    ("sd15 32x32 geglu", 2048, 640, 5120),
    ("sd15 16x16 qkv", 512, 1280, 1280),
    ("sd15 16x16 geglu", 512, 1280, 10240),
    ("sdxl 32x32 qkv", 8192, 640, 640),
    ("sdxl 16x16 geglu", 2048, 1280, 10240),
    ("sd3 trunk qkv", 8450, 1536, 4608),
    ("sd3 trunk mlp", 8450, 1536, 6144),
]


def chain(fn, x, reps=3):
    def run(x0):
        def body(carry, _):
            y = fn(carry)
            # Feed a slice of the output back so the chain is data-dependent
            # but shapes stay fixed: fold y's mean into the carry.
            return carry + jnp.mean(y).astype(carry.dtype), None

        out, _ = jax.lax.scan(body, x0, None, length=ITERS)
        # scalar readback: the axon tunnel moves ~30 MB/s, so returning
        # the full activation would add ~35 ms per MB to every timing
        return jnp.sum(out, dtype=jnp.float32)

    j = jax.jit(run)
    np.asarray(j(x)).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(j(x)).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = p.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    print(f"{'shape':22s} {'M':>6s}x{'K':>5s}x{'N':>6s} "
          f"{'dense':>8s} {'i8-xla':>8s} {'i8-ker':>8s} "
          f"{'i4-xla':>8s} {'i4-ker':>8s}")
    for name, m, k, n in SHAPES:
        kx, kw, kb = jax.random.split(jax.random.key(0), 3)
        x = jax.random.normal(kx, (m, k), dtype)
        w = jax.random.normal(kw, (k, n), jnp.float32)
        b = jax.random.normal(kb, (n,), jnp.float32)
        wd = w.astype(dtype)
        q8 = ops.quantize(w, jnp.int8, axis=-1)
        q4 = quantize_int4(w, axis=0, group_size=64)

        t_dense = chain(lambda v: ops.linear(v, wd, b), x)
        t8_xla = chain(lambda v: jnp.dot(v, q8.values.astype(dtype),
                                         preferred_element_type=jnp.float32)
                       * q8.scales + b, x)
        t8_ker = chain(lambda v: quant_matmul(v, q8, b), x)
        t4_xla = chain(lambda v: ops.linear(v, q4.dequantize(dtype), b), x)
        t4_ker = chain(lambda v: quant_matmul_int4(v, q4, b), x)
        print(f"{name:22s} {m:6d}x{k:5d}x{n:6d} "
              f"{t_dense*1e6:7.1f}u {t8_xla*1e6:7.1f}u {t8_ker*1e6:7.1f}u "
              f"{t4_xla*1e6:7.1f}u {t4_ker*1e6:7.1f}u")


if __name__ == "__main__":
    main()
