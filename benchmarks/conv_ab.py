"""A/B device timing: XLA conv emitter vs GEMM decompositions for the
stride-1 3x3 convs that dominate the UNet/VAE conv stack (~10.3 ms of a
19.7 ms SD1.5 UNet forward at 60-65% MXU efficiency, BASELINE.md round-2
breakdown).

Candidates:
  conv   — lax.conv_general_dilated (current ops/conv.py path)
  gemm9  — pad once, 9 shifted slices, 9 accumulated (M,C)x(C,O) GEMMs;
           XLA's plain dot emitter tiles these better than the conv
           emitter at some shapes, at the cost of re-reading the input
  im2col — conv_general_dilated_patches + one wide GEMM

Scan-chained, scalar readback (axon tunnel moves ~30 MB/s on D2H; see
BASELINE.md round-3 timing-methodology note).

Usage: python benchmarks/conv_ab.py [--n 50] [--reps 5]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN = ("NHWC", "HWIO", "NHWC")


def conv_ref(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv_gemm9(x, w):
    n, h, wd, c = x.shape
    o = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((n, h, wd, o), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            xs = xp[:, dh:dh + h, dw:dw + wd, :]
            acc = acc + jnp.einsum(
                "nhwc,co->nhwo", xs, w[dh, dw],
                preferred_element_type=jnp.float32,
            )
    return acc.astype(x.dtype)


def conv_im2col(x, w):
    n, h, wd, c = x.shape
    o = w.shape[-1]
    patches = lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
    )  # (n, h, wd, c*9) with channel-major patch order
    wm = w.transpose(2, 0, 1, 3).reshape(9 * c, o)  # match patch order (c, kh, kw)
    y = jnp.einsum("nhwk,ko->nhwo", patches, wm,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


IMPLS = {"conv": conv_ref, "gemm9": conv_gemm9, "im2col": conv_im2col}

SHAPES = [  # (batch, h, w, cin) with cout == cin so outputs chain
    (2, 64, 64, 320),
    (2, 32, 32, 640),
    (2, 16, 16, 1280),
    (2, 8, 8, 1280),
    (1, 128, 128, 512),   # VAE decoder trunk
    (1, 512, 512, 128),   # VAE decoder tail
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=50)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    for shape in SHAPES:
        n_, h, wd, c = shape
        w = (np.random.default_rng(0).standard_normal((3, 3, c, c)) * 0.02)
        w = jnp.asarray(w, jnp.bfloat16)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(shape) * 0.5, jnp.bfloat16)
        gflop = 2 * n_ * h * wd * c * c * 9 / 1e9
        row = [f"({n_},{h},{wd},{c})x3x3 {gflop:7.2f}GF"]
        for name, fn in IMPLS.items():
            def chain(w_, x_):
                def body(cr, _):
                    return fn(cr, w_), ()
                out, _ = lax.scan(body, x_, None, length=args.n)
                return jnp.sum(out, dtype=jnp.float32)
            f = jax.jit(chain)
            np.asarray(f(w, x))
            best = 1e9
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(f(w, x))
                best = min(best, time.perf_counter() - t0)
            us = best / args.n * 1e6
            tf = gflop / (us / 1e6) / 1e3
            row.append(f"{name}={us:8.1f}us ({tf:5.1f} TF/s)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
