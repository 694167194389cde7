"""A/B the row vs transposed flash-attention kernel layouts on real TPU.

The transposed variant targets small head dims (SD1.5 d=40, SDXL d=64)
where the row layout's p@v matmul wastes (128-d)/128 of the MXU lanes.
Chained-scan timing per benchmarks/flash_sweep.py methodology.
"""
import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tinyfusers_tpu.kernels.flash_attention import flash_attention

ITERS = 200


def chained(attn, iters):
    def run(q, k, v):
        def body(x, _):
            y = attn(x, k, v)
            return y.astype(q.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(out, dtype=jnp.float32)  # scalar readback (tunnel ~30 MB/s)

    return jax.jit(run)


def time_chain(fn, q, k, v, reps=3):
    np.asarray(fn(q, k, v)).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(q, k, v)).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_call(attn, q, k, v):
    return time_chain(chained(attn, ITERS), q, k, v) / ITERS


def main():
    key = jax.random.key(0)
    shapes = [
        ("unet64", 16, 4096, 4096, 40),
        ("unet32", 16, 1024, 1024, 80),
        ("sdxl32", 20, 4096, 4096, 64),
    ]
    for name, bh, sq, sk, d in shapes:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (bh, sq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (bh, sk, d), jnp.bfloat16)
        v = jax.random.normal(kv, (bh, sk, d), jnp.bfloat16)
        print(f"[{name}] bh={bh} s={sq} d={d}")
        for variant, bq, bk in itertools.product(
                ["row", "t"], [128, 256, 512], [1024, 2048, 4096]):
            if bk > sk or bq > sq:
                continue
            try:
                t = per_call(
                    lambda q, k, v, bq=bq, bk=bk, vr=variant: flash_attention(
                        q, k, v, block_q=bq, block_k=bk, variant=vr),
                    q, k, v)
                print(f"    {variant:3s} bq={bq:4d} bk={bk:5d}  {t*1e3:7.3f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"    {variant:3s} bq={bq:4d} bk={bk:5d}  FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
