"""Flash-attention block-size sweep at SD UNet shapes on the real chip.

The 64x64-level self-attention (bh=16, s=4096, d=40) is ~42% of a UNet
step; this sweeps (block_q, block_k) to pin the best tiling, comparing
against plain XLA SDPA.

Methodology: the axon tunnel adds a jittery ~5-8 ms dispatch latency per
host call, so single-call timing is useless. Each measurement chains
ITERS=200 attention calls in a lax.scan (output feeds the next q) inside
ONE jit; at ~0.5-2 ms/call the device time dominates the tunnel jitter.
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
from tinyfusers_tpu.ops.attention import sdpa_xla

ITERS = 200


def chained(attn, iters):
    def run(q, k, v):
        def body(x, _):
            y = attn(x, k, v)
            return y.astype(q.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        # scalar readback: the axon tunnel moves ~30 MB/s, so returning the
        # full array would add ~35 ms per MB of output to every timing
        return jnp.sum(out, dtype=jnp.float32)

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
        ("vaemid", 1, 4096, 4096, 512),
        ("sdxl32", 20, 4096, 4096, 64),
    ]
    for name, bh, sq, sk, d in shapes:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (bh, sq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (bh, sk, d), jnp.bfloat16)
        v = jax.random.normal(kv, (bh, sk, d), jnp.bfloat16)

        t_xla = per_call(sdpa_xla, q, k, v)
        print(f"[{name}] bh={bh} s={sq} d={d}  xla: {t_xla*1e3:7.3f} ms")

        best = None
        for bq, bk in itertools.product([128, 256, 512, 1024],
                                        [256, 512, 1024, 2048, 4096]):
            if bq > sq or bk > sk:
                continue
            vmem = (bq * bk * 4 + (bq + 2 * bk) * max(d, 128) * 2
                    + bq * max(d, 128) * 4)
            if vmem > 100e6:
                continue
            try:
                t = per_call(
                    lambda q, k, v, bq=bq, bk=bk: flash_attention(
                        q, k, v, block_q=bq, block_k=bk),
                    q, k, v)
            except Exception as e:  # noqa: BLE001
                print(f"    bq={bq:5d} bk={bk:5d}  FAIL {type(e).__name__}")
                continue
            mark = ""
            if best is None or t < best[0]:
                best = (t, bq, bk)
                mark = "  <-- best"
            print(f"    bq={bq:5d} bk={bk:5d}  {t*1e3:7.3f} ms{mark}")
        if best:
            t, bq, bk = best
            print(f"  best flash {t*1e3:.3f} ms (bq={bq}, bk={bk}); "
                  f"xla/flash = {t_xla/t:.2f}x")


if __name__ == "__main__":
    main()
