"""A/B the transformer FF block formulations at SD1.5 L0 geometry.

Round-4 trace finding: the FF OUT projection (unet.py:325) ran at ~40%
of the rate of the identically-sized FF IN projection because XLA fused
the geglu (split + gelu + multiply over the (2,4096,2560) hidden) into
the GEMM's LHS read — the MXU stalls behind a transcendental gather.
Variants:
  current : proj -> split -> geglu -> out        (one fused mess)
  barrier : optimization_barrier after geglu     (forces materialize)
  split_w : separate value/gate weights, geglu as clean elementwise
Chained-scan timing (dispatch-jitter immune).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tinyfusers_tpu import ops  # noqa: E402

ITERS = 60


def chain_time(f, *args):
    @jax.jit
    def chained(x, *rest):
        for _ in range(ITERS):
            x = f(x, *rest) * 1e-3  # keep magnitudes bounded
        return x[0, 0, 0]

    np.asarray(chained(*args))
    t0 = time.perf_counter()
    np.asarray(chained(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    for (b, s, c) in [(2, 4096, 320), (2, 1024, 640), (2, 256, 1280)]:
        key = jax.random.key(0)
        x = jax.random.normal(key, (b, s, c), jnp.bfloat16)
        wp = jax.random.normal(key, (c, c * 8), jnp.bfloat16) * 0.02
        bp = jnp.zeros((c * 8,), jnp.bfloat16)
        wo = jax.random.normal(key, (c * 4, c), jnp.bfloat16) * 0.02
        bo = jnp.zeros((c,), jnp.bfloat16)
        wv, wg = jnp.split(wp, 2, axis=-1)
        bv, bg = jnp.split(bp, 2, axis=-1)

        def current(x):
            h = ops.linear(x, wp, bp)
            gx, gate = jnp.split(h, 2, axis=-1)
            h = ops.geglu(gx, gate)
            return ops.linear(h, wo, bo)

        def barrier(x):
            h = ops.linear(x, wp, bp)
            gx, gate = jnp.split(h, 2, axis=-1)
            h = jax.lax.optimization_barrier(ops.geglu(gx, gate))
            return ops.linear(h, wo, bo)

        def split_w(x):
            gx = ops.linear(x, wv, bv)
            gate = ops.linear(x, wg, bg)
            h = ops.geglu(gx, gate)
            return ops.linear(h, wo, bo)

        flops = 2 * b * s * (c * c * 8 + c * 4 * c)
        print(f"[{b},{s},{c}] ff-block ({flops/1e9:.1f} GFLOP):", flush=True)
        for name, f in (("current", current), ("barrier", barrier),
                        ("split_w", split_w)):
            t = chain_time(f, x)
            print(f"  {name:8s} {t*1e6:8.1f} us  {flops/t/1e12:6.1f} TF/s",
                  flush=True)


if __name__ == "__main__":
    main()
