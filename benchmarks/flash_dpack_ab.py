"""Probe: does the d=40 head geometry actually pay a lane penalty?

Same useful attention FLOPs (H*d constant, S fixed) at d=40/80/128:
if t(H=8,d=40) >> t(H=4,d=80), the head dim is the bottleneck and a
block-diagonal 2-head-packed kernel (2x the MACs at d=80 shape) wins
iff t(d40) > 2*t(d80). Chained-scan timing (kernel-level timings ARE
representative here, unlike XLA-context GEMMs — pallas kernels compile
standalone either way).
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

from tinyfusers_tpu.kernels.flash_attention import flash_attention  # noqa: E402

ITERS = 40


def timed(f, *args):
    @jax.jit
    def chained(x, *rest):
        for _ in range(ITERS):
            x = f(x, *rest)
        return x[0, 0, 0]

    np.asarray(chained(*args))
    t0 = time.perf_counter()
    np.asarray(chained(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    b, s, c = 2, 4096, 320
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, s, c), jnp.bfloat16)
    k = jax.random.normal(key, (b, s, c), jnp.bfloat16)
    v = jax.random.normal(key, (b, s, c), jnp.bfloat16)
    useful = 4 * b * s * s * c  # 2 matmuls x 2 flops, summed over heads
    for heads in (8, 4, 2):
        d = c // heads

        def f(q, k=k, v=v, h=heads):
            return flash_attention(q, k, v, layout="packed", heads=h)

        try:
            t = timed(f, q)
            print(f"H={heads} d={d:3d}: {t*1e3:7.3f} ms  "
                  f"({useful/t/1e12:5.1f} TF/s useful)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"H={heads} d={d:3d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    # bhsd layout for reference at the same shapes
    for heads in (8, 4):
        d = c // heads
        qt = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
        kt = k.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
        vt = v.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

        def g(qq, kk=kt, vv=vt):
            return flash_attention(qq, kk, vv)[:, :, :, :]

        try:
            t = timed(lambda x, kk=kt, vv=vt: flash_attention(x, kk, vv), qt)
            print(f"bhsd H={heads} d={d:3d}: {t*1e3:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bhsd H={heads}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
