"""A/B the flash-attention head layouts on real TPU.

Compares, at the SD1.5/SDXL self-attention geometries:
  bhsd+T : transpose to (B,H,S,d), flash, transpose back — what the
           models did through round 2 (the ~1.2 ms/fwd relayout cost).
  bshd   : heads left in place, BlockSpec index maps gather per-head
           tiles — what the models do now.
  packed : heads-packed (B,S,H*d) kernel — the models' production path.
(A transposed-logits kernel variant was also A/B'd here in round 3;
it lost every measurement and was removed from the kernel module.)

Chained-scan timing (per benchmarks/flash_sweep.py): single-call timing
is swamped by the axon tunnel's ~5-8 ms dispatch jitter.
"""
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

ITERS = 100


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
    # (name, B, S, H, d) — self-attention so Sk == Sq.
    shapes = [
        ("sd15-64px", 2, 4096, 8, 40),
        ("sdxl-32px", 2, 4096, 10, 64),
        ("sd15-32px", 2, 1024, 8, 80),
    ]
    for name, b, s, h, d in shapes:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
        print(f"[{name}] b={b} s={s} h={h} d={d}", flush=True)
        def bhsd_t(q, k, v):
            qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
            o = flash_attention(qt, kt, vt)
            return o.transpose(0, 2, 1, 3)

        def packed(q, k, v, H=h):
            bb, ss, hh_, dd = q.shape
            o = flash_attention(
                q.reshape(bb, ss, hh_ * dd), k.reshape(bb, ss, hh_ * dd),
                v.reshape(bb, ss, hh_ * dd), layout="packed", heads=H)
            return o.reshape(bb, ss, hh_, dd)

        for label, fn in (("bhsd+T", bhsd_t), ("packed", packed)):
            try:
                t = per_call(fn, q, k, v)
                print(f"    {label}  {t*1e3:7.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"    {label}  FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
