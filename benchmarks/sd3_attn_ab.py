"""A/B: SD3 joint-attention layouts on the chip.

A = what mmdit._block's fallback does today: channel-packed activations
    unpacked to bhsd (transpose relayouts in HBM), flash kernel,
    repacked. The transposes measured ~11 ms/forward (profile_mmdit.py).
B = multi-k heads-packed kernel (round-5): packed layout straight in and
    out, per-head scratch stats across k blocks — zero HBM relayouts.

Chained device timing with scalar readback (tunnel rules, BASELINE.md).

Usage: python benchmarks/sd3_attn_ab.py [--n 30] [--bk 1408]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=30)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--bk", type=int, default=1408)
    p.add_argument("--bq", type=int, default=256)
    args = p.parse_args()

    from tinyfusers_tpu.kernels import flash_attention as fa
    from tinyfusers_tpu.ops import attention as att

    b, s, h, d = 2, 4173, 24, 64  # SD3-medium joint sequence, CFG batch
    c = h * d
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, s, c), jnp.bfloat16)

    def chain(f):
        def run(q):
            def body(x, _):
                y = f(x, x, x)
                return y.astype(x.dtype), ()
            out, _ = jax.lax.scan(body, q, None, length=args.n)
            return jnp.sum(out, dtype=jnp.float32)
        return jax.jit(run)

    def time_it(name, f):
        g = chain(f)
        np.asarray(g(q)).ravel()[:1]
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(g(q)).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / args.n * 1e3:.3f} ms/call")
        return best / args.n

    def bhsd_path(q_, k_, v_):
        unpack = lambda x: x.reshape(b, s, h, d).transpose(0, 2, 1, 3)  # noqa: E731
        o = att.sdpa(unpack(q_), unpack(k_), unpack(v_), impl="flash")
        return o.transpose(0, 2, 1, 3).reshape(b, s, c)

    def packed_multik(q_, k_, v_):
        return fa._flash_packed_multik(q_, k_, v_, heads=h, scale=None,
                                       block_q=args.bq, block_k=args.bk,
                                       interpret=False)

    ta = time_it("A bhsd+transposes", bhsd_path)
    tb = time_it(f"B packed multik (bq={args.bq} bk={args.bk})",
                 packed_multik)
    print(f"delta: {100 * (tb - ta) / ta:+.1f}%")

    # parity spot check on the chip
    oa = np.asarray(bhsd_path(q, q, q), np.float32)
    ob = np.asarray(packed_multik(q, q, q), np.float32)
    err = np.max(np.abs(oa - ob))
    print(f"max |A-B|: {err:.4g}")


if __name__ == "__main__":
    main()
