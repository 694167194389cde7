"""A/B device timing of one UNet forward via a scan-chained loop.

Chains N UNet forwards inside one jitted lax.scan (output latent feeds the
next input) so per-call device time is total/N — immune to the axon
tunnel's ~5-8 ms dispatch jitter that swamps single-call timing.

Usage:
    python benchmarks/ab_unet.py [--n 20] [--reps 3]
    XLA_FLAGS="--xla_tpu_..." python benchmarks/ab_unet.py   # flag A/B
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
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--ff-kernel", action="store_true",
                   help="route the FF tail through the Pallas fused "
                        "GEGLU->projection kernel (kernels/geglu_ff.py)")
    p.add_argument("--ff-blocks", default=None,
                   help="bm,bk,nsub override for the FF kernel, e.g. "
                        "'512,1280,2'")
    args = p.parse_args()

    import bench as B
    from tinyfusers_tpu.models import unet
    from tinyfusers_tpu.ops import policy
    from tinyfusers_tpu.pipeline import sd

    if args.ff_kernel:
        policy.set_ff_kernel(True)
    if args.ff_blocks:
        from tinyfusers_tpu.kernels import geglu_ff

        bm, bk, ns = (int(v) for v in args.ff_blocks.split(","))
        orig = geglu_ff.geglu_matmul
        geglu_ff.geglu_matmul = lambda gx, gate, w, b=None: orig(
            gx, gate, w, b, block_m=bm, block_k=bk, nsub=ns)

    cfg = sd.SD15
    params = B.fast_random_params(cfg, jnp.bfloat16)["unet"]
    lat = jnp.zeros((args.batch, 64, 64, 4), jnp.bfloat16)
    ts = jnp.full((args.batch,), 500.0)
    ctx = jnp.zeros((args.batch, 77, 768), jnp.bfloat16)

    def chain(p_, x):
        def body(c, _):
            y = unet.apply(p_, c, ts, ctx, cfg.unet)
            # feed output back (same shape as latent) to serialize steps
            return y.astype(c.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=args.n)
        return jnp.sum(out, dtype=jnp.float32)  # scalar readback (tunnel ~30 MB/s)

    f = jax.jit(chain)
    np.asarray(f(params, lat)).ravel()[:1]  # compile + upload
    best = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(f(params, lat)).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"unet fwd (b={args.batch}): {best / args.n * 1e3:.3f} ms/call "
          f"(chain of {args.n}, best of {args.reps})")


if __name__ == "__main__":
    main()
