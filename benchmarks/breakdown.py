"""End-to-end time breakdown: CLIP encode / sampler loop / VAE decode.

Times each stage of the SD1.5 512x512 pipeline separately (own jit each,
block_until_ready-bracketed) so perf work targets the real hot stage.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(x):
    # block_until_ready is unreliable on the axon tunnel; force a D2H read.
    import numpy as np

    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def timeit(fn, *args, reps=5):
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    import bench as B
    from tinyfusers_tpu.models import vae, unet
    from tinyfusers_tpu.pipeline import sd

    cfg = sd.SD15
    params = B.fast_random_params(cfg, jnp.bfloat16)
    ids = jnp.zeros((args.batch, 77), jnp.int32)
    lat = jnp.zeros((args.batch, 64, 64, 4), jnp.bfloat16)

    enc = jax.jit(lambda p_, i: sd.encode_text(p_, i, cfg))
    t_clip = timeit(enc, params, ids)

    ctx = enc(params, ids)

    loop = jax.jit(
        lambda p_, l, c, u: sd.sample_latents(
            p_, l, c, u, num_steps=args.steps, guidance=7.5, cfg=cfg
        )
    )
    t_loop = timeit(loop, params["unet"], lat, ctx, ctx, reps=3)

    # single UNet fwd b=2B (what one CFG step costs)
    lat2 = jnp.concatenate([lat, lat], 0)
    ts2 = jnp.full((2 * args.batch,), 500.0)
    ctx2 = jnp.concatenate([ctx, ctx], 0)
    ufwd = jax.jit(lambda p_, x, t, c: unet.apply(p_, x, t, c, cfg.unet))
    t_unet = timeit(ufwd, params["unet"], lat2, ts2, ctx2)

    dec = jax.jit(lambda p_, l: vae.to_image(vae.decode(p_, l, cfg.vae)))
    t_dec = timeit(dec, params["vae"], lat, reps=3)

    tot = 2 * t_clip + t_loop + t_dec
    print(f"CLIP encode (x2):   {2*t_clip*1e3:8.1f} ms  ({2*t_clip/tot:5.1%})")
    print(f"sampler loop ({args.steps}):  {t_loop*1e3:8.1f} ms  ({t_loop/tot:5.1%})")
    print(f"  UNet fwd b={2*args.batch}:     {t_unet*1e3:8.1f} ms/step "
          f"(loop/step = {t_loop/args.steps*1e3:.1f} ms)")
    print(f"VAE decode:         {t_dec*1e3:8.1f} ms  ({t_dec/tot:5.1%})")
    print(f"sum:                {tot*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
