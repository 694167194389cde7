"""ControlNet x cached-CFG/DeepCache composition: fidelity + speed datum.

Round-5 composition (pipeline/sd.py): control residuals refresh on
full-pass network calls and ride the sampler aux state on shallow/
cached calls. This harness measures, at real SD1.5 geometry on the
chip, (a) PSNR of the composed approximation vs the exact controlled
image and (b) the throughput each mode reaches — the datum BASELINE.md
cites. Random weights + a structured synthetic hint (no assets here);
the code path is identical with real checkpoints.

Usage: python benchmarks/controlnet_compose_bench.py [--steps 20]
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def psnr(a, b, peak=255.0):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(peak * peak / mse)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--preset", choices=["tiny", "sd15"], default="sd15")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench as B
    from tinyfusers_tpu.models import controlnet
    from tinyfusers_tpu.pipeline import sd

    cfg = sd.SD15 if args.preset == "sd15" else sd.TINY
    dtype = jnp.bfloat16
    if args.preset == "sd15":
        params = B.fast_random_params(cfg, dtype)
    else:
        params = jax.tree.map(lambda x: x.astype(dtype),
                              sd.init(jax.random.key(0), cfg))
    cn = controlnet.init(jax.random.key(1), cfg.unet, dtype=dtype)
    # un-zero the gates slightly so control actually contributes
    cn["zero_convs"] = [
        {"weight": jnp.full_like(z["weight"], 0.02), "bias": z["bias"]}
        for z in cn["zero_convs"]]
    cn["middle_out"] = {
        "weight": jnp.full_like(cn["middle_out"]["weight"], 0.02),
        "bias": cn["middle_out"]["bias"]}

    hh, ww = cfg.latent_shape[0] * 8, cfg.latent_shape[1] * 8
    yy, xx = np.mgrid[0:hh, 0:ww]
    hint = jnp.asarray(
        np.stack([(yy // 32 + xx // 32) % 2] * 3, -1)[None], jnp.float32)

    ids = jnp.full((1, cfg.clip.max_length), 3, jnp.int32)
    uids = jnp.zeros_like(ids)
    lat = sd.initial_latent(jax.random.key(2), 1, cfg, dtype)
    g = jnp.float32(7.5)
    control = (cn, hint, 1.0)

    modes = [
        ("exact+control", {}),
        ("cached_cfg u=2", {"uncond_interval": 2}),
        ("deepcache k=2", {"deepcache_interval": 2}),
        ("dc k=2 + u=2", {"deepcache_interval": 2, "uncond_interval": 2}),
    ]
    base_img = None
    for name, kw in modes:
        f = lambda: sd.generate(params, ids, uids, lat, g,  # noqa: E731
                                num_steps=args.steps, cfg=cfg,
                                control=control, **kw)
        img = np.asarray(f())  # compile + run
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        row = f"{name:16s} {1.0/best:6.3f} img/s  ({best:.3f} s)"
        if base_img is None:
            base_img = img
        else:
            row += f"  PSNR vs exact: {psnr(img, base_img):.1f} dB"
        print(row, flush=True)


if __name__ == "__main__":
    main()
