"""Text-to-image CLI (TPU-native counterpart of reference example/sd1.py).

Runs the full pipeline: tokenize -> CLIP (cond + uncond) -> jitted DDIM
scan over the UNet -> VAE decode -> PNG. Unlike the reference, the parsed
args are actually used (reference example/sd1.py:39 overwrites them), and
there is no per-step host sync — the whole sampling loop is one XLA
program.

Weights: --ckpt loads an SD1.x checkpoint (torch-zip .ckpt or
.safetensors); without it, seeded random weights are used (produces
colored noise — useful for smoke/perf runs where no checkpoint is
available).
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description="tinyfusers-tpu text-to-image")
    p.add_argument("--prompt", default="a horse sized cat eating a bagel")
    p.add_argument("--negative-prompt", default="")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--guidance", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="rendered.png")
    p.add_argument("--ckpt", default=None, help="SD1.x .ckpt or .safetensors")
    p.add_argument("--fallback-tokenizer", action="store_true",
                   help="allow the byte-level tokenizer fallback even with "
                        "--ckpt (ONLY for synthetic-weight drills — its ids "
                        "are NOT CLIP's, real checkpoints will produce "
                        "garbage conditioning)")
    p.add_argument("--preset",
                   choices=["sd15", "sd15-quarter", "sd21-base", "sd21-v",
                            "tiny", "sdxl", "tinyxl"],
                   default="sd15",
                   help="tiny/tinyxl = toy configs for smoke tests "
                        "(CPU-friendly); sd15-quarter = 1/4-width SD1.5 "
                        "(checkpoint-drill / CPU-feasible full topology)")
    p.add_argument("--uncond-interval", type=int, default=1,
                   help=">1: cached CFG (recompute uncond eps every k steps)")
    p.add_argument("--deepcache-interval", type=int, default=1,
                   help=">1: DeepCache (full UNet every k steps)")
    p.add_argument("--deepcache-split", type=int, default=3,
                   help="shallow blocks kept per side when DeepCache is on")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--quant", choices=["none", "int8", "fp8", "int4"],
                   default="none",
                   help="weight-only quantization for the UNet")
    p.add_argument("--batch", type=int, default=1)
    from tinyfusers_tpu.pipeline.samplers import SAMPLERS

    p.add_argument("--sampler", choices=list(SAMPLERS), default="ddim")
    from tinyfusers_tpu.pipeline.samplers import SCHEDULES

    p.add_argument("--schedule", choices=list(SCHEDULES), default="ladder",
                   help="sigma spacing for the sigma-space samplers "
                        "(karras = rho-7 Karras et al. spacing)")
    p.add_argument("--control-ckpt", default=None,
                   help="ControlNet checkpoint (control_model.* layout)")
    p.add_argument("--control-image", default=None,
                   help="hint image (edges/depth/pose), resized to 8x the "
                        "latent grid")
    p.add_argument("--control-scale", type=float, default=1.0)
    p.add_argument("--ti", action="append", default=[],
                   metavar="WORD=PATH",
                   help="textual-inversion embedding: placeholder word = "
                        "embedding file (.pt/.safetensors); repeatable")
    p.add_argument("--freeu", default=None, metavar="B1,B2,S1,S2",
                   help="FreeU backbone/skip reweighting (Si et al. 2023), "
                        "e.g. 1.5,1.6,0.9,0.2 for SD1.5 / 1.3,1.4,0.9,0.2 "
                        "for SDXL")
    p.add_argument("--cfg-rescale", type=float, default=0.0,
                   help="guidance rescale phi (Lin et al. 2023) — counters "
                        "high-guidance overexposure; ~0.7 for v-pred models")
    p.add_argument("--hires-scale", type=int, default=1,
                   help=">1: hires-fix — sample at base res, latent-upscale "
                        "by this factor, denoise the tail at high res")
    p.add_argument("--hires-strength", type=float, default=0.6,
                   help="denoising strength of the hires tail pass")
    p.add_argument("--no-cfg", action="store_true",
                   help="guidance-free sampling (SD-Turbo/LCM-style "
                        "distilled checkpoints; single-batch UNet)")
    p.add_argument("--timing", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tinyfusers_tpu.pipeline import sd, sdxl
    from tinyfusers_tpu.tokenizer import bpe

    is_xl = args.preset in ("sdxl", "tinyxl")
    if is_xl and (args.ti or args.control_ckpt or args.no_cfg):
        raise SystemExit(
            "--ti/--control-ckpt/--no-cfg are SD1.x/2.x-pipeline features; "
            "not wired into the SDXL CLI path yet")
    if is_xl:
        cfg = sdxl.SDXL_BASE if args.preset == "sdxl" else sdxl.TINY_XL
        pipe = sdxl
    else:
        cfg = {"sd15": sd.SD15, "sd21-base": sd.SD21_BASE,
               "sd21-v": sd.SD21_V, "tiny": sd.TINY,
               "sd15-quarter": sd.SD15_QUARTER}[args.preset]
        pipe = sd
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    t0 = time.monotonic()
    if args.ckpt:
        from tinyfusers_tpu.io import checkpoints
        if is_xl:
            params = checkpoints.load_sdxl_params(args.ckpt, cfg, dtype=dtype)
        else:
            params = checkpoints.load_sd_params(args.ckpt, cfg, dtype=dtype)
    else:
        print("no --ckpt given: using seeded random weights (noise output)")
        params = pipe.init(jax.random.key(0), cfg, dtype=dtype)
    if args.quant != "none":
        from tinyfusers_tpu.io.quantize_tree import quantize_params
        qdtype = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn,
                  "int4": "int4"}[args.quant]
        params["unet"] = quantize_params(params["unet"], qdtype)
    print(f"params ready in {time.monotonic()-t0:.1f}s")

    # With real weights the byte-level fallback would silently produce
    # garbage conditioning — hard-fail unless this is a random-weight run.
    tok = bpe.ClipTokenizer.load_default(
        allow_fallback=args.ckpt is None or args.fallback_tokenizer)

    # SD2.x conditions on OpenCLIP, which pads with 0 instead of EOT.
    pad = 0 if args.preset.startswith("sd21") else bpe.EOT

    def make_ids(text, length):
        return jnp.array([tok.encode(text, length, pad_token=pad)] * args.batch,
                         jnp.int32)

    freeu = (tuple(float(v) for v in args.freeu.split(","))
             if args.freeu else None)
    if freeu is not None and len(freeu) != 4:
        p.error("--freeu needs exactly 4 comma-separated floats")

    latent = pipe.initial_latent(jax.random.key(args.seed), args.batch, cfg, dtype)
    if is_xl:
        ids_l = make_ids(args.prompt, cfg.clip_l.max_length)
        ids_g = make_ids(args.prompt, cfg.clip_g.max_length)
        uids_l = make_ids(args.negative_prompt, cfg.clip_l.max_length)
        uids_g = make_ids(args.negative_prompt, cfg.clip_g.max_length)
        xkey = (jax.random.key(args.seed + 1)
                if "ancestral" in args.sampler else None)
        gen = lambda: sdxl.generate(
            params, ids_l, ids_g, uids_l, uids_g, latent,
            jnp.float32(args.guidance), num_steps=args.steps, cfg=cfg,
            method=args.sampler, schedule=args.schedule, key=xkey,
            uncond_interval=args.uncond_interval,
            cfg_rescale=args.cfg_rescale, freeu=freeu)
    else:
        from tinyfusers_tpu.tokenizer import prompt_weights as pw

        if args.ti:
            from tinyfusers_tpu.io import textual_inversion as ti_mod

            embs = {}
            for spec in args.ti:
                word, _, tpath = spec.partition("=")
                embs[word] = ti_mod.load_embedding(tpath)
            params["clip"], ti_ids = ti_mod.extend_clip(params["clip"], embs)
            wid, w = pw.encode_weighted(
                tok, args.prompt, cfg.clip.max_length, pad_token=pad,
                placeholders=ti_ids)
        else:
            wid, w = pw.encode_weighted(tok, args.prompt,
                                        cfg.clip.max_length, pad_token=pad)
        ids = jnp.array([wid] * args.batch, jnp.int32)
        weights = (jnp.array([w] * args.batch, jnp.float32)
                   if any(x != 1.0 for x in w) else None)
        uids = (None if args.no_cfg
                else make_ids(args.negative_prompt, cfg.clip.max_length))
        skey = (jax.random.key(args.seed + 1)
                if "ancestral" in args.sampler else None)
        control = None
        if args.control_ckpt:
            import numpy as _np
            from tinyfusers_tpu.io import checkpoints
            from PIL import Image

            cn_params = checkpoints.load_controlnet_params(
                args.control_ckpt, cfg.unet, dtype=dtype)
            hh, ww = latent.shape[1] * 8, latent.shape[2] * 8
            if args.control_image:
                im = Image.open(args.control_image).convert("RGB")
                im = im.resize((ww, hh), Image.LANCZOS)
                hint = jnp.asarray(_np.asarray(im), jnp.float32)[None] / 255.0
            else:
                print("no --control-image: using a zero hint (smoke run)")
                hint = jnp.zeros((1, hh, ww, 3), jnp.float32)
            control = (cn_params, hint, args.control_scale)
        if args.hires_scale > 1:
            if (control is not None or weights is not None
                    or args.deepcache_interval > 1):
                p.error("--hires-scale composes with samplers/schedules/"
                        "cached CFG; control/prompt-weights/DeepCache are "
                        "not wired into the hires path yet")
            gen = lambda: sd.generate_hires(
                params, ids, uids, latent, jax.random.key(args.seed + 1),
                jnp.float32(args.guidance), num_steps=args.steps, cfg=cfg,
                method=args.sampler, schedule=args.schedule,
                hires_scale=args.hires_scale,
                hires_strength=args.hires_strength,
                uncond_interval=args.uncond_interval,
                cfg_rescale=args.cfg_rescale, freeu=freeu)
        else:
            gen = lambda: sd.generate(params, ids, uids, latent,
                                      jnp.float32(args.guidance),
                                      num_steps=args.steps, cfg=cfg,
                                      method=args.sampler,
                                      schedule=args.schedule, key=skey,
                                      uncond_interval=args.uncond_interval,
                                      deepcache_interval=args.deepcache_interval,
                                      deepcache_split=args.deepcache_split,
                                      cfg_rescale=args.cfg_rescale,
                                      freeu=freeu,
                                      prompt_weights=weights, control=control)

    import numpy as _np

    t0 = time.monotonic()
    img = gen()
    _np.asarray(img)  # true sync (block_until_ready is unreliable on tunnels)
    compile_and_run = time.monotonic() - t0
    if args.timing:
        t0 = time.monotonic()
        img = gen()
        _np.asarray(img)
        steady = time.monotonic() - t0
        print(f"first call (incl. compile): {compile_and_run:.2f}s; "
              f"steady-state: {steady:.2f}s "
              f"({args.steps / steady:.2f} steps/s, "
              f"{args.batch / steady:.3f} images/s)")
    else:
        print(f"generated in {compile_and_run:.2f}s (incl. compile)")

    import numpy as np
    arr = np.asarray(img[0])
    try:
        from PIL import Image
        Image.fromarray(arr).save(args.out)
    except ImportError:
        # PNG writer-free fallback: save raw npy next to the requested path.
        np.save(args.out + ".npy", arr)
        print("PIL unavailable; wrote raw array instead")
    print(f"saved {args.out} ({arr.shape[0]}x{arr.shape[1]})")


if __name__ == "__main__":
    main()
