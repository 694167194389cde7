"""Accuracy harness: CLIP-score + FID deltas of approximated pipelines
vs the fp16 baseline (BASELINE.json: "CLIP score / FID parity at the
same bit-width").

Fixed prompt set -> generate with the fp16 exact pipeline and with each
approximation (int8 / fp8 / int4 weight-only, cached CFG, DeepCache) ->
score every image against its prompt with the CLIP scorer
(models/clip_vision.py + models/clip.py), and compute CLIP-FID of each
variant's image set against the fp16 set (eval/fid.py; --fid-tower
inception is gated on a torchvision InceptionV3 checkpoint that this
zero-egress environment cannot fetch) -> report mean CLIP score, delta
vs fp16, FID vs fp16, and image PSNR vs fp16, as the BASELINE.json
published-delta table.

Zero-egress note: with no real checkpoints this runs on seeded-random
weights — the SCORES are then meaningless in absolute terms, but every
stage (tokenize, generate, quantize, score, report) is the real code
path, so switching to real weights is exactly two flags:
  --ckpt v1-5-pruned-emaonly.safetensors --scorer-ckpt clip-vit-l14.safetensors

Usage:
  python benchmarks/accuracy_eval.py [--preset tiny|sd15-quarter|sd15]
      [--cpu] [--steps 20] [--variants int8,fp8,cached_cfg,deepcache]
      [--ckpt ...] [--scorer-ckpt ...] [--json out.json]
"""
import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

PROMPTS = [
    "a photograph of an astronaut riding a horse",
    "a red sports car parked on a mountain road at sunset",
    "an oil painting of a lighthouse in a storm",
    "a bowl of ramen with chopsticks, studio lighting",
    "a golden retriever puppy playing in autumn leaves",
    "a futuristic city skyline at night, neon lights",
    "a watercolor sketch of a sailboat on a calm lake",
    "an ancient stone bridge over a forest river",
    "a chef plating a dessert in a professional kitchen",
    "a snow-covered cabin with warm light in the windows",
    "macro photo of a honeybee on a sunflower",
    "a medieval castle on a cliff above the sea",
    "a cup of coffee and an open book on a wooden table",
    "a surfer riding a large wave at dawn",
    "a hot air balloon festival over desert canyons",
    "a robot tending a rooftop vegetable garden",
]


def psnr(a, b, peak=255.0):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(peak * peak / mse)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["tiny", "sd15-quarter", "sd15"],
                   default="sd15")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--prompts", type=int, default=len(PROMPTS))
    p.add_argument("--variants",
                   default="int8,fp8,int4,cached_cfg,deepcache")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--scorer-ckpt", default=None,
                   help="HF CLIPModel checkpoint for the scorer "
                        "(openai/clip-vit-large-patch14); random weights "
                        "otherwise (pipeline proof only)")
    p.add_argument("--fid-tower", choices=["clip", "inception"],
                   default="clip",
                   help="feature tower for FID: 'clip' (CLIP-FID via the "
                        "scorer's ViT, asset-light default) or 'inception' "
                        "(canonical Inception-V3; needs --inception-ckpt)")
    p.add_argument("--inception-ckpt", default=None,
                   help="torchvision InceptionV3 (pt_inception-2015) "
                        "checkpoint for canonical FID — unavailable in a "
                        "zero-egress environment")
    p.add_argument("--json", default=None)
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tinyfusers_tpu.eval import clip_score as cs
    from tinyfusers_tpu.eval import fid as fid_mod

    if args.fid_tower == "inception" and not args.inception_ckpt:
        p.error("--fid-tower inception needs --inception-ckpt (canonical "
                "InceptionV3 weights are an external asset; the CLIP tower "
                "is the asset-light default)")
    from tinyfusers_tpu.io.quantize_tree import quantize_params
    from tinyfusers_tpu.models import clip as clip_model
    from tinyfusers_tpu.models import clip_vision
    from tinyfusers_tpu.pipeline import sd
    from tinyfusers_tpu.tokenizer import bpe

    cfg = {"tiny": sd.TINY, "sd15-quarter": sd.SD15_QUARTER,
           "sd15": sd.SD15}[args.preset]
    dtype = jnp.bfloat16

    # -- pipeline params --------------------------------------------------
    if args.ckpt:
        from tinyfusers_tpu.io import checkpoints

        params = checkpoints.load_sd_params(args.ckpt, cfg, dtype=dtype)
    else:
        print("no --ckpt: seeded-random pipeline weights (pipeline proof)")
        import bench as B

        params = (B.fast_random_params(cfg, dtype) if args.preset == "sd15"
                  else jax.tree.map(lambda x: x.astype(dtype),
                                    sd.init(jax.random.key(0), cfg)))

    # -- scorer -----------------------------------------------------------
    if args.scorer_ckpt:
        scorer = cs.load_scorer_params(args.scorer_ckpt)
    else:
        print("no --scorer-ckpt: random scorer weights (pipeline proof)")
        vcfg = (clip_vision.TINY_VISION if args.preset == "tiny"
                else clip_vision.VIT_L_14)
        tcfg = (clip_model.CLIPConfig(vocab_size=128, max_length=16, dim=64,
                                      num_layers=2, num_heads=4, mlp_dim=128,
                                      projection_dim=vcfg.projection_dim)
                if args.preset == "tiny"
                else clip_model.CLIPConfig(projection_dim=768))
        scorer = {
            "text": clip_model.init(jax.random.key(10), tcfg),
            "text_cfg": tcfg,
            "vision": clip_vision.init(jax.random.key(11), vcfg),
            "vision_cfg": vcfg,
        }

    prompts = PROMPTS[: args.prompts]
    real_assets = args.ckpt is not None or args.scorer_ckpt is not None
    tok = bpe.ClipTokenizer.load_default(allow_fallback=not real_assets)
    gen_len = cfg.clip.max_length

    def ids_for(vocab, length):
        """Tokenized prompts clamped into [0, vocab): exact CLIP ids with
        real assets; with proof-mode random towers, deterministic
        per-prompt pseudo-ids in the tower's vocab (content does not
        matter, only that every stage runs)."""
        if vocab >= bpe.EOT + 1:
            return jnp.array([tok.encode(t, length, pad_token=bpe.EOT)
                              for t in prompts], jnp.int32)
        rows = []
        for t in prompts:
            # stable digest, NOT hash(): str hashing is salted per process
            # (PYTHONHASHSEED), which made proof-mode ids — and therefore
            # scores — irreproducible across invocations (round-4 advisor)
            seed = int.from_bytes(
                hashlib.sha256(t.encode()).digest()[:4], "little")
            rng = np.random.default_rng(seed)
            n = min(length - 2, 8)
            row = np.full((length,), vocab - 1, np.int32)  # EOT pad
            row[0] = vocab - 2                             # SOT
            row[1:1 + n] = rng.integers(1, vocab - 2, size=n)
            rows.append(row)
        return jnp.asarray(np.stack(rows))

    ids = ids_for(cfg.clip.vocab_size, gen_len)
    if cfg.clip.vocab_size >= bpe.EOT + 1:
        uids = jnp.array([tok.encode("", gen_len, pad_token=bpe.EOT)] *
                         len(prompts), jnp.int32)
    else:  # empty prompt = SOT then EOT padding, in the small vocab
        uids = jnp.array([[cfg.clip.vocab_size - 2] +
                          [cfg.clip.vocab_size - 1] * (gen_len - 1)] *
                         len(prompts), jnp.int32)
    sids = ids_for(scorer["text_cfg"].vocab_size,
                   scorer["text_cfg"].max_length)

    def generate(prm, **kw):
        imgs = []
        for i in range(len(prompts)):
            lat = sd.initial_latent(jax.random.key(100 + i), 1, cfg, dtype)
            img = sd.generate(prm, ids[i:i+1], uids[i:i+1], lat,
                              jnp.float32(7.5), num_steps=args.steps,
                              cfg=cfg, **kw)
            imgs.append(np.asarray(img)[0])
        return np.stack(imgs)  # (N, H, W, 3) uint8

    variants = {"fp16": {}}
    for v in [v for v in args.variants.split(",") if v]:
        variants[v] = {
            "int8": {"quant": jnp.int8},
            "fp8": {"quant": jnp.float8_e4m3fn},
            "int4": {"quant": "int4"},
            "cached_cfg": {"uncond_interval": 3},
            "deepcache": {"deepcache_interval": 3},
        }[v]

    rows = []
    base_imgs = base_feats = None
    for name, spec in variants.items():
        prm = params
        kw = dict(spec)
        if "quant" in kw:
            prm = {**params, "unet": quantize_params(params["unet"],
                                                     kw.pop("quant"))}
        t0 = time.monotonic()
        imgs = generate(prm, **kw)
        gen_s = time.monotonic() - t0
        scores = cs.clip_score(scorer, jnp.asarray(imgs), sids)
        feats = fid_mod.clip_features(scorer, imgs)
        row = {
            "variant": name,
            "clip_score_mean": round(float(np.mean(scores)), 4),
            "clip_score_std": round(float(np.std(scores)), 4),
            "gen_s": round(gen_s, 1),
        }
        if name == "fp16":
            base_imgs = imgs
            base_feats = feats
            base_score = row["clip_score_mean"]
        else:
            row["delta_clip_score"] = round(
                row["clip_score_mean"] - base_score, 4)
            # CLIP-FID of this variant's image set vs the fp16 set (N
            # prompts is small, so absolute FID is biased — the shared-N
            # DELTA column is the meaningful readout; see eval/fid.py)
            row["fid_vs_fp16"] = round(
                fid_mod.fid_from_features(feats, base_feats), 4)
            row["psnr_vs_fp16_db"] = round(
                float(np.mean([psnr(a, b)
                               for a, b in zip(imgs, base_imgs)])), 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    report = {
        "config": f"{args.preset} {cfg.height}x{cfg.width} "
                  f"{args.steps}-step CFG7.5, {len(prompts)} prompts",
        "weights": "real" if args.ckpt else "seeded-random (pipeline proof)",
        "scorer": ("clip-vit-l14" if args.scorer_ckpt
                   else "random (pipeline proof)"),
        "rows": rows,
    }
    report["fid_tower"] = args.fid_tower
    print("\n== accuracy report ==")
    print(f"{'variant':12s} {'CLIP':>8s} {'dCLIP':>8s} {'FID':>8s} "
          f"{'PSNR(dB)':>9s}")
    for r in rows:
        print(f"{r['variant']:12s} {r['clip_score_mean']:8.3f} "
              f"{r.get('delta_clip_score', 0.0):8.3f} "
              f"{r.get('fid_vs_fp16', float('nan')):8.3f} "
              f"{r.get('psnr_vs_fp16_db', float('nan')):9.2f}")
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=2))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
