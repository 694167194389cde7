"""LoRA fine-tuning CLI for the SD UNet (train/ subsystem demo).

Trains low-rank adapters on (latent, text-embedding) pairs with the eps
objective — the standard SD fine-tune recipe — and saves the adapter
tree as safetensors. Data: --data expects an .npz with arrays
``latents`` (N, H/8, W/8, 4) and ``context`` (N, 77, ctx_dim)
(precompute offline with the VAE encoder + CLIP); without it, a seeded
synthetic set is used so the loop is runnable anywhere (CPU included).

Example (CPU smoke):
    python examples/train_lora.py --preset tiny --cpu --steps 30

Real run sketch (TPU, SD1.5 weights):
    python examples/train_lora.py --preset sd15 --ckpt sd-v1-5.ckpt \\
        --data pairs.npz --steps 1000 --rank 8 --out lora.safetensors
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="tinyfusers-tpu LoRA fine-tune")
    p.add_argument("--preset", choices=["sd15", "tiny"], default="sd15")
    p.add_argument("--ckpt", default=None, help="SD1.x base checkpoint")
    p.add_argument("--data", default=None,
                   help=".npz with latents (N,h,w,4) + context (N,77,ctx), "
                        "or a .tfls native shard (train.write_shard)")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--rank", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--objective", choices=["eps", "v"], default="eps")
    p.add_argument("--snr-gamma", type=float, default=None)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="recompute activations in backward (fits bigger batches)")
    p.add_argument("--out", default="lora.safetensors")
    p.add_argument("--resume", default=None, help="train-state checkpoint")
    p.add_argument("--save-state", default=None,
                   help="also save the full train state here (resume later)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--log-every", type=int, default=10)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from tinyfusers_tpu import train
    from tinyfusers_tpu.io import safetensors_io
    from tinyfusers_tpu.models import unet
    from tinyfusers_tpu.pipeline import sd

    cfg = sd.SD15 if args.preset == "sd15" else sd.TINY
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.ckpt:
        from tinyfusers_tpu.io import checkpoints

        base = checkpoints.load_sd_params(args.ckpt, cfg, dtype=dtype)["unet"]
    else:
        print("no --ckpt: training adapters over seeded random base weights "
              "(smoke mode)")
        base = unet.init(jax.random.key(args.seed), cfg.unet, dtype=dtype)

    lat_hw = cfg.height // 8
    ds = None
    if args.data and str(args.data).endswith(".tfls"):
        # native shard: mmap + C++ background prefetch (train/data.py
        # write_shard produces these; native/loader.cpp serves them)
        ds = train.NativeShardDataset(args.data, batch_size=args.batch,
                                      seed=args.seed)
    elif args.data:
        blob = np.load(args.data)
        latents, context = blob["latents"], blob["context"]
    else:
        rng = np.random.default_rng(args.seed)
        n = max(args.batch * 4, 16)
        latents = rng.standard_normal(
            (n, lat_hw, lat_hw, cfg.unet.in_channels), np.float32)
        context = rng.standard_normal(
            (n, cfg.clip.max_length, cfg.unet.context_dim), np.float32)
    if ds is None:
        ds = train.LatentDataset(latents, context, batch_size=args.batch,
                                 seed=args.seed)

    loss_cfg = train.LossConfig(objective=args.objective,
                                snr_gamma=args.snr_gamma)
    opt = train.default_optimizer(args.lr, warmup_steps=min(100, args.steps // 10))
    step_fn = train.make_lora_train_step(
        lambda prm, x, t, c: unet.apply(prm, x, t, c, cfg.unet),
        opt, loss_cfg, remat=args.remat)

    lora = train.init_lora(jax.random.key(args.seed + 1), base,
                           rank=args.rank)
    state = train.TrainState.create(lora, opt)
    if args.resume:
        state = train.load_train_state(state, args.resume)
        print(f"resumed at step {int(state.step)}")

    rng = jax.random.key(args.seed + 2)
    it, t0 = None, time.perf_counter()
    done = int(state.step)
    while done < args.steps:
        if it is None:
            it = ds.epoch()
        batch = next(it, None)
        if batch is None:
            it = ds.epoch()
            batch = next(it)
        rng, sub = jax.random.split(rng)
        # context conditions the UNet directly; latents are the x0 target
        x0 = jnp.asarray(batch[0], dtype)
        ctx = jnp.asarray(batch[1], dtype)
        state, metrics = step_fn(state, base, (x0, ctx), sub)
        done = int(state.step)
        if done == 1:
            from tinyfusers_tpu.utils.profiling import device_memory_stats

            stats = device_memory_stats()
            if stats.get("bytes_in_use"):
                print(f"device HBM in use after step 1: "
                      f"{stats['bytes_in_use']/1e9:.2f} GB "
                      f"(peak {stats.get('peak_bytes_in_use', 0)/1e9:.2f} GB)")
        if done % args.log_every == 0 or done == args.steps:
            print(f"step {done:5d}  loss {float(metrics['loss']):.4f}  "
                  f"gnorm {float(metrics['grad_norm']):.3f}  "
                  f"{done / (time.perf_counter() - t0):.2f} steps/s")

    # save adapters: flatten {path}.a/.b to dotted safetensors keys
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        flat[".".join(names)] = np.asarray(leaf)
    safetensors_io.save_state_dict(flat, args.out)
    print(f"saved {len(flat)} adapter tensors (rank {args.rank}) -> {args.out}")
    if args.save_state:
        train.save_train_state(state, args.save_state)
        print(f"saved train state -> {args.save_state}")


if __name__ == "__main__":
    main()
