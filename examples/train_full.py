"""Full-parameter fine-tune CLI for the SD UNet (no adapters).

The round-4 training datum was LoRA-only; this drives ALL 860M UNet
parameters through train.make_train_step on one chip — the memory-
boundary probe the round-4 verdict asked for (params + grads +
optimizer moments + remat'd activations vs 16 GB HBM).

Optimizer options map the memory/quality tradeoff:
  adamw       — optax default: moments in the PARAM dtype (bf16 here);
                2 extra param-sized bf16 trees.
  adamw-f32   — fp32 first moment (mu_dtype=float32): the conservative
                recipe, +1 param-sized fp32 tree.
  sgdm        — SGD + momentum: 1 extra tree (documented fallback).
  adafactor   — factored second moment: O(rows+cols) state, the
                TPU-native memory-frugal choice.

Reports steps/s AND the AOT-compiled step's HBM reservation
(memory_analysis), so the boundary is a measured number rather than an
OOM stack trace. Synthetic (latent, context) pairs (zero-egress env);
FLOPs/traffic match real data.

Example (the boundary probe used for BASELINE.md round-5):
    python examples/train_full.py --preset sd15 --steps 60 --batch 4 \\
        --optimizer adamw --remat
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="tinyfusers-tpu full fine-tune")
    p.add_argument("--preset", choices=["sd15", "tiny"], default="sd15")
    p.add_argument("--ckpt", default=None, help="SD1.x base checkpoint")
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--objective", choices=["eps", "v"], default="eps")
    p.add_argument("--optimizer",
                   choices=["adamw", "adamw-f32", "sgdm", "adafactor"],
                   default="adamw")
    p.add_argument("--remat", action="store_true", default=True)
    p.add_argument("--no-remat", dest="remat", action="store_false")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--out", default=None,
                   help="save fine-tuned UNet weights here (safetensors)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp
    import optax

    from tinyfusers_tpu import train
    from tinyfusers_tpu.models import unet
    from tinyfusers_tpu.pipeline import sd

    cfg = sd.SD15 if args.preset == "sd15" else sd.TINY
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.ckpt:
        from tinyfusers_tpu.io import checkpoints

        params = checkpoints.load_sd_params(args.ckpt, cfg, dtype=dtype)["unet"]
    else:
        print("no --ckpt: fine-tuning seeded random weights (boundary probe)")
        params = unet.init(jax.random.key(args.seed), cfg.unet, dtype=dtype)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"UNet params: {n_params/1e6:.0f}M ({args.dtype})", flush=True)

    lat_hw = cfg.height // 8
    rng_np = np.random.default_rng(args.seed)
    n = max(args.batch * 4, 16)
    ds = train.LatentDataset(
        rng_np.standard_normal(
            (n, lat_hw, lat_hw, cfg.unet.in_channels), np.float32),
        rng_np.standard_normal(
            (n, cfg.clip.max_length, cfg.unet.context_dim), np.float32),
        batch_size=args.batch, seed=args.seed)

    if args.optimizer == "adamw":
        opt = train.default_optimizer(args.lr)
    elif args.optimizer == "adamw-f32":
        opt = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.adamw(args.lr, mu_dtype=jnp.float32))
    elif args.optimizer == "sgdm":
        opt = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.sgd(args.lr, momentum=0.9))
    else:
        opt = optax.adafactor(args.lr)

    loss_cfg = train.LossConfig(objective=args.objective)
    step_fn = train.make_train_step(
        lambda prm, x, t, c: unet.apply(prm, x, t, c, cfg.unet),
        opt, loss_cfg, remat=args.remat)

    state = train.TrainState.create(params, opt)
    opt_bytes = sum(x.nbytes for x in jax.tree.leaves(state.opt_state)
                    if hasattr(x, "nbytes"))
    print(f"optimizer state: {opt_bytes/1e9:.2f} GB ({args.optimizer})",
          flush=True)

    # AOT memory reservation of the compiled step (donation included) —
    # the measured boundary number, independent of runtime counters.
    try:
        x0_s = jax.ShapeDtypeStruct(
            (args.batch, lat_hw, lat_hw, cfg.unet.in_channels), dtype)
        ctx_s = jax.ShapeDtypeStruct(
            (args.batch, cfg.clip.max_length, cfg.unet.context_dim), dtype)
        rng_s = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
        ma = step_fn.lower(
            jax.eval_shape(lambda: state), (x0_s, ctx_s), rng_s
        ).compile().memory_analysis()
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        print(f"AOT step memory: args {ma.argument_size_in_bytes/1e9:.2f} GB"
              f" + temp {ma.temp_size_in_bytes/1e9:.2f} GB"
              f" + out {ma.output_size_in_bytes/1e9:.2f} GB"
              f" - donated {ma.alias_size_in_bytes/1e9:.2f} GB"
              f" = {total/1e9:.2f} GB reserved", flush=True)
    except Exception as e:  # noqa: BLE001 — observability only
        print(f"AOT memory analysis unavailable: {type(e).__name__}: {e}")

    rng = jax.random.key(args.seed + 2)
    it, t0 = None, time.perf_counter()
    done = 0
    t_mark, s_mark = t0, 0
    while done < args.steps:
        if it is None:
            it = ds.epoch()
        batch = next(it, None)
        if batch is None:
            it = ds.epoch()
            batch = next(it)
        rng, sub = jax.random.split(rng)
        x0 = jnp.asarray(batch[0], dtype)
        ctx = jnp.asarray(batch[1], dtype)
        state, metrics = step_fn(state, (x0, ctx), sub)
        done = int(state.step)
        if done == 1:
            print(f"first step (incl. compile): "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            t_mark, s_mark = time.perf_counter(), 1
        if done % args.log_every == 0 or done == args.steps:
            rate = (done - s_mark) / max(time.perf_counter() - t_mark, 1e-9)
            print(f"step {done:5d}  loss {float(metrics['loss']):.4f}  "
                  f"gnorm {float(metrics['grad_norm']):.3f}  "
                  f"{rate:.2f} steps/s", flush=True)

    if args.out:
        from tinyfusers_tpu.io import safetensors_io, state_map

        sdict = state_map.unet_to_state(
            jax.tree.map(np.asarray, state.params), cfg.unet)
        safetensors_io.save_state_dict(
            {k: np.asarray(v, np.float16) for k, v in sdict.items()},
            args.out)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
