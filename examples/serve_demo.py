"""Continuous-batching serving demo.

Submits a stream of prompts with mixed step counts to the Engine and
shows requests joining/leaving the running batch at step boundaries.
Run with --cpu for a quick toy-model demo; on a TPU chip with --preset
sd15 (+ --ckpt for real weights) it serves real generations.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["sd15", "tiny"], default="tiny")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--slots", type=int, default=2)
    p.add_argument("--requests", type=int, default=5)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tinyfusers_tpu.pipeline import sd
    from tinyfusers_tpu.serve import Engine
    from tinyfusers_tpu.tokenizer import bpe
    from tinyfusers_tpu.utils.logging import get_logger, kv

    log = get_logger("serve_demo")
    cfg = sd.SD15 if args.preset == "sd15" else sd.TINY
    if args.ckpt:
        from tinyfusers_tpu.io import checkpoints
        params = checkpoints.load_sd_params(args.ckpt, cfg)
    else:
        params = sd.init(jax.random.key(0), cfg, dtype=jnp.float32)

    eng = Engine(params, cfg, num_slots=args.slots)
    tok = bpe.ClipTokenizer.load_default()
    prompts = [
        "a horse sized cat eating a bagel",
        "an astronaut riding a horse",
        "a watercolor fox in the snow",
        "macro photo of a clockwork bee",
        "isometric tiny city at night",
    ]

    t0 = time.monotonic()
    done = 0
    for i in range(args.requests):
        text = prompts[i % len(prompts)]
        ids = np.asarray(tok.encode(text, cfg.clip.max_length), np.int32)
        uids = np.asarray(tok.encode("", cfg.clip.max_length), np.int32)
        steps = [4, 6, 8][i % 3] if args.preset == "tiny" else [20, 30, 25][i % 3]
        req = eng.make_request(ids, uids, num_steps=steps, seed=i)
        eng.submit(req)
        log.info(kv(event="submit", rid=req.request_id, steps=steps))
        # interleave a tick between submissions -> requests join mid-flight
        for r in eng.step():
            done += 1
            log.info(kv(event="done", rid=r.request_id, shape=r.image.shape))

    for r in eng.run_until_idle():
        done += 1
        log.info(kv(event="done", rid=r.request_id, shape=r.image.shape))
    dt = time.monotonic() - t0
    log.info(kv(event="summary", completed=done, wall_s=round(dt, 2),
                req_per_s=round(done / dt, 3)))
    assert done == args.requests


if __name__ == "__main__":
    main()
