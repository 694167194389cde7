"""Benchmark harness: SD1.5 512x512, 20-step DDIM, CFG 7.5, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference (Fatlonder/tinyfusers) publishes no numbers (BASELINE.md),
so vs_baseline is measured against our own recorded first-light number in
bench_baseline.json (committed once, then held fixed for the round
series). Weights are seeded-random (no checkpoint assets in this
environment); FLOPs and memory traffic are identical to real weights.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    """block_until_ready is unreliable on this platform's tunnel — a host
    readback is the only trustworthy sync point."""
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def fast_random_params(cfg, dtype, seed=0):
    """Random weights built host-side with numpy (seconds) instead of
    per-leaf device RNG over the tunnel (minutes). Same shapes/dtypes as
    sd.init; distribution detail doesn't matter for throughput."""
    from tinyfusers_tpu.pipeline import sd

    shapes = jax.eval_shape(lambda: sd.init(jax.random.key(0), cfg, dtype=dtype))
    rng = np.random.default_rng(seed)
    # One random block recycled across leaves: weight *values* don't matter
    # for throughput, and per-leaf RNG for ~1B params takes minutes on a
    # small host.
    pool = (rng.standard_normal(1 << 20).astype(np.float32) * 0.02)

    def fill(leaf):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        reps = -(-n // pool.size)
        arr = np.tile(pool, reps)[:n].reshape(leaf.shape)
        return jnp.asarray(arr, dtype=leaf.dtype)

    return jax.tree.map(fill, shapes)


def main():
    quick = "--quick" in sys.argv
    steps = 20
    batch = 1

    from tinyfusers_tpu.pipeline import sd

    cfg = sd.SD15
    dtype = jnp.bfloat16
    log(f"devices: {jax.devices()}")

    t0 = time.monotonic()
    params = fast_random_params(cfg, dtype)
    log(f"init params (host): {time.monotonic()-t0:.1f}s")

    ids = jnp.full((batch, 77), 49407, jnp.int32).at[:, 0].set(49406)
    uids = ids
    latent = sd.initial_latent(jax.random.key(1), batch, cfg, dtype)
    guidance = jnp.float32(7.5)

    t0 = time.monotonic()
    for _ in range(2):  # compile + flush lazy weight upload
        img = sd.generate(params, ids, uids, latent, guidance, num_steps=steps, cfg=cfg)
        sync(img)
    log(f"warmup (compile + weight upload): {time.monotonic()-t0:.1f}s")

    n_runs = 3 if quick else 7
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        img = sd.generate(params, ids, uids, latent, guidance, num_steps=steps, cfg=cfg)
        np.asarray(img)  # e2e includes the image reaching the host
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    step_ms = p50 / steps * 1e3  # upper bound incl. CLIP+VAE amortized
    log(f"e2e p50 latency: {p50:.3f}s  (~{step_ms:.1f} ms/step incl. CLIP+VAE)")

    # Throughput: JAX dispatch is async, so each image's D2H readback
    # (~26 ms for 512x512x3 over this tunnel) overlaps the next image's
    # compute — exactly how serve/engine.py harvests decodes. Every image
    # still reaches the host inside the timed window.
    n_tp = 4 if quick else 10
    latents = [
        sd.initial_latent(jax.random.key(i + 2), batch, cfg, dtype)
        for i in range(n_tp)
    ]
    for lat in latents:
        sync(lat)  # upload outside the timed window
    t0 = time.perf_counter()
    prev = None
    for lat in latents:
        img = sd.generate(params, ids, uids, lat, guidance, num_steps=steps, cfg=cfg)
        if prev is not None:
            np.asarray(prev)
        prev = img
    np.asarray(prev)
    total = time.perf_counter() - t0
    images_per_sec = n_tp * batch / total
    log(f"throughput: {n_tp} images in {total:.3f}s  ({images_per_sec:.3f} img/s, "
        f"readback overlapped with compute)")

    baseline_file = Path(__file__).parent / "bench_baseline.json"
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())["images_per_sec_per_chip"]
        vs = images_per_sec / base
    else:
        vs = 1.0

    print(json.dumps({
        "metric": "images_per_sec_per_chip_sd15_512x512_20step_cfg",
        "value": round(images_per_sec, 4),
        "unit": "images/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
