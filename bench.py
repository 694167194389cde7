"""Benchmark harness: SD1.5 512x512, 20-step DDIM, CFG 7.5, one chip.

Prints ONE JSON line whose headline is pipelined throughput (the serving
number: dispatch is async, image i's D2H readback overlaps image i+1's
compute, every image still lands on the host inside the timed window).

The line is self-auditing (round-3 verdict items 2/3):
  serial_p50_s / serial_images_per_sec — each image fully on the host
    before the next starts. The serial series is what rounds 1-2
    measured; ``vs_baseline`` is serial-vs-serial against the round-1
    first light in bench_baseline.json, so the multiplier never mixes a
    harness change with a real optimization.
  device_ms_per_image — trace-derived on-device busy time per image,
    so a wall-clock regression can be told apart from tunnel jitter
    (the axon tunnel adds +-15-35 ms readback noise per image; round 3's
    driver run showed a serial p50 of 0.893 s vs 0.511 s in-session with
    identical device work).
  compile_s / persistent_cache_new_entries — cold-start cost and
    whether the persistent compilation cache actually hit.

The reference (Fatlonder/tinyfusers) publishes no numbers (BASELINE.md),
so baselines are our own recorded first-light numbers. Weights are
seeded-random (no checkpoint assets in this environment); FLOPs and
memory traffic are identical to real weights.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

CACHE_DIR = "/root/.cache/jax_comp"
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    """block_until_ready is unreliable on this platform's tunnel — a host
    readback is the only trustworthy sync point."""
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def fast_random_params(cfg, dtype, seed=0):
    """Random weights built ON DEVICE from one small uploaded pool.

    Rounds 1-3 built each leaf host-side with numpy and paid a ~1 GB H2D
    upload over the tunnel (42.8 s in the r2 driver run, 121.7 s in r3 —
    the unexplained growth was tunnel throughput variance, not code).
    Here the host uploads a single 4 MB pool once and ONE jitted program
    tiles it into every leaf on device: H2D is ~4 MB total and the build
    is HBM-write-bound (sub-second for SD1.5's ~1B params). Each leaf is
    a distinct buffer, so HBM footprint and read traffic match real
    weights; values are recycled, which throughput doesn't see.
    """
    from tinyfusers_tpu.pipeline import sd

    shapes = jax.eval_shape(lambda: sd.init(jax.random.key(0), cfg, dtype=dtype))
    rng = np.random.default_rng(seed)
    pool = jnp.asarray(rng.standard_normal(1 << 20).astype(np.float32) * 0.02)

    # One jitted builder per DISTINCT (shape, dtype) GROUP, returning all
    # ``count`` copies of that shape as separate outputs in ONE dispatch —
    # SD1.5 has 954 leaves but only ~80 distinct shapes, so this is ~80
    # compiles (persistently cached) and ~80 dispatches. The round-4
    # variant dispatched per LEAF (954 calls); at the axon tunnel's
    # ~0.1 s/dispatch that alone was ~95 s of the driver's observed
    # 75-133 s init. Each copy slices the tiled pool at a different
    # offset, so outputs are distinct values in distinct buffers (no XLA
    # output aliasing) and HBM footprint/read traffic match real weights.
    # (A single jit over the whole 954-output tree measured 202 s to
    # compile; per-leaf host numpy + H2D measured 43-122 s of tunnel
    # upload. This path: ~4 MB H2D + device-side tiling.)
    leaves, treedef = jax.tree.flatten(shapes)
    groups = {}  # (shape, dtype str) -> leaf count
    for leaf in leaves:
        key = (leaf.shape, str(leaf.dtype))
        groups[key] = groups.get(key, 0) + 1

    built = {}
    for (shape, dts), count in groups.items():
        n = 1
        for s in shape:
            n *= s
        reps = -(-(n + count) // pool.size)

        @jax.jit
        def b(p, n=n, reps=reps, shape=shape, dt=jnp.dtype(dts), count=count):
            flat = jnp.tile(p, reps)
            return tuple(flat[i:i + n].reshape(shape).astype(dt)
                         for i in range(count))

        built[(shape, dts)] = list(b(pool))

    out_leaves = [built[(leaf.shape, str(leaf.dtype))].pop()
                  for leaf in leaves]
    params = jax.tree.unflatten(treedef, out_leaves)
    sync(params)
    return params


def _cache_entries():
    try:
        return len(os.listdir(CACHE_DIR))
    except OSError:
        return 0


def main():
    quick = "--quick" in sys.argv
    steps = 20
    batch = 1

    from tinyfusers_tpu.pipeline import sd
    from tinyfusers_tpu.utils.profiling import device_time_from_trace

    cfg = sd.SD15
    dtype = jnp.bfloat16
    log(f"devices: {jax.devices()}")

    t0 = time.monotonic()
    params = fast_random_params(cfg, dtype)
    init_s = time.monotonic() - t0
    log(f"init params (on-device build): {init_s:.1f}s")

    ids = jnp.full((batch, 77), 49407, jnp.int32).at[:, 0].set(49406)
    uids = ids
    latent = sd.initial_latent(jax.random.key(1), batch, cfg, dtype)
    guidance = jnp.float32(7.5)

    cache_before = _cache_entries()
    t0 = time.monotonic()
    img = sd.generate(params, ids, uids, latent, guidance, num_steps=steps, cfg=cfg)
    sync(img)
    compile_s = time.monotonic() - t0
    cache_new = _cache_entries() - cache_before
    t0 = time.monotonic()
    img = sd.generate(params, ids, uids, latent, guidance, num_steps=steps, cfg=cfg)
    sync(img)
    warm_s = time.monotonic() - t0
    log(f"first call (compile + weight residency): {compile_s:.1f}s "
        f"(persistent-cache new entries: {cache_new}; "
        f"{'MISS -> compiled' if cache_new else 'HIT or already warm'})")
    log(f"second call (steady state): {warm_s:.3f}s")

    # --- serial latency: each image fully on the host before the next ---
    n_runs = 3 if quick else 7
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        img = sd.generate(params, ids, uids, latent, guidance, num_steps=steps, cfg=cfg)
        np.asarray(img)  # e2e includes the image reaching the host
        times.append(time.perf_counter() - t0)
    times.sort()
    serial_p50 = times[len(times) // 2]
    serial_ips = batch / serial_p50
    log(f"serial e2e p50: {serial_p50:.3f}s  ({serial_ips:.3f} img/s; "
        f"spread {times[0]:.3f}-{times[-1]:.3f}s — tunnel readback jitter)")

    # --- device time per image, from a profiler trace (audit number) ---
    trace_dir = "/tmp/tf_bench_trace"
    n_trace = 3
    device_ms = None
    try:
        jax.profiler.start_trace(trace_dir)
        for i in range(n_trace):
            img = sd.generate(params, ids, uids, latent, guidance,
                              num_steps=steps, cfg=cfg)
        np.asarray(img)
        jax.profiler.stop_trace()
        dev_s = device_time_from_trace(trace_dir)
        if dev_s:
            device_ms = dev_s / n_trace * 1e3
            log(f"device busy time: {device_ms:.1f} ms/image (trace, {n_trace} runs)")
    except Exception as e:  # noqa: BLE001 — profiling is best-effort
        log(f"trace capture failed ({type(e).__name__}: {e}); "
            "device_ms_per_image unavailable")

    # --- pipelined throughput: readback overlaps next image's compute ---
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
    pipelined_ips = n_tp * batch / total
    log(f"pipelined throughput: {n_tp} images in {total:.3f}s  "
        f"({pipelined_ips:.3f} img/s)")

    # --- serving cold start: Engine time-to-first-image -----------------
    # First Engine use in this process: compiles encode/inject/step/decode
    # (persistent cache applies), then measures warm TTFI with the
    # programs hot. Tracks the Router-per-family cold-start cost the
    # round-4 verdict flagged as unbudgeted.
    ttfi_cold = ttfi_warm = None
    try:
        from tinyfusers_tpu.serve import Engine

        t0 = time.perf_counter()
        eng = Engine(params, cfg, num_slots=1)
        eng.submit(eng.make_request(np.asarray(ids[0]), np.asarray(uids[0]),
                                    num_steps=steps, seed=0))
        res = eng.run_until_idle()
        ttfi_cold = time.perf_counter() - t0
        assert len(res) == 1
        eng.stats["first_submit_t"] = eng.stats["first_result_s"] = None
        t0 = time.perf_counter()
        eng.submit(eng.make_request(np.asarray(ids[0]), np.asarray(uids[0]),
                                    num_steps=steps, seed=1))
        res = eng.run_until_idle()
        ttfi_warm = time.perf_counter() - t0
        log(f"engine time-to-first-image: cold {ttfi_cold:.1f}s "
            f"(jit warmup incl.), warm {ttfi_warm:.3f}s")
    except Exception as e:  # noqa: BLE001 — observability, not the metric
        log(f"engine TTFI measurement failed ({type(e).__name__}: {e})")

    # vs_baseline provenance (round-4 advisor query, resolved from git):
    # bench_baseline.json's 1.5774 img/s was recorded by the round-1
    # harness's SERIAL loop (commit 2c201c1: generate -> np.asarray(img)
    # each iteration, value = 1/p50 with p50 = 0.634 s), so dividing
    # today's serial img/s by it is like-for-like.
    baseline_file = Path(__file__).parent / "bench_baseline.json"
    vs_serial = 1.0
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())
        vs_serial = serial_ips / base["images_per_sec_per_chip"]

    print(json.dumps({
        "metric": "images_per_sec_per_chip_sd15_512x512_20step_cfg",
        "value": round(pipelined_ips, 4),
        "unit": "images/s/chip",
        "vs_baseline": round(vs_serial, 3),
        "harness": "pipelined-throughput",
        "vs_baseline_basis": "serial-vs-serial (round-1 serial first light; "
                             "headline value is pipelined throughput)",
        "serial_p50_s": round(serial_p50, 4),
        "serial_images_per_sec": round(serial_ips, 4),
        "pipelined_images_per_sec": round(pipelined_ips, 4),
        "device_ms_per_image": round(device_ms, 1) if device_ms else None,
        "compile_s": round(compile_s, 1),
        "persistent_cache_new_entries": cache_new,
        "param_init_s": round(init_s, 1),
        "engine_ttfi_cold_s": round(ttfi_cold, 2) if ttfi_cold else None,
        "engine_ttfi_warm_s": round(ttfi_warm, 3) if ttfi_warm else None,
    }))


if __name__ == "__main__":
    main()
