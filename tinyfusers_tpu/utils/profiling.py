"""Profiling / observability utilities.

Replaces the reference's borrowed tinygrad GlobalCounters/Timing prints
(example/sd1.py:69-71) with native tools:

- Timer: wall-clock context manager with a *trustworthy* device sync
  (host readback — block_until_ready is a no-op on some TPU transports,
  e.g. tunneled single-chip dev setups).
- trace(): jax.profiler wrapper writing a TensorBoard-loadable trace.
- device_memory_stats(): HBM usage from the runtime.
- StepMetrics: rolling latency/throughput aggregator for serving loops.
"""
from __future__ import annotations

import contextlib
import statistics
import time
from typing import Dict, List, Optional

import numpy as np

import jax


def hard_sync(x) -> None:
    """Force completion of all computations producing x (readback-based)."""
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "addressable_shards"):
            np.asarray(jax.device_get(leaf)).ravel()[:1]


class Timer:
    """with Timer("unet step", sync_on=out) as t: ... ; t.seconds"""

    def __init__(self, name: str = "", sync_on=None, quiet: bool = False):
        self.name = name
        self._sync_on = sync_on
        self.quiet = quiet
        self.seconds: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync_on is not None:
            hard_sync(self._sync_on)
        self.seconds = time.perf_counter() - self._t0
        if not self.quiet and self.name:
            print(f"[timer] {self.name}: {self.seconds*1e3:.2f} ms")
        return False


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tinyfusers_trace"):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_time_from_trace(logdir: str) -> Optional[float]:
    """Total on-device busy time (seconds) from the newest trace under
    ``logdir``.

    Uses the TPU "XLA Modules" thread — one span per executed program,
    i.e. wall-clock device occupancy. (Summing the leaf-op "XLA Ops"
    thread instead OVERSTATES busy time: leaf events overlap in wall
    time across functional units / async DMA — measured 655 "ms" of
    leaf sums against 339 ms of module span for one SD1.5 image.)
    Returns None when no trace was written (the platform may not
    support profiling)."""
    import glob
    import gzip
    import json as _json

    traces = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        return None
    with gzip.open(traces[-1]) as fh:
        data = _json.load(fh)
    pids, modules_tids = {}, set()
    for e in data.get("traceEvents", []):
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name" and \
                e["args"].get("name") == "XLA Modules":
            modules_tids.add((e["pid"], e["tid"]))
    total_us = 0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        if (e["pid"], e.get("tid")) in modules_tids:
            total_us += e["dur"]
    return total_us / 1e6 if total_us else None


def device_memory_stats(device=None) -> Dict[str, int]:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


class StepMetrics:
    """Rolling window of step latencies -> p50/p95/throughput."""

    def __init__(self, window: int = 200):
        self.window = window
        self._lat: List[float] = []
        self._items = 0
        self._t_start = time.monotonic()

    def record(self, seconds: float, items: int = 1) -> None:
        self._lat.append(seconds)
        self._items += items
        if len(self._lat) > self.window:
            self._lat.pop(0)

    def summary(self) -> Dict[str, float]:
        if not self._lat:
            return {}
        lat = sorted(self._lat)
        return {
            "p50_s": statistics.median(lat),
            "p95_s": lat[min(len(lat) - 1, int(0.95 * len(lat)))],
            "mean_s": statistics.fmean(lat),
            "throughput_items_per_s": self._items / max(
                1e-9, time.monotonic() - self._t_start
            ),
        }
