"""Multi-model request router + failure handling.

BASELINE config 4 is "continuous batching of mixed SD1.5/SDXL requests";
jit programs have static shapes, so each model family runs its own
Engine (its own slots + compiled step), and the router:

- routes requests to the right engine by model key,
- round-robins step() across engines so no family starves,
- retries failed requests (device error surfaces as an exception from
  the jitted step — the slot is reclaimed and the request re-queued up
  to ``max_retries``; SURVEY §5 failure-detection requirement),
- exposes health: per-engine active/pending depths and failure counts.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List

from .engine import Engine, Request, Result
from ..utils.logging import get_logger, kv

log = get_logger("serve.router")


@dataclass
class _Tracked:
    request: Request
    model: str
    retries_left: int
    submitted_at: float = field(default_factory=time.monotonic)


class Router:
    def __init__(self, engines: Dict[str, Engine], *, max_retries: int = 1):
        """engines: model key -> Engine (e.g. {"sd15": ..., "sdxl": ...})."""
        assert engines, "need at least one engine"
        self.engines = engines
        self.max_retries = max_retries
        self._tracked: Dict[int, _Tracked] = {}
        self._next_rid = 0
        self.failures: Dict[str, int] = {k: 0 for k in engines}

    def submit(
        self,
        model: str,
        prompt_ids,
        uncond_ids,
        *,
        num_steps: int = 20,
        guidance: float = 7.5,
        seed: int = 0,
    ) -> int:
        eng = self.engines[model]
        rid = self._next_rid
        self._next_rid += 1
        req = Request(rid, prompt_ids, uncond_ids, num_steps, guidance, seed)
        self._tracked[rid] = _Tracked(req, model, self.max_retries)
        eng.submit(req)
        return rid

    def step(self) -> List[Result]:
        """One tick across every engine (round-robin); failed engines'
        in-flight requests are re-queued."""
        out: List[Result] = []
        for model, eng in self.engines.items():
            try:
                results = eng.step()
            except Exception as e:  # device/compile failure on this family
                self.failures[model] += 1
                log.warning(kv(event="engine_error", model=model, error=type(e).__name__))
                results = []
                self._requeue_engine(model, eng)
            for r in results:
                self._tracked.pop(r.request_id, None)
                out.append(r)
        return out

    def _requeue_engine(self, model: str, eng: Engine) -> None:
        # Reclaim every in-flight slot and resubmit surviving requests.
        # Engine.reset() keeps the compiled step/encode/decode programs —
        # recovery costs only the re-denoise of in-flight work, not a
        # fresh jit warmup.
        inflight = [t for t in self._tracked.values()
                    if t.model == model]
        eng.reset()
        for t in inflight:
            if t.retries_left <= 0:
                log.warning(kv(event="request_dropped", rid=t.request.request_id))
                self._tracked.pop(t.request.request_id, None)
                continue
            t.retries_left -= 1
            eng.submit(t.request)

    def run_until_idle(self, max_ticks: int = 10000) -> List[Result]:
        out: List[Result] = []
        for _ in range(max_ticks):
            if not self._tracked:
                break
            out.extend(self.step())
        return out

    def health(self) -> Dict[str, Dict[str, int]]:
        return {
            k: {
                "active": eng.core.active(),
                "pending": eng.core.pending(),
                "failures": self.failures[k],
            }
            for k, eng in self.engines.items()
        }
