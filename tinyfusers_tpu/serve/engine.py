"""Continuous-batching generation engine.

New capability — the reference serves exactly one hard-coded prompt from a
script (example/sd1.py). Design (diffusion-native continuous batching):

- The device holds S fixed slots: latents (S, h, w, c) and contexts
  (2S, T, D). The denoise step is ONE jitted function over all slots with
  per-slot timestep/alpha scalars — so requests at different progress
  points batch together, finished requests vacate at a step boundary, and
  queued requests join mid-flight. No recompiles (static shapes), no
  barrier on the longest request.
- Slot/queue bookkeeping lives in the C++ core (native/scheduler.cpp) via
  ctypes, with a pure-Python fallback.
- VAE decode runs per completion, jitted separately (batch of 1 slot) and
  dispatched asynchronously: the device array is enqueued, the tick
  returns immediately, and results are harvested on a later tick once the
  decode is ready (JAX dispatch is async; only the final host copy can
  block, and only when forced). Decode therefore never stalls the denoise
  cadence of other slots.
- CLIP encode is dispatched asynchronously at submit() (one batched
  [uncond ‖ cond] call per request, plus the seeded initial latent) and
  stays ON DEVICE: admission merges it into the slot state with a small
  jitted injection, so a tick with admissions never blocks the denoise
  cadence on encode round-trips (the round-3 engine read encodes back to
  host vectors inside step(), stalling every active slot per admission).
- Multi-host: the per-tick control vectors (t, alphas, guidance, active)
  are broadcast from process 0 (parallel.distributed.sync_decision) so
  every process feeds the jitted step identical inputs; submissions must
  be mirrored to all processes (same-order submit() calls everywhere —
  encode/latent dispatch is deterministic given mirrored submissions, so
  the injected device values agree across processes too; the
  cross-process bit-equality test in tests/test_multihost.py pins this).
"""
from __future__ import annotations

import ctypes
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models import unet as unet_model
from ..models import vae as vae_model
from ..pipeline import ddim, sd


@dataclass
class Request:
    request_id: int
    prompt_ids: np.ndarray       # (T,) int32 token ids
    uncond_ids: np.ndarray       # (T,)
    num_steps: int = 20
    guidance: float = 7.5
    seed: int = 0


@dataclass
class Result:
    request_id: int
    image: np.ndarray            # (H, W, 3) uint8


def _to_host(img) -> np.ndarray:
    """Fetch a (replicated) device image to host — via the local shard
    when the array spans other processes' devices."""
    if hasattr(img, "is_fully_addressable") and not img.is_fully_addressable:
        return np.asarray(img.addressable_data(0))
    return np.asarray(img)


class _PySchedulerCore:
    """Pure-Python fallback mirroring native/scheduler.cpp semantics."""

    def __init__(self, num_slots: int):
        self.queue: List = []
        self.slots = [None] * num_slots  # None | [request_id, remaining]

    def submit(self, rid: int, steps: int):
        self.queue.append((rid, steps))
        return len(self.queue)

    def assign(self):
        out = []
        for i, s in enumerate(self.slots):
            if s is None and self.queue:
                rid, steps = self.queue.pop(0)
                self.slots[i] = [rid, steps]
                out.append((rid, i, steps))
        return out

    def tick(self):
        done = []
        for i, s in enumerate(self.slots):
            if s is None:
                continue
            s[1] -= 1
            if s[1] <= 0:
                done.append((s[0], i))
                self.slots[i] = None
        return done

    def active(self):
        return sum(1 for s in self.slots if s is not None)

    def pending(self):
        return len(self.queue)

    def remaining(self, slot: int) -> int:
        s = self.slots[slot]
        return s[1] if s else 0


class _NativeSchedulerCore:
    def __init__(self, lib, num_slots: int):
        self._lib = lib
        self._h = lib.tf_sched_create(num_slots)
        self._cap = num_slots

    def submit(self, rid, steps):
        return self._lib.tf_sched_submit(self._h, rid, steps)

    def assign(self):
        req = (ctypes.c_long * self._cap)()
        slot = (ctypes.c_int * self._cap)()
        steps = (ctypes.c_int * self._cap)()
        n = self._lib.tf_sched_assign(self._h, req, slot, steps, self._cap)
        return [(req[i], slot[i], steps[i]) for i in range(n)]

    def tick(self):
        req = (ctypes.c_long * self._cap)()
        slot = (ctypes.c_int * self._cap)()
        n = self._lib.tf_sched_tick(self._h, req, slot, self._cap)
        return [(req[i], slot[i]) for i in range(n)]

    def active(self):
        return self._lib.tf_sched_active(self._h)

    def pending(self):
        return self._lib.tf_sched_pending(self._h)

    def remaining(self, slot):
        return self._lib.tf_sched_slot_steps_remaining(self._h, slot)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.tf_sched_destroy(self._h)


def make_scheduler_core(num_slots: int, prefer_native: bool = True):
    if prefer_native:
        from ..native import get_lib

        lib = get_lib()
        if lib is not None:
            return _NativeSchedulerCore(lib, num_slots)
    return _PySchedulerCore(num_slots)


class Engine:
    def __init__(
        self,
        params,
        cfg: sd.SDConfig = sd.SD15,
        *,
        num_slots: int = 4,
        prefer_native: bool = True,
        mesh=None,
        stage_window: Optional[int] = None,
    ):
        """mesh: optional jax.sharding.Mesh (data, model). Slots shard
        over the data axis, params should already be TP-sharded
        (parallel.shard_params) over the model axis. For multi-host use,
        the scheduler's admissions must be identical on all processes
        (parallel.distributed.sync_decision).

        stage_window: how many queued requests may hold pre-dispatched
        device state (CLIP context + initial latent) ahead of admission.
        Default 2x num_slots — deep queues stage O(slots), not O(queue),
        bounding HBM growth under bursty submitters while admissions
        still never block on an encode round-trip (the next window is
        topped up asynchronously as slots assign)."""
        self.params = params
        self.cfg = cfg
        self.S = num_slots
        self.mesh = mesh
        self.core = make_scheduler_core(num_slots, prefer_native)
        h, w, c = cfg.latent_shape
        dtype = jax.tree.leaves(params["unet"])[0].dtype
        self._dtype = dtype
        # np zeros (not jnp) so device_put can form GLOBAL arrays in
        # multi-process mode (np input = "same value on every host").
        self.latents = np.zeros((num_slots, h, w, c), jnp.dtype(dtype))
        t = cfg.clip.max_length
        d = cfg.clip.dim
        # contexts layout: [uncond(S) ‖ cond(S)] to match denoise batching
        self.contexts = np.zeros((2 * num_slots, t, d), jnp.dtype(dtype))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import DATA_AXIS

            assert num_slots % mesh.shape[DATA_AXIS] == 0, (
                "num_slots must divide evenly over the data axis"
            )
            data_sh = NamedSharding(mesh, P(DATA_AXIS))
            self.latents = jax.device_put(self.latents, data_sh)
            self.contexts = jax.device_put(self.contexts, data_sh)
            self._replicated = NamedSharding(mesh, P())
        else:
            self.latents = jnp.asarray(self.latents)
            self.contexts = jnp.asarray(self.contexts)
            self._replicated = None
        self.guidance = np.zeros((num_slots,), np.float32)
        self._steps_total: Dict[int, int] = {}   # slot -> total steps
        self._ladders: Dict[int, np.ndarray] = {}  # per distinct num_steps
        self._acp = np.asarray(ddim.alphas_cumprod())
        self._next_rid = 0
        self._requests: Dict[int, Request] = {}  # in-flight + queued only
        self._pending_decodes: List = []         # (rid, device image array)
        # rid -> (ctx2 (2,T,D) [uncond ‖ cond], lat0) device arrays,
        # dispatched asynchronously at submit() time — bounded to
        # stage_window requests; the overflow stages lazily as slots
        # free up (FIFO order matches the scheduler core's queue).
        self._staged: Dict[int, tuple] = {}
        self._unstaged: List[int] = []
        self.stage_window = (2 * num_slots if stage_window is None
                             else stage_window)
        # time-to-first-image observability (serving cold-start metric)
        self.stats = {"submitted": 0, "completed": 0,
                      "first_submit_t": None, "first_result_s": None}

        self._encode = jax.jit(
            lambda p, ids: sd.encode_text(p, ids, cfg)
        )

        def _inject_fn(latents, contexts, slot, lat0, ctx2):
            """Merge one admitted request's state into the slot arrays —
            pure device compute (dynamic_update_index at a traced slot),
            no host staging or readback."""
            s = latents.shape[0]
            latents = jax.lax.dynamic_update_index_in_dim(
                latents, lat0.astype(latents.dtype), slot, axis=0)
            contexts = jax.lax.dynamic_update_index_in_dim(
                contexts, ctx2[0].astype(contexts.dtype), slot, axis=0)
            contexts = jax.lax.dynamic_update_index_in_dim(
                contexts, ctx2[1].astype(contexts.dtype), slot + s, axis=0)
            return latents, contexts

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import DATA_AXIS

            data_sh = NamedSharding(mesh, P(DATA_AXIS))
            self._inject = jax.jit(
                _inject_fn, out_shardings=(data_sh, data_sh))
        else:
            self._inject = jax.jit(_inject_fn)
        def _decode_fn(vae_params, latents, slot):
            z = jax.lax.dynamic_index_in_dim(latents, slot, axis=0,
                                             keepdims=True)
            img = vae_model.to_image(vae_model.decode(vae_params, z, cfg.vae))
            return img[0]

        if self._replicated is not None:
            self._decode = jax.jit(_decode_fn, out_shardings=self._replicated)
        else:
            self._decode = jax.jit(_decode_fn)
        self._step = jax.jit(self._slot_step)

    # -- jitted per-tick step over all slots -----------------------------

    def _slot_step(self, unet_params, latents, contexts, guidance, t, a_t,
                   a_prev, active):
        """Denoise every slot by one step. All slot-state mutation is
        functional device compute (admissions were merged by _inject;
        global arrays are never indexed or .at[]-updated from host
        code — multi-host safe)."""
        s = latents.shape[0]
        lat2 = jnp.concatenate([latents, latents], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        eps = unet_model.apply(unet_params, lat2, t2, contexts, self.cfg.unet)
        e_u, e_c = eps[:s], eps[s:]
        e_t = ddim.cfg_combine(e_u, e_c, guidance[:, None, None, None])
        new = ddim.ddim_step(
            latents, e_t, a_t[:, None, None, None], a_prev[:, None, None, None]
        )
        keep = active[:, None, None, None]
        return jnp.where(keep, new, latents), contexts

    # -- public API ------------------------------------------------------

    def submit(self, req: Request) -> int:
        self.core.submit(req.request_id, req.num_steps)
        self._requests[req.request_id] = req
        if self.stats["first_submit_t"] is None:
            import time

            self.stats["first_submit_t"] = time.perf_counter()
        self.stats["submitted"] += 1
        # Dispatch the CLIP encode ([uncond ‖ cond] in one batched call)
        # and the seeded initial latent NOW, asynchronously — by the time
        # the request is admitted they are ready (or still in flight; the
        # injection consumes them on-device either way, never blocking
        # the tick on a host readback). Staging is bounded: only the
        # first stage_window queued requests hold device state; deeper
        # queue entries stage as admissions drain the window.
        if len(self._staged) < self.stage_window:
            self._stage(req)
        else:
            self._unstaged.append(req.request_id)
        return req.request_id

    def _stage(self, req: Request) -> None:
        ids2 = jnp.stack([jnp.asarray(req.uncond_ids),
                          jnp.asarray(req.prompt_ids)], axis=0)
        ctx2 = self._encode(self.params, ids2)
        lat0 = jax.random.normal(
            jax.random.key(req.seed), self.cfg.latent_shape, self._dtype)
        self._staged[req.request_id] = (ctx2, lat0)

    def reset(self) -> None:
        """Drop all queued/in-flight state but KEEP the compiled programs
        and device buffers — failure recovery must not pay the jit warmup
        again (the round-1 retry path rebuilt the Engine: a full
        recompile per failure)."""
        self.core = make_scheduler_core(
            self.S, isinstance(self.core, _NativeSchedulerCore))
        self._steps_total.clear()
        self._requests.clear()
        self._pending_decodes.clear()
        self._staged.clear()
        self._unstaged.clear()
        self.guidance[:] = 0.0

    def make_request(self, prompt_ids, uncond_ids, *, num_steps=20,
                     guidance=7.5, seed=0) -> Request:
        rid = self._next_rid
        self._next_rid += 1
        return Request(rid, np.asarray(prompt_ids), np.asarray(uncond_ids),
                       num_steps, guidance, seed)

    def _ladder(self, num_steps: int) -> np.ndarray:
        if num_steps not in self._ladders:
            # Shared pure-numpy schedule (ddim.ddim_timesteps_np) — one
            # source of truth with the device sampler's ladder; feeds
            # host scheduling (per-slot t/alpha lookups) so even its
            # one-time construction stays off the device.
            self._ladders[num_steps] = ddim.ddim_timesteps_np(num_steps)
        return self._ladders[num_steps]

    def step(self) -> List[Result]:
        """One scheduler tick: admit, denoise every active slot by one
        step, harvest completions. Returns decoded results.

        Admissions are merged on-device (_inject) from the encodes the
        submit() call already dispatched — the tick performs NO host
        readback (asserted by tests/test_serve.py); with >1 process the
        per-tick control vectors are broadcast from process 0, so all
        hosts feed the global arrays identical inputs."""
        for rid, slot, steps in self.core.assign():
            req = self._requests[rid]
            self._steps_total[slot] = steps
            self.guidance[slot] = req.guidance
            if rid not in self._staged:  # beyond the window: stage now
                self._unstaged.remove(rid)
                self._stage(req)
            ctx2, lat0 = self._staged.pop(rid)
            self.latents, self.contexts = self._inject(
                self.latents, self.contexts, jnp.int32(slot), lat0, ctx2)
        # Top the window back up (async dispatch, FIFO) so the NEXT
        # admissions find their encodes already in flight.
        while self._unstaged and len(self._staged) < self.stage_window:
            nxt = self._unstaged.pop(0)
            if nxt in self._requests:
                self._stage(self._requests[nxt])

        # Per-slot (t, a_t, a_prev) from remaining counts; inactive slots
        # get harmless identity values (a_t = a_prev = 1).
        t = np.zeros((self.S,), np.float32)
        a_t = np.ones((self.S,), np.float32)
        a_prev = np.ones((self.S,), np.float32)
        active = np.zeros((self.S,), bool)
        for slot in range(self.S):
            rem = self.core.remaining(slot)
            if rem <= 0:
                continue
            total = self._steps_total[slot]
            ladder = self._ladder(total)
            idx = rem - 1  # remaining steps -> position in ascending ladder
            ts = ladder[idx]
            t[slot] = float(ts)
            a_t[slot] = self._acp[ts]
            a_prev[slot] = self._acp[ladder[idx - 1]] if idx > 0 else 1.0
            active[slot] = True

        if jax.process_count() > 1:
            from ..parallel.distributed import sync_decision

            t, a_t, a_prev, active, guidance = sync_decision(
                (t, a_t, a_prev, active, self.guidance))
        else:
            guidance = self.guidance

        if active.any():
            self.latents, self.contexts = self._step(
                self.params["unet"], self.latents, self.contexts,
                jnp.asarray(guidance), jnp.asarray(t),
                jnp.asarray(a_t), jnp.asarray(a_prev), jnp.asarray(active),
            )

        for rid, slot in self.core.tick():
            # Async dispatch: enqueue the decode, harvest when ready.
            img = self._decode(self.params["vae"], self.latents,
                               jnp.int32(slot))
            self._pending_decodes.append((rid, img))
            self._steps_total.pop(slot, None)
            self._requests.pop(rid, None)
        return self._harvest(block=False)

    def _harvest(self, block: bool) -> List[Result]:
        done, still = [], []
        for rid, img in self._pending_decodes:
            ready = block
            if not ready:
                is_ready = getattr(img, "is_ready", None)
                ready = is_ready() if callable(is_ready) else True
            if ready:
                done.append(Result(rid, _to_host(img)))
                if self.stats["first_result_s"] is None:
                    import time

                    self.stats["first_result_s"] = (
                        time.perf_counter() - self.stats["first_submit_t"])
                self.stats["completed"] += 1
            else:
                still.append((rid, img))
        self._pending_decodes = still
        return done

    def flush(self) -> List[Result]:
        """Block for and return every outstanding decoded result."""
        return self._harvest(block=True)

    def run_until_idle(self, max_ticks: int = 10000) -> List[Result]:
        out = []
        for _ in range(max_ticks):
            if not (self.core.active() or self.core.pending()):
                break
            out.extend(self.step())
        out.extend(self.flush())
        return out
