"""Serving engine tests: native C++ scheduler core parity with the Python
fallback, and continuous-batching correctness — a request's image must be
identical whether it ran alone or joined a busy batch mid-flight."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyfusers_tpu.pipeline import sd
from tinyfusers_tpu.serve import Engine, make_scheduler_core
from tinyfusers_tpu.serve.engine import _PySchedulerCore


def core_cases():
    cores = [lambda n: _PySchedulerCore(n)]
    from tinyfusers_tpu.native import get_lib

    if get_lib() is not None:
        cores.append(lambda n: make_scheduler_core(n, prefer_native=True))
    return cores


@pytest.mark.parametrize("make_core", core_cases())
class TestSchedulerCore:
    def test_fifo_assignment_and_completion(self, make_core):
        core = make_core(2)
        core.submit(10, 3)
        core.submit(11, 1)
        core.submit(12, 2)
        assigned = core.assign()
        assert [(r, s) for r, s, _ in assigned] == [(10, 0), (11, 1)]
        assert core.pending() == 1 and core.active() == 2

        done = core.tick()  # 10:2 left, 11 done
        assert done == [(11, 1)]
        assigned = core.assign()  # 12 takes slot 1
        assert assigned == [(12, 1, 2)]
        done = core.tick()  # 10:1, 12:1
        assert done == []
        done = core.tick()
        assert sorted(done) == [(10, 0), (12, 1)]
        assert core.active() == 0 and core.pending() == 0

    def test_remaining_counts(self, make_core):
        core = make_core(1)
        core.submit(5, 4)
        core.assign()
        assert core.remaining(0) == 4
        core.tick()
        assert core.remaining(0) == 3


class TestEngine:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        return cfg, params

    def _req(self, engine, cfg, seed, steps=3, prompt_tok=7):
        ids = np.full((cfg.clip.max_length,), prompt_tok, np.int32)
        uids = np.zeros((cfg.clip.max_length,), np.int32)
        return engine.make_request(ids, uids, num_steps=steps, seed=seed)

    def test_single_request_completes(self, setup):
        cfg, params = setup
        eng = Engine(params, cfg, num_slots=2)
        eng.submit(self._req(eng, cfg, seed=1))
        results = eng.run_until_idle()
        assert len(results) == 1
        img = results[0].image
        assert img.shape == (cfg.height, cfg.width, 3) and img.dtype == np.uint8

    def test_continuous_join_matches_solo(self, setup):
        """A request joining mid-flight must produce the same image as the
        same request running alone (per-slot t makes batching exact)."""
        cfg, params = setup

        solo = Engine(params, cfg, num_slots=2)
        solo.submit(self._req(solo, cfg, seed=5, steps=3))
        solo_img = solo.run_until_idle()[0].image

        eng = Engine(params, cfg, num_slots=2)
        eng.submit(self._req(eng, cfg, seed=1, steps=5, prompt_tok=3))
        eng.step()  # first request makes progress alone
        eng.step()
        late = self._req(eng, cfg, seed=5, steps=3)
        eng.submit(late)  # joins at tick 3 while slot 0 is mid-flight
        results = eng.run_until_idle()
        assert len(results) == 2
        got = {r.request_id: r.image for r in results}[late.request_id]
        np.testing.assert_array_equal(got, solo_img)

    def test_more_requests_than_slots(self, setup):
        cfg, params = setup
        eng = Engine(params, cfg, num_slots=2)
        reqs = [self._req(eng, cfg, seed=i, steps=2) for i in range(5)]
        for r in reqs:
            eng.submit(r)
        results = eng.run_until_idle()
        assert sorted(r.request_id for r in results) == [r.request_id for r in reqs]

    def test_memory_hygiene(self, setup):
        """Completed requests must not accumulate in engine bookkeeping."""
        cfg, params = setup
        eng = Engine(params, cfg, num_slots=2)
        for i in range(6):
            eng.submit(self._req(eng, cfg, seed=i, steps=2))
        results = eng.run_until_idle()
        assert len(results) == 6
        assert eng._requests == {}
        assert eng._pending_decodes == []
        assert eng._steps_total == {}
        assert eng._staged == {}

    def test_deep_queue_stages_o_slots(self, setup):
        """A deep submit burst must hold device state for O(slots)
        requests, not O(queue): staged-encode HBM is bounded by the
        stage_window (default 2x slots), the overflow staging lazily as
        admissions drain the window."""
        cfg, params = setup
        eng = Engine(params, cfg, num_slots=2)
        reqs = [self._req(eng, cfg, seed=i, steps=2) for i in range(100)]
        for r in reqs:
            eng.submit(r)
        assert len(eng._staged) == eng.stage_window == 4
        assert len(eng._unstaged) == 96
        eng.step()  # admits 2, tops the window back up
        assert len(eng._staged) == 4
        assert len(eng._unstaged) == 94
        results = eng.run_until_idle()
        assert sorted(r.request_id for r in results) == \
            [r.request_id for r in reqs]
        assert eng._staged == {} and eng._unstaged == []
        # observability: all results counted, first-image latency recorded
        assert eng.stats["completed"] == 100
        assert eng.stats["first_result_s"] > 0

    def test_admission_tick_does_no_host_readback(self, setup, monkeypatch):
        """The denoise cadence claim (engine docstring): encode is
        dispatched async at submit() and injected on-device, so a tick
        that admits requests must not force any device->host readback
        (np.asarray on a jax.Array) before returning."""
        import tinyfusers_tpu.serve.engine as engine_mod

        cfg, params = setup
        eng = Engine(params, cfg, num_slots=2)
        eng.submit(self._req(eng, cfg, seed=0, steps=4))
        eng.submit(self._req(eng, cfg, seed=1, steps=4, prompt_tok=3))
        # encode + initial latent already staged as device arrays
        assert len(eng._staged) == 2
        for ctx2, lat0 in eng._staged.values():
            assert isinstance(ctx2, jax.Array) and isinstance(lat0, jax.Array)

        readbacks = []
        real_asarray = np.asarray

        def spy(x, *a, **k):
            if isinstance(x, jax.Array):
                readbacks.append(x.shape)
            return real_asarray(x, *a, **k)

        monkeypatch.setattr(engine_mod.np, "asarray", spy)
        try:
            eng.step()  # admits both; no completions yet
        finally:
            monkeypatch.undo()
        assert readbacks == []
        # and the engine still completes both requests correctly
        assert len(eng.run_until_idle()) == 2

    def test_host_ladder_matches_ddim(self, setup):
        """Engine._ladder is a host-numpy mirror of ddim.ddim_timesteps
        (kept off-device so ticks never read back); pin the equality."""
        from tinyfusers_tpu.pipeline import ddim as ddim_mod

        cfg, params = setup
        eng = Engine(params, cfg, num_slots=1)
        for steps in (2, 4, 20, 50):
            np.testing.assert_array_equal(
                eng._ladder(steps), np.asarray(ddim_mod.ddim_timesteps(steps)))

    def test_reset_keeps_compiled_step(self, setup):
        """reset() reclaims scheduler state without touching the jitted
        programs (failure recovery must not re-warm the compile cache)."""
        cfg, params = setup
        eng = Engine(params, cfg, num_slots=2)
        step_fn, dec_fn = eng._step, eng._decode
        eng.submit(self._req(eng, cfg, seed=0, steps=4))
        eng.step()
        eng.reset()
        assert eng.core.active() == 0 and eng.core.pending() == 0
        assert eng._step is step_fn and eng._decode is dec_fn
        # engine still serves correctly after the reset
        eng.submit(self._req(eng, cfg, seed=1, steps=2))
        assert len(eng.run_until_idle()) == 1


class TestShardedEngine:
    def test_sharded_engine_matches_unsharded(self):
        """4 slots over a 4-way data axis + 2-way TP: completed images must
        match the single-device engine to within ±1 uint8 level.

        Tolerance rationale: TP splits each matmul's contraction across
        shards and all-reduces the partials, which reorders float sums.
        In bf16 that perturbs activations by O(2^-8) relative; a pixel
        flips only when its pre-quantization value lies within that
        perturbation of a x.5 uint8 boundary. The flip magnitude is
        therefore bounded (==1 level, asserted exactly) but the flip
        *fraction* is not a fixed constant — for random-weight outputs
        (near-uniform over levels) the expected fraction is
        ~2*delta/step ~ 0.1-0.4%, seed-dependent. We assert < 2%:
        ~5-10x above the observed range (0.10-0.13% across seeds), far
        below anything a real numerical bug (wrong shard reduction,
        stale slot state) produces — those flip >>10% of pixels and/or
        break the max<=1 bound."""
        from tinyfusers_tpu import parallel

        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)

        ids = np.full((cfg.clip.max_length,), 5, np.int32)
        uids = np.zeros((cfg.clip.max_length,), np.int32)

        def run(engine):
            for seed in range(3):
                engine.submit(engine.make_request(ids, uids, num_steps=2,
                                                  seed=seed))
            return {r.request_id: r.image for r in engine.run_until_idle()}

        plain = run(Engine(params, cfg, num_slots=4))

        mesh = parallel.make_mesh(model=2)
        sp = {k: parallel.shard_params(v, mesh) for k, v in params.items()}
        with jax.set_mesh(mesh):
            sharded = run(Engine(sp, cfg, num_slots=4, mesh=mesh))

        assert plain.keys() == sharded.keys()
        for k in plain:
            diff = np.abs(plain[k].astype(np.int16) - sharded[k].astype(np.int16))
            assert diff.max() <= 1, diff.max()
            assert (diff > 0).mean() < 0.02, (diff > 0).mean()

    def test_distributed_helpers_single_process(self):
        from tinyfusers_tpu.parallel import distributed

        assert distributed.initialize() is False
        mesh = distributed.hybrid_mesh(model=2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        assert distributed.sync_decision({"a": 1})["a"] == 1


class TestRouter:
    def test_mixed_models_complete(self):
        from tinyfusers_tpu.pipeline import sdxl
        from tinyfusers_tpu.serve import Router

        cfg_sd = sd.TINY
        params_sd = sd.init(jax.random.key(0), cfg_sd)
        # second "family": same arch but separate engine (stands in for
        # SDXL's separate static shapes)
        eng_a = Engine(params_sd, cfg_sd, num_slots=2)
        eng_b = Engine(params_sd, cfg_sd, num_slots=1)
        router = Router({"a": eng_a, "b": eng_b})

        ids = np.full((cfg_sd.clip.max_length,), 3, np.int32)
        uids = np.zeros_like(ids)
        rids = []
        for i in range(3):
            rids.append(router.submit("a" if i % 2 == 0 else "b", ids, uids,
                                      num_steps=2, seed=i))
        results = router.run_until_idle()
        assert sorted(r.request_id for r in results) == sorted(rids)
        h = router.health()
        assert h["a"]["failures"] == 0 and h["b"]["failures"] == 0

    def test_engine_failure_retries(self, monkeypatch):
        from tinyfusers_tpu.serve import Router

        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        eng = Engine(params, cfg, num_slots=1)
        router = Router({"m": eng}, max_retries=1)
        ids = np.full((cfg.clip.max_length,), 3, np.int32)
        rid = router.submit("m", ids, np.zeros_like(ids), num_steps=2)

        # first tick blows up; router must rebuild the engine + requeue
        calls = {"n": 0}
        orig_step = Engine.step

        def flaky_step(self):
            if calls["n"] == 0:
                calls["n"] += 1
                raise RuntimeError("injected device failure")
            return orig_step(self)

        monkeypatch.setattr(Engine, "step", flaky_step)
        compiled_step = eng._step
        results = router.run_until_idle()
        assert [r.request_id for r in results] == [rid]
        assert router.health()["m"]["failures"] == 1
        # recovery reused the same engine + compiled program (no re-jit)
        assert router.engines["m"] is eng
        assert eng._step is compiled_step
