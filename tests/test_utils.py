"""Utility-layer tests: numerics checking, profiling, logging, policy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinyfusers_tpu.ops import policy
from tinyfusers_tpu.utils import numerics
from tinyfusers_tpu.utils.logging import StepLogger, get_logger, kv
from tinyfusers_tpu.utils.profiling import StepMetrics, Timer, hard_sync


class TestNumerics:
    def test_tree_finite_report_clean(self):
        ok, bad = numerics.tree_finite_report({"a": jnp.ones(3)})
        assert ok and not bad

    def test_tree_finite_report_flags_nan(self):
        tree = {"w": jnp.array([1.0, jnp.nan]), "b": jnp.ones(2)}
        ok, bad = numerics.tree_finite_report(tree)
        assert not ok
        assert list(bad.values()) == [1]

    def test_checked_catches_nan(self):
        err, out = numerics.checked(lambda x: jnp.log(x))(jnp.array([-1.0]))
        with pytest.raises(Exception):
            err.throw()


class TestProfiling:
    def test_timer_and_sync(self):
        x = jnp.ones((8, 8)) * 2
        with Timer("t", sync_on=x, quiet=True) as t:
            y = x @ x
        hard_sync(y)
        assert t.seconds is not None and t.seconds >= 0

    def test_step_metrics(self):
        m = StepMetrics()
        for v in [0.1, 0.2, 0.3]:
            m.record(v)
        s = m.summary()
        assert abs(s["p50_s"] - 0.2) < 1e-9
        assert s["throughput_items_per_s"] > 0


class TestLogging:
    def test_kv_format(self):
        assert kv(a=1, b="x") == "a=1 b=x"

    def test_step_logger_no_crash(self):
        sl = StepLogger(every_s=0.0)
        sl.tick(x=1)
        sl.tick(x=2)


class TestPolicy:
    def test_fast_accum_pipeline_parity(self):
        """Tiny pipeline under fast-accum must track the fp32-epilogue
        output within a couple uint8 levels."""
        from tinyfusers_tpu.pipeline import sd

        cfg = sd.TINY
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            sd.init(jax.random.key(0), cfg),
        )
        ids = jnp.zeros((1, cfg.clip.max_length), jnp.int32)
        lat = sd.initial_latent(jax.random.key(1), 1, cfg, jnp.bfloat16)
        base = np.asarray(sd.generate(params, ids, ids, lat, jnp.float32(7.5),
                                      num_steps=2, cfg=cfg)).astype(int)
        policy.set_fast_accum(True)
        try:
            sd.generate.clear_cache()
            fast = np.asarray(sd.generate(params, ids, ids, lat, jnp.float32(7.5),
                                          num_steps=2, cfg=cfg)).astype(int)
        finally:
            policy.set_fast_accum(False)
            sd.generate.clear_cache()
        diff = np.abs(base - fast)
        assert diff.max() <= 8, diff.max()
        assert diff.mean() < 1.0, diff.mean()
