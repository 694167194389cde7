"""Training subsystem tests: objective math vs closed form, overfit
convergence on a tiny UNet, LoRA adapter isolation, EMA, DP+TP sharded
train step on the virtual mesh, checkpoint round-trip."""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tinyfusers_tpu import train
from tinyfusers_tpu.models import unet
from tinyfusers_tpu.pipeline import ddim


class TestObjectives:
    def test_eps_q_sample_closed_form(self):
        cfg = train.LossConfig(objective="eps")
        x0 = jnp.ones((2, 4, 4, 3))
        noise = jnp.full_like(x0, 2.0)
        t = jnp.array([10, 500])
        x_t, target = train.q_sample(x0, noise, t, cfg)
        acp = ddim.alphas_cumprod()
        for i, ti in enumerate([10, 500]):
            a = float(acp[ti])
            np.testing.assert_allclose(
                np.asarray(x_t[i]),
                np.sqrt(a) * 1.0 + np.sqrt(1 - a) * 2.0, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(target), np.asarray(noise))

    def test_v_target(self):
        cfg = train.LossConfig(objective="v")
        x0 = jnp.ones((1, 2, 2, 1))
        noise = jnp.full_like(x0, 2.0)
        t = jnp.array([100])
        _, target = train.q_sample(x0, noise, t, cfg)
        a = float(ddim.alphas_cumprod()[100])
        np.testing.assert_allclose(
            np.asarray(target),
            np.sqrt(a) * 2.0 - np.sqrt(1 - a) * 1.0, rtol=1e-6)

    def test_rf_target_and_interp(self):
        cfg = train.LossConfig(objective="rf")
        x0 = jnp.zeros((1, 2, 2, 1))
        noise = jnp.ones_like(x0)
        t = jnp.array([0.25])
        x_t, target = train.q_sample(x0, noise, t, cfg)
        np.testing.assert_allclose(np.asarray(x_t), 0.25, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(target), 1.0, rtol=1e-6)

    def test_rf_timesteps_in_unit_interval(self):
        cfg = train.LossConfig(objective="rf")
        t = train.sample_timesteps(jax.random.key(0), 512, cfg)
        assert t.dtype == jnp.float32
        assert float(t.min()) > 0.0 and float(t.max()) < 1.0

    def test_min_snr_weights(self):
        cfg = train.LossConfig(objective="eps", snr_gamma=5.0)
        t = jnp.array([0, 999])
        w = train.loss_weights(t, cfg)
        acp = ddim.alphas_cumprod()
        snr0 = float(acp[0] / (1 - acp[0]))  # huge at t=0
        assert np.isclose(float(w[0]), 5.0 / snr0, rtol=1e-5)
        assert np.isclose(float(w[1]), 1.0, rtol=1e-5)  # snr < gamma

    def test_weighted_loss(self):
        pred = jnp.zeros((2, 3))
        target = jnp.ones((2, 3))
        w = jnp.array([0.0, 2.0])
        assert float(train.diffusion_loss(pred, target, w)) == 1.0


def tiny_unet():
    cfg = unet.UNetConfig(
        in_channels=4, out_channels=4, model_channels=8,
        channel_mult=(1, 2), num_res_blocks=1, attention_levels=(0,),
        context_dim=16, num_groups=4, num_heads=2,
    )
    params = unet.init(jax.random.key(0), cfg)
    def apply_fn(p, x, t, ctx):
        return unet.apply(p, x, t, ctx, cfg)
    return params, apply_fn


class TestTrainStep:
    def test_overfit_tiny_unet(self):
        params, apply_fn = tiny_unet()
        opt = train.default_optimizer(3e-3, warmup_steps=0)
        step = train.make_train_step(apply_fn, opt)
        state = train.TrainState.create(params, opt)
        x0 = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
        ctx = jax.random.normal(jax.random.key(2), (2, 7, 16))
        first = None
        rng = jax.random.key(3)
        for i in range(30):
            # fixed rng -> fixed (t, noise): a pure regression target the
            # optimizer must drive down
            state, m = step(state, (x0, ctx), rng)
            if first is None:
                first = float(m["loss"])
        last = float(m["loss"])
        assert int(state.step) == 30
        assert np.isfinite(last)
        assert last < first * 0.5, (first, last)

    def test_ema_tracks_params(self):
        params, apply_fn = tiny_unet()
        opt = train.default_optimizer(1e-3)
        step = train.make_train_step(apply_fn, opt, ema_decay=0.5)
        state = train.TrainState.create(params, opt, ema=True)
        x0 = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
        ctx = jax.random.normal(jax.random.key(2), (2, 7, 16))
        # snapshot before the step: state is donated, buffers get deleted
        p_before = np.asarray(jax.tree.leaves(state.params)[0])
        state, _ = step(state, (x0, ctx), jax.random.key(3))
        e, p = jax.tree.leaves(state.ema_params)[0], jax.tree.leaves(state.params)[0]
        want = 0.5 * np.asarray(p_before, np.float32) + 0.5 * np.asarray(p, np.float32)
        np.testing.assert_allclose(np.asarray(e), want, rtol=1e-5, atol=1e-7)

    def test_remat_matches_no_remat(self):
        params, apply_fn = tiny_unet()
        opt = optax.sgd(1e-2)
        x0 = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
        ctx = jax.random.normal(jax.random.key(2), (2, 7, 16))
        outs = []
        for remat in (False, True):
            step = train.make_train_step(apply_fn, opt, remat=remat,
                                         donate=False)
            state = train.TrainState.create(params, opt)
            state, m = step(state, (x0, ctx), jax.random.key(3))
            outs.append((float(m["loss"]), jax.tree.leaves(state.params)[0]))
        assert np.isclose(outs[0][0], outs[1][0], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(outs[0][1]),
                                   np.asarray(outs[1][1]), rtol=1e-5,
                                   atol=1e-7)


class TestLoRA:
    def test_zero_init_delta_is_identity(self):
        params, apply_fn = tiny_unet()
        lora = train.init_lora(jax.random.key(0), params, rank=2)
        merged = train.merge(params, lora)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_targets_only_attention(self):
        params, _ = tiny_unet()
        lora = train.init_lora(jax.random.key(0), params, rank=2)
        flat = jax.tree_util.tree_flatten_with_path(lora)[0]
        names = {".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                          for k in path)
                 for path, _ in flat}
        assert any("to_q" in n for n in names)
        assert not any("norm" in n for n in names)

    def test_lora_train_updates_adapters_only(self):
        params, apply_fn = tiny_unet()
        opt = optax.adam(1e-2)
        lora = train.init_lora(jax.random.key(0), params, rank=2)
        step = train.make_lora_train_step(apply_fn, opt)
        state = train.TrainState.create(lora, opt)
        x0 = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
        ctx = jax.random.normal(jax.random.key(2), (2, 7, 16))
        first = None
        rng = jax.random.key(3)
        for _ in range(20):
            state, m = step(state, params, (x0, ctx), rng)
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first, (first, float(m["loss"]))
        # b started zero and must have moved
        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        bs = [leaf for path, leaf in flat
              if str(getattr(path[-1], "key", "")) == "b"]
        assert bs and any(float(jnp.abs(b).max()) > 0 for b in bs)


class TestShardedTrain:
    def test_dp_tp_train_step_runs_and_matches_dense(self):
        from tinyfusers_tpu import parallel
        from jax.sharding import NamedSharding, PartitionSpec as P

        params, apply_fn = tiny_unet()
        opt = optax.sgd(1e-2)
        step = train.make_train_step(apply_fn, opt, donate=False)
        x0 = jax.random.normal(jax.random.key(1), (4, 8, 8, 4))
        ctx = jax.random.normal(jax.random.key(2), (4, 7, 16))
        rng = jax.random.key(3)

        dense_state = train.TrainState.create(params, opt)
        dense_state, dense_m = step(dense_state, (x0, ctx), rng)

        mesh = parallel.make_mesh(model=2)
        sp = parallel.shard_params(params, mesh)
        data_sh = NamedSharding(mesh, P(parallel.DATA_AXIS))
        batch = (jax.device_put(x0, data_sh), jax.device_put(ctx, data_sh))
        state = train.TrainState.create(sp, opt)
        with jax.set_mesh(mesh):
            state, m = step(state, batch, rng)
        assert np.isclose(float(m["loss"]), float(dense_m["loss"]),
                          rtol=2e-4), (float(m["loss"]), float(dense_m["loss"]))
        got = jax.tree.leaves(state.params)[0]
        want = jax.tree.leaves(dense_state.params)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-5)

    def test_fsdp_train_step_matches_dense(self):
        """ZeRO-style FSDP: params + optimizer state sharded over the
        data axis (parallel.shard_fsdp). GSPMD inserts the weight
        all-gathers; one step must match the dense step and the big
        leaves must actually be partitioned across devices."""
        from tinyfusers_tpu import parallel
        from jax.sharding import NamedSharding, PartitionSpec as P

        params, apply_fn = tiny_unet()
        opt = optax.sgd(1e-2)
        step = train.make_train_step(apply_fn, opt, donate=False)
        x0 = jax.random.normal(jax.random.key(1), (4, 8, 8, 4))
        ctx = jax.random.normal(jax.random.key(2), (4, 7, 16))
        rng = jax.random.key(3)

        dense_state = train.TrainState.create(params, opt)
        dense_state, dense_m = step(dense_state, (x0, ctx), rng)

        mesh = parallel.make_mesh(model=2)  # data=4 x model=2
        state = train.TrainState.create(params, opt)
        # min_size=1: the tiny test UNet has no >=64k leaves, but the
        # sharding mechanics are identical.
        state = parallel.shard_fsdp(state, mesh, min_size=1)
        data_sh = NamedSharding(mesh, P(parallel.DATA_AXIS))
        batch = (jax.device_put(x0, data_sh), jax.device_put(ctx, data_sh))
        with jax.set_mesh(mesh):
            state, m = step(state, batch, rng)
        assert np.isclose(float(m["loss"]), float(dense_m["loss"]),
                          rtol=2e-4)
        # parity on every param leaf
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(dense_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-5)
        # at least one conv kernel must be data-axis sharded (TP rules
        # alone would leave convs replicated)
        specs = jax.tree.leaves(parallel.fsdp_spec_tree(
            state.params, mesh, min_size=1))
        assert any(parallel.DATA_AXIS in jax.tree.leaves(
            tuple(s for s in spec if s)) for spec in specs
            if spec is not None), specs

    def test_fsdp_spec_consistent_between_params_and_opt_state(self):
        """optax mu/nu mirror the param tree; trailing path names match,
        so each moment leaf gets exactly its param's spec."""
        from tinyfusers_tpu import parallel

        params, _ = tiny_unet()
        opt = optax.adam(1e-3)
        state = train.TrainState.create(params, opt)
        mesh = parallel.make_mesh(model=2)
        specs = parallel.fsdp_spec_tree(state, mesh, min_size=1)
        pspecs = jax.tree.leaves(specs.params)
        mu_specs = jax.tree.leaves(specs.opt_state[0].mu)
        nu_specs = jax.tree.leaves(specs.opt_state[0].nu)
        assert pspecs == mu_specs == nu_specs


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        params, apply_fn = tiny_unet()
        opt = train.default_optimizer(1e-3)
        # donate=False: the test re-uses `params` to build the restore
        # template after the step
        step = train.make_train_step(apply_fn, opt, ema_decay=0.99,
                                     donate=False)
        state = train.TrainState.create(params, opt, ema=True)
        x0 = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
        ctx = jax.random.normal(jax.random.key(2), (2, 7, 16))
        state, _ = step(state, (x0, ctx), jax.random.key(3))

        path = tmp_path / "train_state.safetensors"
        train.save_train_state(state, path)
        template = train.TrainState.create(params, opt, ema=True)
        restored = train.load_train_state(template, path)
        assert int(restored.step) == 1
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.opt_state),
                        jax.tree.leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestData:
    def test_latent_dataset_epochs(self):
        lat = np.arange(10 * 2, dtype=np.float32).reshape(10, 2)
        ctx = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
        ds = train.LatentDataset(lat, ctx, batch_size=4, seed=0)
        assert len(ds) == 2
        seen = []
        for b_lat, b_ctx in ds.epoch():
            assert b_lat.shape == (4, 2) and b_ctx.shape == (4, 3)
            # rows stay aligned across arrays
            np.testing.assert_array_equal(b_lat[:, 0] * 1.5, b_ctx[:, 0])
            seen.extend(b_lat[:, 0].tolist())
        assert len(set(seen)) == 8  # no duplicate rows within an epoch

    def test_shard_batch_on_mesh(self):
        from tinyfusers_tpu import parallel

        mesh = parallel.make_mesh(model=2)
        b = train.shard_batch([np.zeros((4, 3), np.float32)], mesh)[0]
        assert b.sharding.spec == jax.sharding.PartitionSpec(
            parallel.DATA_AXIS)


class TestNativeLoader:
    def _shard(self, tmp_path, n=10):
        lat = np.arange(n * 4, dtype=np.float32).reshape(n, 2, 2, 1)
        ctx = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
        ids = np.arange(n, dtype=np.int32)
        path = tmp_path / "data.tfls"
        train.write_shard(path, lat, ctx, ids)
        return path, lat, ctx, ids

    def test_unshuffled_matches_source(self, tmp_path):
        pytest.importorskip("ctypes")
        from tinyfusers_tpu.native import get_lib
        if get_lib() is None:
            pytest.skip("libtfnative unavailable")
        path, lat, ctx, ids = self._shard(tmp_path)
        ds = train.NativeShardDataset(path, batch_size=4, shuffle=False)
        assert len(ds) == 2
        batches = list(ds.epoch())
        ds.close()
        assert len(batches) == 2
        np.testing.assert_array_equal(batches[0][0], lat[:4])
        np.testing.assert_array_equal(batches[0][1], ctx[:4])
        np.testing.assert_array_equal(batches[1][2], ids[4:8])

    def test_shuffled_epochs_cover_and_differ(self, tmp_path):
        from tinyfusers_tpu.native import get_lib
        if get_lib() is None:
            pytest.skip("libtfnative unavailable")
        path, lat, ctx, ids = self._shard(tmp_path, n=16)
        ds = train.NativeShardDataset(path, batch_size=8, seed=3)
        e1 = np.concatenate([b[2] for b in ds.epoch()])
        e2 = np.concatenate([b[2] for b in ds.epoch()])
        ds.close()
        # each epoch is a permutation of all records...
        assert sorted(e1.tolist()) == list(range(16))
        assert sorted(e2.tolist()) == list(range(16))
        # ...and epochs differ (reshuffle)
        assert not np.array_equal(e1, e2)

    def test_bfloat16_roundtrip(self, tmp_path):
        from tinyfusers_tpu.native import get_lib
        if get_lib() is None:
            pytest.skip("libtfnative unavailable")
        import ml_dtypes

        lat = np.arange(8, dtype=np.float32).reshape(4, 2).astype(
            ml_dtypes.bfloat16)
        path = tmp_path / "bf16.tfls"
        train.write_shard(path, lat)
        ds = train.NativeShardDataset(path, batch_size=4, shuffle=False)
        [(got,)] = list(ds.epoch())[:1]
        ds.close()
        assert got.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            got.astype(np.float32), lat.astype(np.float32))


class TestTrainCLI:
    def test_train_lora_cli_loss_decreases(self, tmp_path):
        """The user-facing fine-tune surface (examples/train_lora.py) on
        synthetic data for a few hundred steps: loss must come down and
        adapters must save (the BASELINE training-subsystem drill at CI
        scale; the full-size TPU datum lives in BASELINE.md)."""
        import re
        import subprocess
        import sys

        out = tmp_path / "lora.safetensors"
        r = subprocess.run(
            [sys.executable, "examples/train_lora.py", "--preset", "tiny",
             "--cpu", "--steps", "200", "--batch", "4", "--rank", "4",
             "--log-every", "20", "--out", str(out)],
            capture_output=True, text=True,
            cwd=Path(__file__).resolve().parent.parent, timeout=900,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        losses = [float(m) for m in re.findall(r"loss ([0-9.]+)", r.stdout)]
        assert len(losses) >= 5
        # robust decrease check: mean of last 3 logs well below first log
        assert np.mean(losses[-3:]) < losses[0] * 0.9, losses
        assert out.exists()

    def test_train_full_cli_loss_decreases(self, tmp_path):
        """Full-parameter fine-tune surface (examples/train_full.py, no
        adapters): loss must come down, fine-tuned weights must save,
        and the AOT memory report must print (the round-5 boundary
        probe's CI-scale drill)."""
        import re
        import subprocess
        import sys

        out = tmp_path / "unet_ft.safetensors"
        r = subprocess.run(
            [sys.executable, "examples/train_full.py", "--preset", "tiny",
             "--cpu", "--steps", "300", "--batch", "4", "--lr", "3e-4",
             "--log-every", "50", "--out", str(out)],
            capture_output=True, text=True,
            cwd=Path(__file__).resolve().parent.parent, timeout=900,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        losses = [float(m) for m in re.findall(r"loss ([0-9.]+)", r.stdout)]
        assert len(losses) >= 4
        assert np.mean(losses[-2:]) < losses[0] * 0.92, losses
        assert "AOT step memory" in r.stdout
        assert out.exists()
