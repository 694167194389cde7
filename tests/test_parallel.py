"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The key invariant: TP+DP sharded execution computes the same numbers as
single-device execution (GSPMD inserts collectives; results must agree)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tinyfusers_tpu import parallel
from tinyfusers_tpu.models import unet
from tinyfusers_tpu.pipeline import sd


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    return parallel.make_mesh(model=2)


def test_mesh_axes(mesh):
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_tp_specs_cover_attention(mesh):
    cfg = unet.TINY_CONFIG
    params = unet.init(jax.random.key(0), cfg)
    specs = parallel.tp_spec_tree(params)
    # at least one column- and one row-parallel leaf must exist
    flat = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    col = sum(1 for s in flat if s == P(None, "model"))
    row = sum(1 for s in flat if s == P("model", None))
    assert col > 0 and row > 0


def test_sharded_unet_matches_unsharded(mesh):
    cfg = unet.TINY_CONFIG
    params = unet.init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (4, 16, 16, 4))
    t = jnp.full((4,), 500.0)
    ctx = jax.random.normal(jax.random.key(2), (4, 8, cfg.context_dim))

    want = unet.apply(params, x, t, ctx, cfg)

    sp = parallel.shard_params(params, mesh)
    data_sh = NamedSharding(mesh, P("data"))
    xs = jax.device_put(x, data_sh)
    ts = jax.device_put(t, data_sh)
    cs = jax.device_put(ctx, data_sh)
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, a, b, c: unet.apply(p, a, b, c, cfg))(sp, xs, ts, cs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-3)


def test_dryrun_multichip_entrypoint():
    import importlib
    import sys
    sys.path.insert(0, "/root/repo")
    ge = importlib.import_module("__graft_entry__")
    ge.dryrun_multichip(8)


class TestRingAttention:
    def test_matches_full_attention(self, mesh):
        from tinyfusers_tpu.ops.attention import sdpa_xla
        from tinyfusers_tpu.parallel import ring_attention as ra

        # sequence axis sharded over the 4-way data axis
        bh, s, d = 2, 64, 16
        q = jax.random.normal(jax.random.key(0), (bh, s, d))
        k = jax.random.normal(jax.random.key(1), (bh, s, d))
        v = jax.random.normal(jax.random.key(2), (bh, s, d))
        want = sdpa_xla(q, k, v)

        sh = ra.sequence_sharded(mesh, "data", q.ndim)
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        got = ring_attention_call(qs, ks, vs, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-4)

    def test_cross_shard_dependency(self, mesh):
        """Tokens on shard 0 must attend to keys living on shard 3 —
        perturbing a remote key must change local outputs."""
        from tinyfusers_tpu.parallel import ring_attention as ra

        bh, s, d = 1, 64, 16
        q = jax.random.normal(jax.random.key(0), (bh, s, d))
        k = jax.random.normal(jax.random.key(1), (bh, s, d))
        v = jax.random.normal(jax.random.key(2), (bh, s, d))
        sh = ra.sequence_sharded(mesh, "data", 3)
        base = np.asarray(ring_attention_call(
            *(jax.device_put(x, sh) for x in (q, k, v)), mesh))
        k2 = k.at[0, -1].add(10.0)  # last token lives on the last shard
        new = np.asarray(ring_attention_call(
            *(jax.device_put(x, sh) for x in (q, k2, v)), mesh))
        # rows on the FIRST shard must see the change
        assert not np.allclose(base[0, :16], new[0, :16])


def ring_attention_call(q, k, v, mesh):
    from tinyfusers_tpu.parallel import ring_attention as ra

    with jax.set_mesh(mesh):
        return jax.jit(
            lambda a, b, c: ra.ring_attention(a, b, c, mesh=mesh, axis="data")
        )(q, k, v)


class TestTransformerBackboneTP:
    """TP parity for the DiT/MMDiT/SDXL backbones (VERDICT round-1 item 4:
    fused qkv was previously replicated and their attention out-proj
    misclassified column-parallel)."""

    def test_qkv_and_proj_specs(self, mesh):
        from tinyfusers_tpu.models import dit

        params = dit.init(jax.random.key(0), dit.TINY_DIT)
        specs = parallel.tp_spec_tree(params)
        blocks = specs["blocks"]
        # stacked (layers, in, out) weights: qkv column, attn proj row
        assert blocks["attn"]["qkv"]["weight"] == P(None, None, "model")
        assert blocks["attn"]["qkv"]["bias"] == P(None, "model")
        assert blocks["attn"]["proj"]["weight"] == P(None, "model", None)
        assert blocks["attn"]["proj"]["bias"] == P()
        assert blocks["mlp"]["fc1"]["weight"] == P(None, None, "model")
        assert blocks["mlp"]["fc2"]["weight"] == P(None, "model", None)
        # tiny unpatchify head stays replicated
        assert specs["final"]["proj"]["weight"] == P()

    def test_unet_geglu_specs_unchanged(self, mesh):
        cfg = unet.TINY_CONFIG
        params = unet.init(jax.random.key(0), cfg)
        specs = parallel.tp_spec_tree(params)
        found = []

        def visit(path, spec):
            names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
            if "ff" in names:
                found.append((names[-2], spec))

        jax.tree_util.tree_map_with_path(
            visit, specs, is_leaf=lambda x: isinstance(x, P))
        ff = dict((m, s) for m, s in found)
        assert ff["proj"] == P(None, "model")   # GEGLU up stays column
        assert ff["out"] == P("model", None)    # FF down stays row

    def test_sharded_dit_matches_unsharded(self, mesh):
        from tinyfusers_tpu.models import dit

        cfg = dit.TINY_DIT
        params = dit.init(jax.random.key(0), cfg)
        # perturb from zero-init mods so blocks aren't identity
        params = jax.tree.map(
            lambda x: x + 0.03 * jax.random.normal(jax.random.key(9), x.shape),
            params)
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, 4))
        t = jnp.full((4,), 500.0)

        want = dit.apply(params, x, t, cfg)
        sp = parallel.shard_params(params, mesh)
        data_sh = NamedSharding(mesh, P("data"))
        xs, ts = jax.device_put(x, data_sh), jax.device_put(t, data_sh)
        with jax.set_mesh(mesh):
            got = jax.jit(lambda p, a, b: dit.apply(p, a, b, cfg))(sp, xs, ts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-3)

    def test_sharded_mmdit_matches_unsharded(self, mesh):
        from tinyfusers_tpu.models import mmdit

        cfg = mmdit.TINY_MMDIT
        params = mmdit.init(jax.random.key(0), cfg)
        params = jax.tree.map(
            lambda x: x + 0.03 * jax.random.normal(jax.random.key(9), x.shape),
            params)
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, 4))
        t = jnp.full((4,), 0.5)
        ctx = jax.random.normal(jax.random.key(2), (4, 8, cfg.context_dim))
        pooled = jax.random.normal(jax.random.key(3), (4, cfg.pooled_dim))

        want = mmdit.apply(params, x, t, ctx, pooled, cfg)
        sp = parallel.shard_params(params, mesh)
        data_sh = NamedSharding(mesh, P("data"))
        args = [jax.device_put(a, data_sh) for a in (x, t, ctx, pooled)]
        with jax.set_mesh(mesh):
            got = jax.jit(
                lambda p, a, b, c, d: mmdit.apply(p, a, b, c, d, cfg)
            )(sp, *args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-3)

    def test_sharded_sdxl_unet_matches_unsharded(self, mesh):
        from tinyfusers_tpu.pipeline import sdxl

        cfg = sdxl.TINY_XL.unet
        params = unet.init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (4, 16, 16, 4))
        t = jnp.full((4,), 500.0)
        ctx = jax.random.normal(jax.random.key(2), (4, 8, cfg.context_dim))
        adm = jax.random.normal(jax.random.key(3), (4, cfg.adm_in_channels))

        want = unet.apply(params, x, t, ctx, cfg, adm_cond=adm)
        sp = parallel.shard_params(params, mesh)
        data_sh = NamedSharding(mesh, P("data"))
        args = [jax.device_put(a, data_sh) for a in (x, t, ctx, adm)]
        with jax.set_mesh(mesh):
            got = jax.jit(
                lambda p, a, b, c, d: unet.apply(p, a, b, c, cfg, adm_cond=d)
            )(sp, *args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-3)


class TestRingWiring:
    """Ring attention wired into the real model forwards (VERDICT round-1
    item 5: it was shelf-ware — correct but unreachable)."""

    def test_unet_ring_matches_dense(self, mesh):
        import dataclasses

        cfg = unet.TINY_CONFIG
        params = unet.init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (4, 16, 16, 4))
        t = jnp.full((4,), 500.0)
        ctx = jax.random.normal(jax.random.key(2), (4, 8, cfg.context_dim))
        want = unet.apply(params, x, t, ctx, cfg)

        rcfg = dataclasses.replace(cfg, self_attn_impl="ring:model,data")
        sp = parallel.shard_params(params, mesh)
        data_sh = NamedSharding(mesh, P("data"))
        args = [jax.device_put(a, data_sh) for a in (x, t, ctx)]
        with jax.set_mesh(mesh):
            got = jax.jit(
                lambda p, a, b, c: unet.apply(p, a, b, c, rcfg))(sp, *args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-3)

    def test_mmdit_ring_nondivisible_tokens(self, mesh):
        """MMDiT joint attention: 16 img + 7 txt = 23 tokens — NOT
        divisible by the 2-way model axis; exercises the ring pad+mask."""
        import dataclasses

        from tinyfusers_tpu.models import mmdit

        cfg = dataclasses.replace(mmdit.TINY_MMDIT, context_len=7)
        params = mmdit.init(jax.random.key(0), cfg)
        params = jax.tree.map(
            lambda x: x + 0.03 * jax.random.normal(jax.random.key(9), x.shape),
            params)
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, 4))
        t = jnp.full((4,), 0.5)
        ctx = jax.random.normal(jax.random.key(2), (4, 7, cfg.context_dim))
        pooled = jax.random.normal(jax.random.key(3), (4, cfg.pooled_dim))
        want = mmdit.apply(params, x, t, ctx, pooled, cfg)

        rcfg = dataclasses.replace(cfg, attn_impl="ring:model,data")
        sp = parallel.shard_params(params, mesh)
        data_sh = NamedSharding(mesh, P("data"))
        args = [jax.device_put(a, data_sh) for a in (x, t, ctx, pooled)]
        with jax.set_mesh(mesh):
            got = jax.jit(
                lambda p, a, b, c, d: mmdit.apply(p, a, b, c, d, rcfg)
            )(sp, *args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-3)

    def test_sd_generate_ring_e2e(self, mesh):
        """End-to-end sampled image on the virtual mesh with sequence
        sharding active in the UNet self-attention, matching the
        unsharded pipeline bits-close (uint8 pixels)."""
        import dataclasses

        cfg = sd.TINY
        params = sd.init(jax.random.key(0), cfg)
        ids = jnp.zeros((4, cfg.clip.max_length), jnp.int32)
        latent = sd.initial_latent(jax.random.key(1), 4, cfg)
        want = sd.generate(params, ids, ids, latent, jnp.float32(7.5),
                           num_steps=2, cfg=cfg)

        rcfg = dataclasses.replace(
            cfg, unet=dataclasses.replace(
                cfg.unet, self_attn_impl="ring:model,data"))
        sp = {k: parallel.shard_params(v, mesh) for k, v in params.items()}
        data_sh = NamedSharding(mesh, P("data"))
        ids_s = jax.device_put(ids, data_sh)
        lat_s = jax.device_put(latent, data_sh)
        with jax.set_mesh(mesh):
            got = sd.generate(sp, ids_s, ids_s, lat_s, jnp.float32(7.5),
                              num_steps=2, cfg=rcfg)
        diff = np.abs(np.asarray(got).astype(np.int32)
                      - np.asarray(want).astype(np.int32))
        assert diff.max() <= 1, f"max pixel diff {diff.max()}"


class TestPipelineParallel:
    """GPipe over scan-stacked blocks (parallel/pipeline.py): the
    pipelined schedule must compute exactly what the plain lax.scan
    computes, for any (stages, microbatches) split."""

    def _pipe_mesh(self, n_stages):
        import numpy as _np
        devs = _np.asarray(jax.devices()[:n_stages])
        return jax.sharding.Mesh(devs, (parallel.PIPE_AXIS,))

    @pytest.mark.parametrize("n_stages,microbatches", [(2, 2), (4, 2), (8, 4)])
    def test_linear_stack_matches_scan(self, n_stages, microbatches):
        L, b, d = 8, 4, 16
        ws = jax.random.normal(jax.random.key(0), (L, d, d)) * 0.1
        bs = jax.random.normal(jax.random.key(1), (L, d)) * 0.1
        x = jax.random.normal(jax.random.key(2), (b, d))
        stacked = {"w": ws, "b": bs}

        def blk(lp, c):
            return jnp.tanh(c @ lp["w"] + lp["b"])

        def scan_ref(p, c):
            y, _ = jax.lax.scan(lambda cc, lp: (blk(lp, cc), None), c, p)
            return y

        want = scan_ref(stacked, x)
        mesh = self._pipe_mesh(n_stages)
        got = parallel.pipeline_apply(
            blk, stacked, x, mesh=mesh, microbatches=microbatches)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-6)

    def test_carry_pytree_and_passthrough_cond(self):
        """Multi-leaf carry with a pass-through conditioning leaf (the
        MMDiT pattern: (img, txt, c))."""
        L, b, d = 4, 4, 8
        ws = jax.random.normal(jax.random.key(0), (L, d, d)) * 0.1
        x = jax.random.normal(jax.random.key(1), (b, d))
        cond = jax.random.normal(jax.random.key(2), (b, d))

        def blk(lp, carry):
            h, c = carry
            return (jnp.tanh(h @ lp + c), c)

        def scan_ref(p, h, c):
            (y, _), _ = jax.lax.scan(
                lambda cc, lp: (blk(lp, cc), None), (h, c), p)
            return y

        want = scan_ref(ws, x, cond)
        mesh = self._pipe_mesh(4)
        got, _ = parallel.pipeline_apply(
            blk, ws, (x, cond), mesh=mesh, microbatches=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-6)

    def test_mmdit_pipeline_matches_scan(self):
        """Full MMDiT forward with the trunk pipelined over 4 stages vs
        the plain scan (cfg.pipeline_microbatches static switch)."""
        import dataclasses

        from tinyfusers_tpu.models import mmdit

        cfg = mmdit.TINY_MMDIT
        params = mmdit.init(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, 4))
        t = jnp.full((4,), 0.5)
        ctx = jax.random.normal(jax.random.key(2), (4, 8, cfg.context_dim))
        pooled = jax.random.normal(jax.random.key(3), (4, cfg.pooled_dim))

        want = mmdit.apply(params, x, t, ctx, pooled, cfg)
        pcfg = dataclasses.replace(cfg, pipeline_microbatches=2)
        mesh = self._pipe_mesh(2)  # TINY depth=2 -> one layer per stage
        with jax.set_mesh(mesh):
            got = jax.jit(
                lambda p, a, b, c, d: mmdit.apply(p, a, b, c, d, pcfg)
            )(params, x, t, ctx, pooled)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
