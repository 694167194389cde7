"""Pipeline parallelism over scan-stacked transformer blocks (GPipe).

The DiT/MMDiT trunks stack identical blocks with params of shape
(L, ...) consumed by lax.scan (models/mmdit.py, models/dit.py). Pipeline
parallelism shards that leading L axis over a ``pipe`` mesh axis: each
device holds L/P consecutive layers, and microbatches stream through the
stages with lax.ppermute hops — point-to-point neighbour traffic, so the
pipe axis can ride DCN between hosts while TP stays on ICI
(SURVEY.md §2.6's new-capability scope; no reference analog).

Schedule: classic GPipe. With M microbatches and P stages the loop runs
M + P - 1 ticks; at tick t, stage s processes microbatch t - s (bubble
fraction (P-1)/(M+P-1)). All devices run the same program; stage
identity comes from lax.axis_index, so the whole schedule jits into one
XLA program with a single scan — no per-stage Python.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def _stage(block_fn: Callable, local_params, x):
    """Run this device's chunk of consecutive layers."""

    def body(c, lp):
        return block_fn(lp, c), None

    y, _ = jax.lax.scan(body, x, local_params)
    return y


def pipeline_scan(
    block_fn: Callable,
    local_params,
    carry,
    microbatches: int,
    axis_name: str = PIPE_AXIS,
):
    """Per-device GPipe loop — call INSIDE shard_map (or use
    pipeline_apply). ``carry`` is a pytree of (B, ...) activations; it is
    split into ``microbatches`` along the batch dim, streamed through the
    stages, and returned re-assembled (identical on every stage).

    block_fn(layer_params, carry) -> carry. Conditioning with a batch
    dim (e.g. MMDiT's modulation vector c) must travel in the carry so
    it is microbatched consistently; block_fn passes it through.
    """
    n_stages = jax.lax.axis_size(axis_name)
    pid = jax.lax.axis_index(axis_name)
    m = microbatches

    def split(x):
        b = x.shape[0]
        if b % m:
            raise ValueError(f"batch {b} not divisible by microbatches {m}")
        return x.reshape(m, b // m, *x.shape[1:])

    mb = jax.tree.map(split, carry)
    state = jax.tree.map(lambda x: jnp.zeros_like(x[0]), mb)
    out = jax.tree.map(jnp.zeros_like, mb)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(c, t):
        state, out = c
        # stage 0 injects microbatch t (clamped: ticks past M reuse the
        # last microbatch; the result is masked out downstream)
        inj_idx = jnp.minimum(t, m - 1)
        inj = jax.tree.map(lambda x: x[inj_idx], mb)
        x = jax.tree.map(
            lambda a, b: jnp.where(pid == 0, a, b), inj, state)
        y = _stage(block_fn, local_params, x)
        # the last stage completes microbatch t - (P-1)
        m_idx = t - (n_stages - 1)
        cl = jnp.clip(m_idx, 0, m - 1)
        write = jnp.logical_and(pid == n_stages - 1, m_idx >= 0)
        out = jax.tree.map(
            lambda o, yy: o.at[cl].set(jnp.where(write, yy, o[cl])),
            out, y)
        state = jax.tree.map(
            lambda yy: jax.lax.ppermute(yy, axis_name, perm), y)
        return (state, out), None

    (state, out), _ = jax.lax.scan(
        tick, (state, out), jnp.arange(m + n_stages - 1))
    # Deliver the finished activations to every stage (the caller's
    # post-trunk layers run replicated over the pipe axis): mask + psum.
    out = jax.tree.map(
        lambda o: jax.lax.psum(
            jnp.where(pid == n_stages - 1, o, jnp.zeros_like(o)),
            axis_name),
        out)
    return jax.tree.map(lambda o: o.reshape(-1, *o.shape[2:]), out)


def pipeline_apply(
    block_fn: Callable,
    stacked_params: Any,
    carry: Any,
    *,
    mesh: "Mesh | None" = None,
    microbatches: int,
    axis_name: str = PIPE_AXIS,
):
    """shard_map wrapper: shards stacked_params' leading (L) axis over
    ``axis_name``, replicates the activations, runs the GPipe loop, and
    returns the carry pytree (replicated). mesh=None uses the ambient
    mesh (jax.set_mesh). Other mesh axes are untouched here — compose
    batch sharding outside."""
    pspec = jax.tree.map(lambda _: P(axis_name), stacked_params)
    cspec = jax.tree.map(lambda _: P(), carry)
    ospec = jax.tree.map(lambda _: P(), carry)
    kwargs = {} if mesh is None else {"mesh": mesh}  # None: ambient mesh
    fn = jax.shard_map(
        functools.partial(
            pipeline_scan, block_fn, microbatches=microbatches,
            axis_name=axis_name),
        in_specs=(pspec, cspec),
        out_specs=ospec,
        check_vma=False,  # axis_index masking is intentionally device-varying
        **kwargs,
    )
    return fn(stacked_params, carry)
