"""Pallas fused GEGLU -> output-projection: y = (gx * gelu(gate)) @ w + b.

Targets the FF-out GEMM family the round-4 roofline flagged as the last
exact-math headroom in SD1.5/SDXL: (M~8192, K=4C, N=C) with a
transcendental-producing LHS. On the XLA path the erf-GELU is fused into
the GEMM's operand feed and the whole family runs at ~1/3 the FF-in
rate; layout-level fixes measured null (BASELINE.md round-4). This
kernel computes the GEGLU on the VPU inside VMEM (never materialized to
HBM) immediately before each MXU call, split into ``nsub`` K-chunks so
the scheduler can overlap chunk s+1's VPU work with chunk s's MXU dot.

Semantics match ops.geglu + ops.linear: erf GELU (real SD checkpoints;
ops/activations.py gelu_erf), fp32 accumulation, bias in fp32, output in
x.dtype. Replaces reference ff/nn.py:5-12 GEGLU + ff/linear.py Linear as
one fused TPU op.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad(x, axis, mult):
    p = (-x.shape[axis]) % mult
    if p == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, p)
    return jnp.pad(x, widths)


def _erf(x):
    """erf for Pallas TPU (lax.erf has no Mosaic lowering): Abramowitz &
    Stegun 7.1.26, max abs error ~1.5e-7 — exact at fp32/bf16 scale."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-a * a))


def _kernel(gx_ref, gate_ref, w_ref, b_ref, o_ref, acc_ref, *, nk: int,
            nsub: int, compute_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk = gx_ref.shape[1]
    step = bk // nsub
    acc = acc_ref[:]
    for s in range(nsub):
        sl = pl.ds(s * step, step)
        gate = gate_ref[:, sl].astype(jnp.float32)
        # erf GELU in fp32 on the VPU (checkpoint semantics: gelu_erf)
        a = gx_ref[:, sl].astype(jnp.float32) * (
            0.5 * gate * (1.0 + _erf(gate * 0.7071067811865476)))
        acc += jax.lax.dot_general(
            a.astype(compute_dtype), w_ref[sl, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] + b_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "nsub", "interpret"))
def geglu_matmul(
    gx: jax.Array,
    gate: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    block_m: int = 512,
    block_n: int = 768,
    block_k: int = 1280,
    nsub: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """(gx * gelu_erf(gate)) @ w + b.

    gx/gate (..., K); w (K, N); b (N,) or None -> (..., N) in gx.dtype.

    Defaults are the round-5 v5e whole-model A/B winners (ab_unet.py
    --ff-blocks sweep): bm=512, bk=1280, and nsub=None = 128-wide
    VPU/MXU interleave chunks — the finest legal granularity measured
    fastest (16.68 vs 17.26 ms/fwd XLA baseline, -3.3%; coarser chunks
    gave back half the win).
    """
    *lead, kdim = gx.shape
    assert gate.shape == gx.shape, (gx.shape, gate.shape)
    assert w.shape[0] == kdim, (w.shape, kdim)
    n = w.shape[1]
    x2 = gx.reshape(-1, kdim)
    g2 = gate.reshape(-1, kdim)
    m = x2.shape[0]

    bm = min(block_m, max(8, m))
    bn = min(block_n, max(128, -(-n // 128) * 128))
    bk = min(block_k, kdim)
    while kdim % bk:  # k blocks must tile K exactly (no masking in-loop)
        bk -= 128
    ns = max(1, bk // 128) if nsub is None else nsub
    while bk % ns or (bk // ns) % 128:
        ns -= 1
    x2 = _pad(x2, 0, bm)
    g2 = _pad(g2, 0, bm)
    wp = _pad(w, 1, bn)
    bias = (b.reshape(1, -1) if b is not None
            else jnp.zeros((1, n), jnp.float32))
    bias = _pad(bias, 1, bn)

    grid = (x2.shape[0] // bm, wp.shape[1] // bn, kdim // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, nk=grid[2], nsub=ns,
                          compute_dtype=gx.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], wp.shape[1]), gx.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x2, g2, wp, bias)
    return out[:m, :n].reshape(*lead, n)


# -- differentiable wrapper (training path; flash kernels set the same
# pattern: Pallas forward, XLA backward with activation recompute) ---------

@jax.custom_vjp
def geglu_matmul_diff(gx, gate, w, b):
    """geglu_matmul with gradients: Pallas forward, XLA backward.
    ``b`` must be an array (pass zeros for no bias)."""
    return geglu_matmul(gx, gate, w, b)


def _diff_fwd(gx, gate, w, b):
    return geglu_matmul(gx, gate, w, b), (gx, gate, w)


def _diff_bwd(res, g):
    from ..ops.activations import geglu

    gx, gate, w = res
    kdim, n = w.shape
    g2 = g.reshape(-1, n)
    # a = geglu(gx, gate) recomputed in XLA (remat-style; the forward
    # never materialized it)
    a, geglu_vjp = jax.vjp(geglu, gx, gate)
    da = jnp.dot(g, w.T.astype(g.dtype),
                 preferred_element_type=jnp.float32).astype(a.dtype)
    dw = jnp.dot(a.reshape(-1, kdim).T, g2.astype(a.dtype),
                 preferred_element_type=jnp.float32).astype(w.dtype)
    db = jnp.sum(g2.astype(jnp.float32), axis=0)
    dgx, dgate = geglu_vjp(da)
    return dgx, dgate, dw, db


geglu_matmul_diff.defvjp(_diff_fwd, _diff_bwd)
