"""Numerics policy knobs for the ops layer.

accum_dtype():
  float32 (default) — matmuls/convs request fp32 accumulation via
  preferred_element_type and bias/scale epilogues run in fp32. Safest.
  None ("fast") — preferred_element_type follows the compute dtype; on
  backends that would otherwise materialize fp32 intermediates between
  fused regions this halves activation traffic. Set
  TINYFUSERS_FAST_ACCUM=1 or call set_fast_accum(True).

MXU accumulation is fp32 internally on TPU either way; this only governs
the dtype of values leaving a fused region.

TRACE-TIME KNOBS: every knob here is read at trace time and does NOT
participate in jit cache keys. Set knobs (env var or setter) at process
start, before the first compilation of any function that consults them;
flipping one after a model has compiled silently leaves the already-
traced dispatch in place for that compiled program. The setters exist
for tests and benchmarks, which compile fresh callables per setting.
"""
from __future__ import annotations

import os

import jax.numpy as jnp

_fast = os.environ.get("TINYFUSERS_FAST_ACCUM", "0") not in ("0", "", "false")
_quant_kernel = os.environ.get("TINYFUSERS_QUANT_KERNEL", "0") not in ("0", "", "false")
_conv_gemm = os.environ.get("TINYFUSERS_CONV_GEMM", "1") not in ("0", "", "false")


def set_fast_accum(on: bool) -> None:
    global _fast
    _fast = on


def fast_accum() -> bool:
    return _fast


def accum_dtype(compute_dtype):
    return compute_dtype if _fast else jnp.float32


def set_quant_kernel(on: bool) -> None:
    """Route quantized linears through the Pallas fused dequant-matmul
    (kernels/quant_matmul.py) instead of the XLA epilogue fallback."""
    global _quant_kernel
    _quant_kernel = on


def quant_kernel() -> bool:
    return _quant_kernel


def set_conv_gemm(on: bool) -> None:
    """Route eligible stride-1 3x3 convs through the 9-shifted-GEMM
    decomposition (ops/conv.py _gemm9_eligible) instead of the XLA conv
    emitter. Default on — measured 15-32% faster at SD's channel-heavy
    conv shapes on v5e (benchmarks/conv_ab.py); ineligible shapes always
    use the conv emitter."""
    global _conv_gemm
    _conv_gemm = on


def conv_gemm() -> bool:
    return _conv_gemm


_ff_kernel = os.environ.get("TINYFUSERS_FF_KERNEL", "1") not in ("0", "", "false")


def set_ff_kernel(on: bool) -> None:
    """Route the transformer FF tail (GEGLU -> out-projection) through
    the Pallas fused kernel (kernels/geglu_ff.py) instead of XLA's
    gelu-fused GEMM. Default ON: the round-5 whole-model A/B on v5e
    measured -3.3% UNet fwd (16.68 vs 17.26 ms back-to-back; every
    kernel config beat the XLA path across 8 runs — BASELINE.md
    round-5 FF-kernel section). TINYFUSERS_FF_KERNEL=0 reverts."""
    global _ff_kernel
    _ff_kernel = on


def ff_kernel() -> bool:
    return _ff_kernel
