"""Sanity checks on the analytic FLOP counter (utils/flops.py).

Ground truth for the unrolled tiny UNet comes from XLA's compiled
cost_analysis (valid there: no scan-stacked towers in the UNet), which
pins the analytic walk to the real lowering within the tolerance of
XLA's elementwise accounting. Scanned models (MMDiT) get structural
checks instead — cost_analysis undercounts them by design.
"""
import numpy as np

import jax
import jax.numpy as jnp

from tinyfusers_tpu.models import mmdit, unet
from tinyfusers_tpu.utils import flops as F


def test_unet_flops_match_xla_cost_analysis():
    cfg = unet.TINY_CONFIG
    shapes = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), cfg, dtype=jnp.float32))

    def fwd(p):
        return unet.apply(p, jnp.zeros((2, 8, 8, 4)), jnp.full((2,), 1.0),
                          jnp.zeros((2, 7, cfg.context_dim)), cfg)

    comp = jax.jit(fwd).lower(shapes).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla_flops = float(ca.get("flops", 0.0))
    ours = F.unet_fwd_flops(cfg, 8, 8, 2, ctx_len=7)
    assert xla_flops > 0
    # ours counts matmul/conv FLOPs only; XLA adds elementwise/softmax.
    # They must agree within 25% and ours must not exceed XLA's total.
    assert ours <= xla_flops * 1.05, (ours, xla_flops)
    assert ours >= xla_flops * 0.70, (ours, xla_flops)


def test_scaling_relations():
    f1 = F.unet_fwd_flops(unet.SD15_CONFIG, 64, 64, 1)
    f2 = F.unet_fwd_flops(unet.SD15_CONFIG, 64, 64, 2)
    assert f2 == 2 * f1  # linear in batch
    fxl = F.unet_fwd_flops(unet.SDXL_CONFIG, 128, 128, 2)
    assert fxl > 4 * f2  # SDXL at 1024px is far bigger
    fm = F.mmdit_fwd_flops(mmdit.SD3_MEDIUM, 128, 128, 2)
    assert fm > fxl  # SD3-medium exceeds SDXL per forward
    # published round-4 figures stay pinned (catch accidental edits)
    assert abs(F.unet_fwd_flops(unet.SD15_CONFIG, 64, 64, 2) / 1e9
               - 1606.5) < 1.0
