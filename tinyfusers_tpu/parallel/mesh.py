"""Device mesh construction.

New capability — the reference is strictly single-GPU (SURVEY.md §2.6).
Axis convention:

- ``data``: batch / request parallelism. Maps to DCN between hosts, ICI
  within a slice.
- ``model``: tensor parallelism (attention heads / FFN columns / conv
  output channels). Must stay on ICI.

jax.sharding.Mesh + NamedSharding + jit does the collective insertion
(all-gather / reduce-scatter ride ICI per the mesh layout).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    The model axis is innermost so it maps to physically adjacent devices
    (ICI neighbours) under the default device enumeration.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
