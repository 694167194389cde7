"""Multi-host process-group setup and hybrid ICI/DCN meshes.

The multi-host counterpart of parallel/mesh.py (new capability; the
reference is single-GPU, SURVEY.md §2.6). On a TPU pod slice:

- jax.distributed.initialize() forms the process group (one process per
  host), giving every process a global view of all devices;
- the mesh is laid out hybrid: the ``model`` (TP) axis maps onto ICI
  within a slice, the ``data`` (batch/request) axis spans hosts over DCN
  — collectives for TP ride ICI, only batch-level traffic crosses DCN;
- host-side control decisions (e.g. the serving scheduler's admissions)
  must be identical on every process; sync_decision() broadcasts process
  0's choice.

Single-host (or CPU-mesh test) use degrades gracefully: initialize() is
a no-op when unconfigured, hybrid_mesh() falls back to a flat mesh.
"""
from __future__ import annotations

from typing import Optional



import jax
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Form the multi-host process group. Returns True if distributed
    mode is active. No-op (False) when no coordinator is configured and
    the environment provides none (single-host dev)."""
    import os

    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized
        pass
    return jax.process_count() > 1


def hybrid_mesh(model: int = 1) -> Mesh:
    """(data, model) mesh with the model axis packed inside a host's
    slice (ICI) and data spanning hosts (DCN)."""
    try:
        from jax.experimental import mesh_utils

        ndev = len(jax.devices())
        assert ndev % model == 0
        if jax.process_count() > 1:
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(len(jax.local_devices()) // model, model),
                dcn_mesh_shape=(jax.process_count(), 1),
            )
            return Mesh(devices, (DATA_AXIS, MODEL_AXIS))
    except Exception:
        pass
    return make_mesh(model=model)


def sync_decision(value):
    """Broadcast a host-side control decision (pytree of arrays/scalars)
    from process 0 to all processes so jitted programs see identical
    inputs everywhere. Identity on a single process."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(value)
