"""Host-side data feeding for training: batch, shuffle, device_put with
a data-axis sharding.

Diffusion fine-tunes train on precomputed latents + text embeddings (the
VAE encoder and CLIP run offline once), so the pipeline is deliberately
array-based: any source that yields numpy arrays plugs in. Multi-host:
each process passes its local shard of the arrays;
``jax.make_array_from_process_local_data`` assembles the global batch.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS


class LatentDataset:
    """In-memory (latents, *conditioning) arrays with shuffled epochs.

    arrays: equal-length numpy arrays, batch leading. Yields tuples of
    per-batch numpy slices; drops the trailing partial batch (static
    shapes keep the train step compiled once).
    """

    def __init__(self, *arrays: np.ndarray, batch_size: int,
                 seed: int = 0, shuffle: bool = True):
        n = arrays[0].shape[0]
        for a in arrays:
            if a.shape[0] != n:
                raise ValueError("all arrays must share the batch dim")
        if batch_size > n:
            raise ValueError(f"batch_size {batch_size} > dataset size {n}")
        self.arrays = arrays
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.arrays[0].shape[0] // self.batch_size

    def epoch(self) -> Iterator[Tuple[np.ndarray, ...]]:
        n = self.arrays[0].shape[0]
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        for i in range(len(self)):
            idx = order[i * self.batch_size:(i + 1) * self.batch_size]
            yield tuple(a[idx] for a in self.arrays)


def shard_batch(batch: Sequence[np.ndarray], mesh: Optional[Mesh] = None):
    """device_put a host batch, sharded over the data axis (replicated
    over the model axis). Single-process path; multi-host uses
    make_global_batch."""
    if mesh is None:
        return tuple(jax.device_put(b) for b in batch)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(np.asarray(b), sh) for b in batch)


def make_global_batch(local_batch: Sequence[np.ndarray], mesh: Mesh):
    """Multi-host: each process contributes its local rows of the global
    batch (global batch = sum of local batches across processes)."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(b))
        for b in local_batch
    )
