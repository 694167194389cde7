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


# ---------------------------------------------------------------------------
# Native shard loader (C++ native/loader.cpp): mmap + background prefetch
# ---------------------------------------------------------------------------

_DTYPE_CODES = {"float32": 0, "float16": 1, "bfloat16": 2, "int32": 3}
_CODE_DTYPES = {0: np.float32, 1: np.float16, 3: np.int32}


def _np_dtype(code: int):
    if code == 2:
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(_CODE_DTYPES[code])


def write_shard(path, *arrays: np.ndarray) -> None:
    """Write equal-length arrays to the TFLS shard format consumed by the
    native loader (native/loader.cpp): little-endian header, then each
    array contiguous at 64-byte alignment."""
    import struct

    n = arrays[0].shape[0]
    for a in arrays:
        if a.shape[0] != n:
            raise ValueError("all arrays must share the batch dim")
        if str(a.dtype) not in _DTYPE_CODES:
            raise ValueError(f"unsupported dtype {a.dtype}")
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x534C4654, 1, len(arrays)))
        for a in arrays:
            f.write(struct.pack("<II", _DTYPE_CODES[str(a.dtype)], a.ndim))
            f.write(struct.pack(f"<{a.ndim}Q", *a.shape))
        for a in arrays:
            pad = (-f.tell()) % 64
            f.write(b"\0" * pad)
            f.write(np.ascontiguousarray(a).tobytes())


class NativeShardDataset:
    """Shuffled batches over a TFLS shard via the C++ prefetching loader.

    Same epoch()/len() surface as LatentDataset, with one semantic
    difference: the native loader is a CONTINUOUS shuffled stream
    (reshuffled per full pass) that epoch() chunks into len(self)-batch
    runs — abandoning an epoch() iterator midway resumes the stream
    where it left off rather than starting a fresh permutation. Batches
    are gathered and staged by a background thread in native code, so
    host time between train steps is one memcpy per array. Raises if
    libtfnative.so is unavailable — use LatentDataset as the pure-Python
    fallback.
    """

    def __init__(self, path, *, batch_size: int, seed: int = 0,
                 shuffle: bool = True, prefetch: int = 2):
        import ctypes

        from ..native import get_lib

        lib = get_lib()
        if lib is None:
            raise RuntimeError(
                "libtfnative.so unavailable (make -C native); use "
                "LatentDataset instead")
        self._lib = lib
        self._h = lib.tf_loader_open(
            str(path).encode(), batch_size, seed, int(shuffle), prefetch)
        if not self._h:
            raise ValueError(f"could not open shard {path}")
        self.batch_size = batch_size
        self._n_records = lib.tf_loader_num_records(self._h)
        self._shapes = []
        self._dtypes = []
        for ai in range(lib.tf_loader_num_arrays(self._h)):
            nd = lib.tf_loader_ndim(self._h, ai)
            dims = (ctypes.c_ulong * nd)()
            lib.tf_loader_dims(self._h, ai, dims)
            self._shapes.append((batch_size, *list(dims)[1:]))
            self._dtypes.append(_np_dtype(lib.tf_loader_dtype(self._h, ai)))

    def __len__(self) -> int:
        return self._n_records // self.batch_size

    def epoch(self) -> Iterator[Tuple[np.ndarray, ...]]:
        import ctypes

        for _ in range(len(self)):
            if not self._lib.tf_loader_next(self._h):  # pragma: no cover
                return
            out = []
            for ai, (shape, dt) in enumerate(zip(self._shapes, self._dtypes)):
                buf = np.empty(shape, dt)
                self._lib.tf_loader_copy(
                    self._h, ai, buf.ctypes.data_as(ctypes.c_void_p))
                out.append(buf)
            yield tuple(out)

    def close(self) -> None:
        if self._h:
            self._lib.tf_loader_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
