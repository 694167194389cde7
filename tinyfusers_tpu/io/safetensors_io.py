"""Native safetensors reader (no safetensors-library dependency).

Format: 8-byte LE u64 header length, then a JSON header mapping tensor
name -> {dtype, shape, data_offsets: [start, end]} (offsets relative to
the end of the header), then the raw little-endian tensor payload. The
file is memory-mapped so tensors are materialized lazily — on TPU hosts
this lets weights stream zip-free from page cache straight into
device_put.

New capability vs the reference (pickle-only loading,
storage/unpicker.py); safetensors is the dominant SD weight format.
"""
from __future__ import annotations

import json
import mmap
from pathlib import Path
from typing import Dict, Iterator, Tuple

import numpy as np

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
    _F8_E4M3 = np.dtype(ml_dtypes.float8_e4m3fn)
    _F8_E5M2 = np.dtype(ml_dtypes.float8_e5m2)
except ImportError:  # pragma: no cover
    _BF16 = _F8_E4M3 = _F8_E5M2 = None

_DTYPES = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "BF16": _BF16,
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("<i1"),
    "U8": np.dtype("<u1"),
    "BOOL": np.dtype("?"),
    "F8_E4M3": _F8_E4M3,
    "F8_E5M2": _F8_E5M2,
}


class SafetensorsFile:
    def __init__(self, path):
        self.path = Path(path)
        with open(self.path, "rb") as f:
            header_len = int.from_bytes(f.read(8), "little")
            header = json.loads(f.read(header_len))
            self._data_start = 8 + header_len
        self.metadata = header.pop("__metadata__", {})
        self._index = header
        self._mm = None

    def _buffer(self):
        if self._mm is None:
            f = open(self.path, "rb")
            self._mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        return self._mm

    def keys(self):
        return self._index.keys()

    def __contains__(self, name):
        return name in self._index

    def get(self, name: str) -> np.ndarray:
        info = self._index[name]
        dtype = _DTYPES[info["dtype"]]
        if dtype is None:
            raise ValueError(f"dtype {info['dtype']} needs ml_dtypes")
        start, end = info["data_offsets"]
        buf = self._buffer()[self._data_start + start : self._data_start + end]
        return np.frombuffer(buf, dtype=dtype).reshape(info["shape"])

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for k in self._index:
            yield k, self.get(k)


def load_state_dict(path) -> Dict[str, np.ndarray]:
    return dict(SafetensorsFile(path).items())


def save_state_dict(state: Dict[str, np.ndarray], path) -> None:
    """Writer (save-side the reference never had, state.py:25-26 stub)."""
    rev = {v: k for k, v in _DTYPES.items() if v is not None}
    header = {}
    offset = 0
    blobs = []
    for name, arr in state.items():
        arr = np.asarray(arr)
        shape = list(arr.shape)  # before ascontiguousarray: it 1-d-ifies 0-d
        arr = np.ascontiguousarray(arr)
        key = rev[arr.dtype]
        nbytes = arr.nbytes
        header[name] = {
            "dtype": key,
            "shape": shape,
            "data_offsets": [offset, offset + nbytes],
        }
        blobs.append(arr.tobytes())
        offset += nbytes
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for b in blobs:
            f.write(b)
