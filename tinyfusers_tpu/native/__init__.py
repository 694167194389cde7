"""Native (C++) runtime components, loaded via ctypes.

Replaces the reference's native layer concept (ctypes over CUDA driver
libs + NVRTC-JIT kernels, reference tinyfusers/native/) the TPU way: the
*device* kernels live in Pallas (kernels/), while the *host* runtime hot
paths — BPE tokenizer, continuous-batching scheduler — are C++ in
native/*.cpp, compiled to libtfnative.so.

The library is built by `make -C native/` (repo root); if missing and a
compiler is available it is built on demand here. All consumers must
degrade gracefully to their pure-Python fallbacks when the library can't
be loaded.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_LIB_PATH = Path(__file__).parent / "libtfnative.so"
_SRC_DIR = Path(__file__).resolve().parent.parent.parent / "native"

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_build() -> bool:
    if not (_SRC_DIR / "Makefile").is_file():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_SRC_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.is_file()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded libtfnative, or None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.is_file() and not _try_build():
        _load_failed = True
        return None
    try:
        lib = _bind(ctypes.CDLL(str(_LIB_PATH)))
    except AttributeError:
        # stale libtfnative.so from an older commit (missing newer
        # symbols): rebuild once, then bind again or fall back
        try:
            _LIB_PATH.unlink()
        except OSError:
            pass
        if not _try_build():
            _load_failed = True
            return None
        try:
            lib = _bind(ctypes.CDLL(str(_LIB_PATH)))
        except (OSError, AttributeError):
            _load_failed = True
            return None
    except OSError:
        _load_failed = True
        return None
    _lib = lib
    return _lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare restype/argtypes for every exported symbol. Raises
    AttributeError when the .so predates a symbol (stale build)."""
    # BPE API
    lib.tf_bpe_create.restype = ctypes.c_void_p
    lib.tf_bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.tf_bpe_encode_words.restype = ctypes.c_int
    lib.tf_bpe_encode_words.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.tf_bpe_destroy.argtypes = [ctypes.c_void_p]
    # Scheduler API
    lib.tf_sched_create.restype = ctypes.c_void_p
    lib.tf_sched_create.argtypes = [ctypes.c_int]
    lib.tf_sched_submit.restype = ctypes.c_long
    lib.tf_sched_submit.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_int]
    lib.tf_sched_assign.restype = ctypes.c_int
    lib.tf_sched_assign.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.tf_sched_tick.restype = ctypes.c_int
    lib.tf_sched_tick.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.tf_sched_active.restype = ctypes.c_int
    lib.tf_sched_active.argtypes = [ctypes.c_void_p]
    lib.tf_sched_pending.restype = ctypes.c_int
    lib.tf_sched_pending.argtypes = [ctypes.c_void_p]
    lib.tf_sched_slot_steps_remaining.restype = ctypes.c_int
    lib.tf_sched_slot_steps_remaining.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tf_sched_destroy.argtypes = [ctypes.c_void_p]
    # Data-loader API
    lib.tf_loader_open.restype = ctypes.c_void_p
    lib.tf_loader_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_ulong,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.tf_loader_num_arrays.restype = ctypes.c_int
    lib.tf_loader_num_arrays.argtypes = [ctypes.c_void_p]
    lib.tf_loader_num_records.restype = ctypes.c_long
    lib.tf_loader_num_records.argtypes = [ctypes.c_void_p]
    lib.tf_loader_ndim.restype = ctypes.c_int
    lib.tf_loader_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tf_loader_dims.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_ulong)]
    lib.tf_loader_dtype.restype = ctypes.c_int
    lib.tf_loader_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.tf_loader_next.restype = ctypes.c_int
    lib.tf_loader_next.argtypes = [ctypes.c_void_p]
    lib.tf_loader_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.tf_loader_close.argtypes = [ctypes.c_void_p]
    return lib
