"""Native (C++) host finalizers with lazy g++ build and ctypes binding.

The TPU owns the array math; the container's serial bit-level work (Rice
pack/unpack) is the host hot path, implemented in C++ with OpenMP over
streams (flo_tpu/native/rice.cpp) — the native equivalent of the reference's
Rust rice.rs. Falls back to the vectorized numpy implementation when no
toolchain is available, so importing never requires g++.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "rice.cpp"
_LIB_PATH = _DIR / "_librice.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmds = [
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
         str(_SRC), "-o", str(_LIB_PATH)],
        ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH)],
        ["cc", "-O2", "-shared", "-fPIC", "-x", "c++", str(_SRC), "-lstdc++",
         "-o", str(_LIB_PATH)],
    ]
    for cmd in cmds:
        try:
            res = subprocess.run(cmd, capture_output=True, timeout=120)
            if res.returncode == 0 and _LIB_PATH.exists():
                return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
                if not _build():
                    return None
            lib = ctypes.CDLL(str(_LIB_PATH))
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.rice_sizes.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i64p, i32p, i64p]
            lib.rice_encode_batch.argtypes = [
                i32p, ctypes.c_int64, ctypes.c_int64, i64p, i32p, i64p, u8p
            ]
            lib.rice_decode_batch.argtypes = [
                u8p, i64p, i64p, i32p, i64p, ctypes.c_int64, ctypes.c_int64, i32p
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def rice_encode_batch(rows: np.ndarray, ks: np.ndarray, lengths: np.ndarray):
    """C++ batch Rice pack; returns list of per-stream bytes or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    n, stride = rows.shape
    ks = np.ascontiguousarray(ks, dtype=np.int32)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    sizes = np.empty(n, dtype=np.int64)
    lib.rice_sizes(
        _ptr(rows, ctypes.c_int32), n, stride,
        _ptr(lengths, ctypes.c_int64), _ptr(ks, ctypes.c_int32),
        _ptr(sizes, ctypes.c_int64),
    )
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offsets[1:])
    total = int(offsets[-1] + sizes[-1]) if n else 0
    out = np.zeros(total, dtype=np.uint8)
    if total:
        lib.rice_encode_batch(
            _ptr(rows, ctypes.c_int32), n, stride,
            _ptr(lengths, ctypes.c_int64), _ptr(ks, ctypes.c_int32),
            _ptr(offsets, ctypes.c_int64), _ptr(out, ctypes.c_uint8),
        )
    buf = out.tobytes()
    return [buf[int(offsets[i]) : int(offsets[i] + sizes[i])] for i in range(n)]


def rice_decode_batch(blobs, ks, lengths, out_width: int):
    """C++ batch Rice unpack into [n, out_width] int32, or None."""
    lib = _load()
    if lib is None:
        return None
    n = len(blobs)
    blob_lens = np.array([len(b) for b in blobs], dtype=np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(blob_lens[:-1], out=offsets[1:])
    cat = np.frombuffer(b"".join(blobs), dtype=np.uint8) if n else np.zeros(0, np.uint8)
    cat = np.ascontiguousarray(cat)
    if cat.size == 0:
        cat = np.zeros(1, dtype=np.uint8)  # valid pointer for empty input
    ks = np.ascontiguousarray(ks, dtype=np.int32)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    out = np.zeros((n, out_width), dtype=np.int32)
    if n:
        lib.rice_decode_batch(
            _ptr(cat, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64),
            _ptr(blob_lens, ctypes.c_int64), _ptr(ks, ctypes.c_int32),
            _ptr(lengths, ctypes.c_int64), n, out_width,
            _ptr(out, ctypes.c_int32),
        )
    return out
