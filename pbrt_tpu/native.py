"""ctypes bridge to the native host components (native/pbrt_native.cpp).

Compiles the shared library on first use (g++ is baked into the image) and
caches it next to the source.  Every entry point has a pure-Python
fallback, so the package works without a toolchain; the native paths are
the production ones (SAH BVH build for 1M-triangle scenes, tokenizer for
multi-MB scene files).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger("pbrt_tpu")

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "pbrt_native.cpp"
_LIB = _NATIVE_DIR / "libpbrt_native.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_LIB), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        detail = getattr(e, "stderr", b"")
        log.warning("native build failed (%s); using Python fallbacks. %s",
                    e, detail[:500] if detail else "")
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SRC.exists():
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            log.warning("native load failed: %s", e)
            return None
        lib.bvh_build.restype = ctypes.c_int
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]
        lib.tokenize.restype = ctypes.c_int64
        lib.tokenize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def bvh_build_native(p0, p1, p2, leaf_size=4):
    """SAH BVH build; returns the same tuple as accel.bvh.build_bvh, or
    None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(p0)
    p0 = np.ascontiguousarray(p0, dtype=np.float32)
    p1 = np.ascontiguousarray(p1, dtype=np.float32)
    p2 = np.ascontiguousarray(p2, dtype=np.float32)
    max_nodes = max(4, 2 * (2 * n // max(1, leaf_size) + 2))
    mins = np.empty((max_nodes, 3), dtype=np.float32)
    maxs = np.empty((max_nodes, 3), dtype=np.float32)
    skip = np.empty(max_nodes, dtype=np.int32)
    first = np.empty(max_nodes, dtype=np.int32)
    count = np.empty(max_nodes, dtype=np.int32)
    perm = np.empty(n, dtype=np.int64)
    m = lib.bvh_build(
        _fptr(p0), _fptr(p1), _fptr(p2),
        ctypes.c_int64(n), ctypes.c_int(leaf_size),
        _fptr(mins), _fptr(maxs),
        skip.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        first.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(max_nodes),
    )
    if m < 0:
        log.warning("native bvh_build overflowed; falling back to Python")
        return None
    return mins[:m].copy(), maxs[:m].copy(), skip[:m].copy(), first[:m].copy(), count[:m].copy(), perm


def tokenize_native(data: bytes):
    """Token spans [(start, end), ...] or None if unavailable/error."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    max_toks = max(64, len(data) // 2 + 16)
    starts = np.empty(max_toks, dtype=np.int64)
    ends = np.empty(max_toks, dtype=np.int64)
    n = lib.tokenize(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(data)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(max_toks),
    )
    if n < 0:
        if n == -1:
            return None
        raise ValueError(f"unterminated string at byte {-(n + 1)}")
    return starts[:n], ends[:n]
