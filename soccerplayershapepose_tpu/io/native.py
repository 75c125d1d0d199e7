"""ctypes binding for the native host dataplane (native/dataplane.cc).

Falls back to pure-Python equivalents when the shared library isn't built
(`make -C native`). The native path removes interpreter overhead from the
hot input loop: manifest scans, .npy mask decode and multi-threaded
proxy-batch assembly into preallocated buffers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libdataplane.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                           capture_output=True, timeout=120, check=False)
        except Exception:
            pass
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dp_scan_tree.restype = ctypes.c_void_p
        lib.dp_scan_tree.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.dp_free.argtypes = [ctypes.c_void_p]
        lib.dp_load_npy_f32.restype = ctypes.c_int
        lib.dp_load_npy_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.dp_load_proxy_batch.restype = ctypes.c_int
        lib.dp_load_proxy_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def scan_tree(root: str, suffix: str = "") -> List[str]:
    """Relative paths of files under root matching suffix (sorted DFS)."""
    lib = _load()
    if lib is None:
        out = []
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            for name in sorted(filenames):
                if not suffix or name.endswith(suffix):
                    out.append(os.path.relpath(os.path.join(dirpath, name),
                                               root))
        return out
    ptr = lib.dp_scan_tree(root.encode(), suffix.encode())
    if not ptr:
        return []
    try:
        text = ctypes.string_at(ptr).decode()
    finally:
        lib.dp_free(ptr)
    return [line for line in text.split("\n") if line]


def load_npy_f32(path: str) -> np.ndarray:
    """Load a ≤2-D .npy as float32 (native parser when available)."""
    lib = _load()
    if lib is None:
        return np.load(path).astype(np.float32)
    buf = np.empty(1 << 22, np.float32)     # 16MB scratch: up to 2048²
    dims = (ctypes.c_int64 * 2)()
    rc = lib.dp_load_npy_f32(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, dims)
    if rc != 0:
        return np.load(path).astype(np.float32)   # fall back (e.g. >2-D)
    rows, cols = dims[0], dims[1]
    return buf[:rows * cols].reshape(rows, cols).copy()


def load_proxy_batch(stems: List[str], wh: int = 512,
                     n_threads: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Batched (<stem>_sil.npy, <stem>_j2d.xml) load → ((B,wh,wh), (B,17,3))."""
    lib = _load()
    b = len(stems)
    if lib is None:
        import json
        sils = np.stack([np.load(s + "_sil.npy").astype(np.float32)
                         for s in stems])
        joints = np.stack([np.asarray(json.load(open(s + "_j2d.xml")),
                                      np.float32) for s in stems])
        return sils, joints
    sil = np.empty((b, wh, wh), np.float32)
    j2d = np.empty((b, 17, 3), np.float32)
    packed = b"\0".join(s.encode() for s in stems) + b"\0"
    rc = lib.dp_load_proxy_batch(
        packed, b, wh, sil.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        j2d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if rc != 0:
        raise IOError(f"proxy load failed for stem #{-rc}: {stems[-rc - 1]}")
    return sil, j2d
