"""Native host-compute tier (C++, ctypes-bound).

The device compute path is JAX/XLA/Pallas; this package holds the *host*
hot loops of the data pipeline that are too slow in Python — currently the
SLIC superpixel op behind heavy_aug2 (reference
dataset/data_generator_mscmrseg.py:185-214 via iaa.Superpixels), which
costs ~1.6 s/image in pure numpy vs ~5 ms here (PERF.md "Native host
tier").

The shared library is compiled on demand with g++ (pybind11 is not in this
image, so the ABI is plain C + ctypes) and cached next to the source; a
prebuilt ``_slcl_native.so`` in this directory is picked up directly.
``SLCL_NATIVE=0`` disables the tier (pure-Python fallbacks are used and
stay unit-tested).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "slic.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(so_path: str) -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", so_path, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load():
    """Return the loaded native library, or None (disabled / no compiler)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("SLCL_NATIVE", "1") == "0":
            return None
        so_path = os.path.join(_HERE, "_slcl_native.so")
        if not (os.path.exists(so_path)
                and os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
            # cache dir fallback when the package dir is read-only
            alt = os.path.join(os.environ.get("SLCL_NATIVE_CACHE", "/tmp"),
                               "_slcl_native.so")
            target = so_path if os.access(_HERE, os.W_OK) else alt
            if not _build(target):
                return None
            so_path = target
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.slcl_slic_assign.restype = ctypes.c_int
        lib.slcl_slic_assign.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32)]
        lib.slcl_segment_replace.restype = None
        lib.slcl_segment_replace.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None


def slic_assign(gray: np.ndarray, grid: int, iters: int,
                compactness: float = 1.0) -> np.ndarray:
    """SLIC superpixel assignment map (h, w) int32 in [0, grid*grid).

    Native C++ path; raises RuntimeError when the tier is unavailable
    (callers fall back to the numpy implementation in data/transforms.py).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native tier unavailable")
    gray = np.ascontiguousarray(gray, dtype=np.float32)
    h, w = gray.shape
    out = np.empty((h, w), dtype=np.int32)
    rc = lib.slcl_slic_assign(
        gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(h), ctypes.c_int(w), ctypes.c_int(int(grid)),
        ctypes.c_int(int(iters)), ctypes.c_float(float(compactness)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc < 0:
        raise RuntimeError(f"slcl_slic_assign failed: {rc}")
    return out


def segment_replace(img: np.ndarray, assign: np.ndarray,
                    replace: np.ndarray) -> np.ndarray:
    """Replace pixels of segments flagged in ``replace`` (len k, bool/uint8)
    by their segment-mean. img (h, w) or (h, w, ch) float32."""
    lib = load()
    if lib is None:
        raise RuntimeError("native tier unavailable")
    squeeze = img.ndim == 2
    img3 = np.ascontiguousarray(
        img[..., None] if squeeze else img, dtype=np.float32)
    assign = np.ascontiguousarray(assign, dtype=np.int32)
    rep = np.ascontiguousarray(replace, dtype=np.uint8)
    n = assign.size
    ch = img3.shape[-1]
    out = np.empty_like(img3)
    lib.slcl_segment_replace(
        img3.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int(ch), ctypes.c_int(len(rep)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[..., 0] if squeeze else out
