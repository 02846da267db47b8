"""Native (C++) host-side data-path kernels with transparent fallback.

Compiled on first import with the system g++; if the toolchain or compile
fails, the pure-numpy implementations in ``pdfnet_tpu.data`` are used
instead — behavior is identical, only host throughput differs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastops.cpp")
_LIB_PATH = os.path.join(_HERE, "libfastops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing toolchain, sandbox, ...
        print(f"pdfnet_tpu.native: build failed ({e}); using numpy fallback",
              file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"pdfnet_tpu.native: load failed ({e}); using numpy fallback",
              file=sys.stderr)
        return None
    lib.sample_hand_cloud.restype = ctypes.c_int
    lib.sample_hand_cloud.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float)]
    lib.draw_gaussian.restype = None
    lib.draw_gaussian.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def sample_hand_cloud_native(
    masked_depth: np.ndarray, K: np.ndarray, num_points: int,
    seed: int, min_pixels: int = 100,
    z_min: float = 0.2, z_max: float = 2.5, band: float = 0.08,
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """C++ fast path of data.cloud.sample_hand_cloud (same semantics;
    RNG stream differs — both are uniform random subsets)."""
    lib = get_lib()
    assert lib is not None
    H, W = masked_depth.shape
    depth = np.ascontiguousarray(masked_depth, np.float32)
    k_inv = np.ascontiguousarray(np.linalg.inv(K), np.float32)
    choose = np.zeros(num_points, np.int64)
    cloud = np.zeros((num_points, 3), np.float32)
    ok = lib.sample_hand_cloud(
        _fptr(depth), H, W, _fptr(k_inv), num_points, min_pixels,
        z_min, z_max, band, ctypes.c_uint64(seed),
        choose.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), _fptr(cloud))
    return choose, cloud, bool(ok)


def draw_gaussian_native(heatmap: np.ndarray, center, radius: int) -> None:
    """In-place max-composited gaussian splat (C++)."""
    lib = get_lib()
    assert lib is not None
    assert heatmap.dtype == np.float32 and heatmap.flags.c_contiguous
    H, W = heatmap.shape
    lib.draw_gaussian(_fptr(heatmap), H, W, int(center[0]), int(center[1]),
                      int(radius))
