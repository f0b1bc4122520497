"""ctypes bindings for the native (C++) host kernels in ``native/``.

The library builds on demand with the baked-in toolchain (g++); absence of a
compiler degrades gracefully to ``available() == False`` and callers fall back
to the device-side approximations.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libsvnative.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.filter_speckles.restype = ctypes.c_int64
    lib.filter_speckles.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32, ctypes.c_float,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def filter_speckles(
    disp: np.ndarray,
    new_val: float,
    max_speckle_size: int,
    max_diff: float,
) -> tuple[np.ndarray, int]:
    """Exact cv2.filterSpeckles semantics (4-connected flood fill; components
    ≤ max_speckle_size set to new_val). Returns (filtered copy, n_removed)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no compiler?)")
    out = np.ascontiguousarray(disp, dtype=np.float32).copy()
    h, w = out.shape
    removed = lib.filter_speckles(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(h), np.int32(w),
        np.float32(new_val), np.int32(max_speckle_size), np.float32(max_diff),
    )
    return out, int(removed)
