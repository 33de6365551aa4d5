"""ctypes binding for the native (C++/OpenMP) host MAS implementation.

The shared library is built from native/monotonic_align.cpp (``make -C
native``); if absent, an attempt is made to build it on first use, falling
back to the numpy oracle. The on-device lax.scan MAS remains the primary
training path — this host version serves offline alignment extraction and
independent verification.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmonotonic_align.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.maximum_path_c.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.maximum_path_c.restype = None
        _lib = lib
    except OSError:
        return None
    return _lib


def native_available() -> bool:
    return _load() is not None


def maximum_path_native(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """(B, Tx, Ty) numpy DP via the C++ library; falls back to the numpy
    oracle when the library cannot be built."""
    lib = _load()
    value = np.ascontiguousarray(
        np.asarray(value, dtype=np.float32) * np.asarray(mask, dtype=np.float32)
    )
    mask = np.asarray(mask)
    b, t_x, t_y = value.shape
    t_xs = np.ascontiguousarray(mask[:, :, 0].sum(1).astype(np.int32))
    t_ys = np.ascontiguousarray(mask[:, 0, :].sum(1).astype(np.int32))
    if lib is None:
        from tpu_speech.ops.monotonic_align import maximum_path_numpy

        return maximum_path_numpy(value, mask)
    paths = np.zeros((b, t_x, t_y), dtype=np.int32)
    lib.maximum_path_c(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_x, t_y,
    )
    return paths
