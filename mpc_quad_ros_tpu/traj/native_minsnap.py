"""ctypes binding for the native C++ min-snap optimizer.

Loads `traj/native/libminsnap.so` (building it with make on first use if the
toolchain is available) and exposes `native_min_snap_trajectory` with the same
signature/result as the pure-Python `min_snap_trajectory`.  The Python
implementation is the oracle in tests; the native one is the production path
(it is the framework's counterpart of the reference's genTrajectory C++
binary, `TrajectoryGenerator.py:189`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .polynomial import PiecewisePolynomial4D

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libminsnap.so")
_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "libminsnap.so"],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:  # no toolchain / build failure
            raise NativeUnavailable(f"could not build libminsnap.so: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.minsnap_solve.restype = ctypes.c_int
    lib.minsnap_solve.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def native_min_snap_trajectory(waypoints: np.ndarray, v_max: float, a_max: float,
                               max_scaling_iters: int = 12) -> PiecewisePolynomial4D:
    lib = _load()
    wp = np.ascontiguousarray(np.asarray(waypoints, dtype=np.float64)[:, :3])
    n_wp = wp.shape[0]
    K = n_wp - 1
    durations = np.zeros(K, dtype=np.float64)
    coeffs = np.zeros((K, 4, 8), dtype=np.float64)
    rc = lib.minsnap_solve(
        wp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_wp,
        float(v_max), float(a_max), int(max_scaling_iters),
        durations.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"minsnap_solve failed with code {rc}")
    return PiecewisePolynomial4D(durations, coeffs)
