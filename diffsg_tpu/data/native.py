"""ctypes bindings for the native (C++/OpenMP) oracle engines in native/.

The Python/NumPy generators in :mod:`.generators` are the behavioral
reference; these native engines produce identical outputs and are the path
for full-scale dataset regeneration (the NU oracle is ~15 s/sample in
vectorized NumPy at grid_step=1; the native engine is ~100x faster and
OpenMP-parallel over samples).

Build on demand: the shared libraries are compiled with ``make -C native``
the first time they are needed (g++ is assumed present; failures fall back
to a clear error so callers can use the NumPy path).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"


def _load(libname: str) -> ctypes.CDLL:
    path = NATIVE_DIR / libname
    if not path.exists():
        try:
            subprocess.run(["make", "-C", str(NATIVE_DIR), libname],
                           check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = getattr(e, "stderr", str(e))
            raise RuntimeError(
                f"failed to build native library {libname}: {detail}\n"
                "Use the NumPy generators in diffsg_tpu.data.generators instead."
            ) from e
    return ctypes.CDLL(str(path))


_nu_lib: Optional[ctypes.CDLL] = None
_co_lib: Optional[ctypes.CDLL] = None


def nu_oracle_native(
    qs: np.ndarray,
    P_sum: float = 18.0,
    power_step: float = 0.1,
    grid_step: float = 1.0,
    width: float = 400.0,
    height: float = 400.0,
    legacy_sinr: bool = False,
) -> np.ndarray:
    """Solve NU oracle instances natively.

    qs: (n, 6) user coordinates.  Returns (n, 6) [uav_x, uav_y, P1..P3, rate].
    Output matches generators.noma_uav_gen's per-sample solver exactly.
    """
    global _nu_lib
    if _nu_lib is None:
        _nu_lib = _load("libnu_oracle.so")
        _nu_lib.nu_oracle_solve.restype = ctypes.c_int
        _nu_lib.nu_oracle_solve.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ]
    qs = np.ascontiguousarray(qs, dtype=np.float64)
    n = qs.shape[0]
    out = np.zeros((n, 6), dtype=np.float64)
    rc = _nu_lib.nu_oracle_solve(
        qs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, P_sum,
        power_step, grid_step, width, height, int(legacy_sinr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"nu_oracle_solve returned {rc}")
    return out


def co_oracle_native(features: np.ndarray, node_num: int = 3,
                     step: float = 0.02) -> np.ndarray:
    """Solve CO oracle instances natively.

    features: (n, 5N) [s(N), c(N), f_local(N), h(N), alpha(N)] per sample.
    Returns (n, 1+N) [decision_class, allocations].
    """
    global _co_lib
    if _co_lib is None:
        _co_lib = _load("libco_oracle.so")
        _co_lib.co_oracle_solve.restype = ctypes.c_int
        _co_lib.co_oracle_solve.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ]
    features = np.ascontiguousarray(features, dtype=np.float64)
    n = features.shape[0]
    out = np.zeros((n, 1 + node_num), dtype=np.float64)
    rc = _co_lib.co_oracle_solve(
        features.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        node_num, step, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"co_oracle_solve returned {rc}")
    return out
