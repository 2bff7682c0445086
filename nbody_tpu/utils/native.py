"""ctypes bindings for the native C++ oracle (native/oracle.cpp).

The oracle plays the role rebound plays for the reference (the external
ground-truth comparator, reference/main.c): a serial f64 leapfrog +
direct-sum / recursive-octree engine with the reference's exact step
semantics, compiled with strict FP.  Built on demand with ``make``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB = os.path.join(_NATIVE_DIR, "liboracle.so")


def build(force: bool = False) -> str:
    src = os.path.join(_NATIVE_DIR, "oracle.cpp")
    if force or not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(src):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB


@lru_cache(maxsize=1)
def load() -> ctypes.CDLL:
    lib = ctypes.CDLL(build())
    d = ctypes.POINTER(ctypes.c_double)
    lib.oracle_run.restype = ctypes.c_int64
    lib.oracle_run.argtypes = [d, d, d, ctypes.c_int64, ctypes.c_int,
                               ctypes.c_int64] + [ctypes.c_double] * 8
    lib.oracle_forces.restype = None
    lib.oracle_forces.argtypes = [d, d, ctypes.c_int64, ctypes.c_int] + \
        [ctypes.c_double] * 7 + [d]
    lib.oracle_energy.restype = ctypes.c_double
    lib.oracle_energy.argtypes = [d, d, d, ctypes.c_int64,
                                  ctypes.c_double, ctypes.c_double]
    return lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


METHODS = {"brute": 0, "bh": 1}


def oracle_run(pos, vel, mass, *, method="brute", steps=1, dt=1e-3, g=1.0,
               g_soft=0.0, theta2=0.5, box_center=(0.0, 0.0, 0.0),
               box_width=10.0):
    """Run the oracle integrator; returns (pos, vel, mass) of survivors."""
    lib = load()
    pos = np.ascontiguousarray(pos, dtype=np.float64).copy()
    vel = np.ascontiguousarray(vel, dtype=np.float64).copy()
    mass = np.ascontiguousarray(mass, dtype=np.float64).copy()
    n = len(mass)
    left = lib.oracle_run(
        _dp(pos), _dp(vel), _dp(mass), n, METHODS[method], steps,
        dt, g, g_soft, theta2, box_center[0], box_center[1], box_center[2],
        box_width,
    )
    return pos[:left], vel[:left], mass[:left]


def oracle_forces(pos, mass, *, method="brute", g=1.0, g_soft=0.0,
                  theta2=0.5, box_center=(0.0, 0.0, 0.0), box_width=10.0):
    lib = load()
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    mass = np.ascontiguousarray(mass, dtype=np.float64)
    acc = np.zeros_like(pos)
    lib.oracle_forces(
        _dp(pos), _dp(mass), len(mass), METHODS[method], g, g_soft, theta2,
        box_center[0], box_center[1], box_center[2], box_width, _dp(acc),
    )
    return acc


def oracle_energy(pos, vel, mass, *, g=1.0, g_soft=0.0):
    lib = load()
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    vel = np.ascontiguousarray(vel, dtype=np.float64)
    mass = np.ascontiguousarray(mass, dtype=np.float64)
    return float(lib.oracle_energy(_dp(pos), _dp(vel), _dp(mass), len(mass),
                                   g, g_soft))
