"""Build + load the native C++ components via ctypes.

The reference's only native dependency is the C++ RVO2/ORCA library
(Cython-built in its install.sh:26-33).  Our native layer lives in
``native/`` and is compiled on demand with the system toolchain; the TPU
compute path never calls it — it serves as the golden oracle for the JAX
ORCA kernel and as a host-side fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")

_lib_cache = {}


def _build(name: str) -> str:
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
        check=True,
    )
    return out


def load_orca():
    """ctypes handle for the ORCA oracle with a numpy-friendly wrapper."""
    if "orca" in _lib_cache:
        return _lib_cache["orca"]
    lib = ctypes.CDLL(_build("orca"))
    fn = lib.orca_compute_velocities
    c_double_p = ctypes.POINTER(ctypes.c_double)
    fn.argtypes = [
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_double,
        c_double_p, c_double_p, c_double_p, c_double_p, c_double_p,
        c_double_p, c_double_p,
    ]
    fn.restype = None

    def orca_compute_velocities(pos, vel, pref_vel, radius, max_speed,
                                collab_coeff, dt, neighbor_dist,
                                max_neighbors, time_horizon):
        pos = np.ascontiguousarray(pos, np.float64)
        vel = np.ascontiguousarray(vel, np.float64)
        pref_vel = np.ascontiguousarray(pref_vel, np.float64)
        radius = np.ascontiguousarray(radius, np.float64)
        max_speed = np.ascontiguousarray(max_speed, np.float64)
        collab_coeff = np.ascontiguousarray(collab_coeff, np.float64)
        n = pos.shape[0]
        out = np.zeros((n, 2), np.float64)

        def p(a):
            return a.ctypes.data_as(c_double_p)

        fn(n, dt, neighbor_dist, max_neighbors, time_horizon,
           p(pos), p(vel), p(pref_vel), p(radius), p(max_speed),
           p(collab_coeff), p(out))
        return out

    _lib_cache["orca"] = orca_compute_velocities
    return orca_compute_velocities
