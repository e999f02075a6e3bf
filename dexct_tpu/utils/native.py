"""ctypes bindings for the native runtime (csrc/dexct_native.cpp).

Builds the shared library on first use with g++ (cached under
``csrc/build``).  Every entry point has a NumPy fallback so the framework
works without a toolchain; ``HAVE_NATIVE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["HAVE_NATIVE", "native_threads", "siddon_trace_cpu",
           "counts_from_paths_cpu", "load_native"]

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_SRC = os.path.join(_ROOT, "csrc", "dexct_native.cpp")
_BUILD_DIR = os.path.join(_ROOT, "csrc", "build")
_LIB = os.path.join(_BUILD_DIR, "libdexct_native.so")

_lib = None
HAVE_NATIVE = False


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native(rebuild=False):
    """Load (building if needed) the native library; None on failure."""
    global _lib, HAVE_NATIVE
    if _lib is not None and not rebuild:
        return _lib
    try:
        if rebuild or not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.dexct_native_version.restype = ctypes.c_int
        if lib.dexct_native_version() < 10:
            raise RuntimeError("stale native library")
        lib.dexct_native_threads.restype = ctypes.c_int
        lib.siddon_trace_f64.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ]
        lib.counts_from_paths_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.write_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.write_f32.restype = ctypes.c_int
        lib.read_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.read_f32.restype = ctypes.c_int
        _lib = lib
        HAVE_NATIVE = True
        return lib
    except Exception:
        _lib = None
        HAVE_NATIVE = False
        return None


def native_threads():
    lib = load_native()
    return lib.dexct_native_threads() if lib else 0


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def siddon_trace_cpu(labels, src, dirs, dx, dy, n_materials):
    """Exact Siddon paths on CPU (float64, OpenMP).

    Falls back to the pure-NumPy oracle if the native library is missing.
    labels [Ny, Nx] uint8; src/dirs [R, 2]; returns [R, n_materials].
    """
    lib = load_native()
    labels = np.ascontiguousarray(labels, np.uint8)
    src = np.ascontiguousarray(src, np.float64)
    dirs = np.ascontiguousarray(dirs, np.float64)
    if lib is None:
        from .testing import siddon_paths_numpy

        return siddon_paths_numpy(labels, src, dirs, dx, dy, n_materials)
    ny, nx = labels.shape
    n_rays = src.shape[0]
    out = np.zeros((n_rays, n_materials), np.float64)
    lib.siddon_trace_f64(
        _ptr(labels, ctypes.c_uint8), ny, nx, float(dx), float(dy),
        _ptr(src, ctypes.c_double), _ptr(dirs, ctypes.c_double),
        n_rays, n_materials, _ptr(out, ctypes.c_double),
    )
    return out


def counts_from_paths_cpu(paths, mu_table, i0):
    """Polyenergetic counts on CPU (float64, OpenMP)."""
    lib = load_native()
    paths = np.ascontiguousarray(paths, np.float64)
    mu = np.ascontiguousarray(mu_table, np.float64)
    i0 = np.ascontiguousarray(i0, np.float64)
    if lib is None:
        L = paths @ mu
        return np.exp(-np.clip(L, None, 700.0)) @ i0
    n_rays, n_mat = paths.shape
    n_e = mu.shape[1]
    out = np.zeros(n_rays, np.float64)
    lib.counts_from_paths_f64(
        _ptr(paths, ctypes.c_double), n_rays, n_mat,
        _ptr(mu, ctypes.c_double), n_e, _ptr(i0, ctypes.c_double),
        _ptr(out, ctypes.c_double),
    )
    return out
