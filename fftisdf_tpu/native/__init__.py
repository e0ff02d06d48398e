"""ctypes bindings for the native host-side lattice engine.

Builds ``native/lattice_engine.cpp`` on demand with g++ (cached next to the
package); every entry point has a pure-Python fallback so the framework works
without a toolchain.  Set ``FFTISDF_TPU_NO_NATIVE=1`` to force the fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _source_path() -> Path:
    return Path(__file__).resolve().parents[2] / "native" / "lattice_engine.cpp"


def _lib_path() -> Path:
    return Path(__file__).resolve().parent / "_liblattice_engine.so"


def load():
    """Return the loaded library or None (after one build attempt)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("FFTISDF_TPU_NO_NATIVE"):
        return None
    src, lib = _source_path(), _lib_path()
    try:
        if not lib.exists() or lib.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(lib)],
                check=True, capture_output=True, timeout=120)
        _LIB = ctypes.CDLL(str(lib))
        _declare(_LIB)
    except Exception as exc:  # toolchain missing, build failure, ...
        print(f"fftisdf_tpu.native: falling back to Python ({exc})",
              file=sys.stderr)
        _LIB = None
    return _LIB


def _declare(lib):
    d = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.POINTER(ctypes.c_int64)
    lib.enumerate_images.restype = ctypes.c_int64
    lib.enumerate_images.argtypes = [d, d, d, ctypes.c_double, i64, d,
                                     ctypes.c_int64]
    lib.build_kconserv.restype = ctypes.c_int32
    lib.build_kconserv.argtypes = [d, ctypes.c_int64, i64, i64]
    lib.ewald_real.restype = ctypes.c_double
    lib.ewald_real.argtypes = [d, d, ctypes.c_int64, d, ctypes.c_int64,
                               ctypes.c_double]


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def enumerate_images(a, center, cell_center, reach, nmax):
    """Native image enumeration; returns (n, 3) float64 or None if no lib."""
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.float64)
    center = np.ascontiguousarray(center, dtype=np.float64)
    cc = np.ascontiguousarray(cell_center, dtype=np.float64)
    nmax = np.ascontiguousarray(nmax, dtype=np.int64)
    cap = int(np.prod(2 * nmax + 1))
    out = np.empty((cap, 3), dtype=np.float64)
    n = lib.enumerate_images(_dptr(a), _dptr(center), _dptr(cc),
                             ctypes.c_double(float(reach)), _iptr(nmax),
                             _dptr(out), ctypes.c_int64(cap))
    return out[:n].copy()


def build_kconserv(skpts):
    """Native (kconserv2, kconserv3) tables or None."""
    lib = load()
    if lib is None:
        return None
    s = np.ascontiguousarray(skpts, dtype=np.float64)
    nk = len(s)
    k2 = np.empty((nk, nk), dtype=np.int64)
    k3 = np.empty((nk, nk, nk), dtype=np.int64)
    rc = lib.build_kconserv(_dptr(s), ctypes.c_int64(nk), _iptr(k2), _iptr(k3))
    if rc != 0:
        return None
    return k2, k3


def ewald_real(coords, charges, ts, eta):
    """Native real-space Ewald sum or None."""
    lib = load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    charges = np.ascontiguousarray(charges, dtype=np.float64)
    ts = np.ascontiguousarray(ts, dtype=np.float64)
    return float(lib.ewald_real(_dptr(coords), _dptr(charges),
                                ctypes.c_int64(len(charges)), _dptr(ts),
                                ctypes.c_int64(len(ts)),
                                ctypes.c_double(float(eta))))
