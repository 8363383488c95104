"""ctypes bindings for the native host runtime (`libnstpu_native.so`).

Auto-builds with `make` on first import when a compiler is present; every
entry point has a pure-numpy fallback with identical semantics, so the
package works without a toolchain.  `available()` reports which path is
active; tests assert native == fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libnstpu_native.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.nstpu_gmsh_parse.restype = ctypes.c_void_p
    lib.nstpu_gmsh_parse.argtypes = [ctypes.c_char_p]
    lib.nstpu_gmsh_error.restype = ctypes.c_char_p
    lib.nstpu_gmsh_error.argtypes = [ctypes.c_void_p]
    lib.nstpu_gmsh_nv.restype = ctypes.c_int64
    lib.nstpu_gmsh_nv.argtypes = [ctypes.c_void_p]
    lib.nstpu_gmsh_ne.restype = ctypes.c_int64
    lib.nstpu_gmsh_ne.argtypes = [ctypes.c_void_p]
    lib.nstpu_gmsh_fill.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
    ]
    lib.nstpu_gmsh_free.argtypes = [ctypes.c_void_p]

    lib.nstpu_pattern_build.restype = ctypes.c_void_p
    lib.nstpu_pattern_build.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
    ]
    lib.nstpu_pattern_nnzb.restype = ctypes.c_int64
    lib.nstpu_pattern_nnzb.argtypes = [ctypes.c_void_p]
    lib.nstpu_pattern_fill.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
    ]
    lib.nstpu_pattern_free.argtypes = [ctypes.c_void_p]

    lib.nstpu_rcm.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_gmsh_native(path: str):
    """Returns (coords, tets, tags) or None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.nstpu_gmsh_parse(path.encode())
    try:
        err = lib.nstpu_gmsh_error(h)
        if err:
            raise ValueError(err.decode())
        nv = lib.nstpu_gmsh_nv(h)
        ne = lib.nstpu_gmsh_ne(h)
        coords = np.empty((nv, 3), np.float64)
        tets = np.empty((ne, 4), np.int32)
        tags = np.empty(nv, np.int32)
        lib.nstpu_gmsh_fill(h, coords, tets.reshape(-1), tags)
        return coords, tets, tags
    finally:
        lib.nstpu_gmsh_free(h)


def build_pattern_native(nv: int, tets: np.ndarray):
    """Returns (indptr, indices, slot_of_pair) or None."""
    lib = _load()
    if lib is None:
        return None
    tets = np.ascontiguousarray(tets, np.int32)
    ne = tets.shape[0]
    h = lib.nstpu_pattern_build(nv, ne, tets.reshape(-1))
    try:
        nnzb = lib.nstpu_pattern_nnzb(h)
        indptr = np.empty(nv + 1, np.int32)
        indices = np.empty(nnzb, np.int32)
        slot = np.empty(ne * 16, np.int32)
        lib.nstpu_pattern_fill(h, indptr, indices, slot)
        return indptr, indices, slot
    finally:
        lib.nstpu_pattern_free(h)


def rcm_native(nv: int, indptr: np.ndarray, indices: np.ndarray):
    """Returns perm (int32) or None."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    perm = np.empty(nv, np.int32)
    lib.nstpu_rcm(nv, indptr, indices, perm)
    return perm
