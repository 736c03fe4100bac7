"""ctypes bindings for the native (C++) host-runtime pieces.

Builds ``native/spatial_build.cpp`` with g++ on first use (cached .so);
all callers fall back to the numpy implementations when compilation is
impossible, so the package stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "spatial_build.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libspatial_build.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.build_vertex_grid.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, i32p, i32p]
        lib.build_triangle_grid.argtypes = [
            f32p, i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, i32p, i32p]
        _LIB = lib
    except Exception as e:   # no compiler / load failure -> numpy path
        print(f"[native] falling back to numpy builders: {e}")
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def build_vertex_grid(verts: np.ndarray, res: int, origin, cell_size,
                      max_per_cell: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float32)
    cell_items = np.empty((res ** 3, max_per_cell), np.int32)
    fill = np.zeros(res ** 3, np.int32)
    lib.build_vertex_grid(v, len(v), res, float(origin[0]),
                          float(origin[1]), float(origin[2]),
                          float(cell_size), max_per_cell,
                          cell_items, fill)
    return cell_items


def build_triangle_grid(verts: np.ndarray, faces: np.ndarray, res: int,
                        origin, cell_size,
                        max_per_cell: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    cell_items = np.empty((res ** 3, max_per_cell), np.int32)
    fill = np.zeros(res ** 3, np.int32)
    lib.build_triangle_grid(v, f, len(f), res, float(origin[0]),
                            float(origin[1]), float(origin[2]),
                            float(cell_size), max_per_cell,
                            cell_items, fill)
    return cell_items
