"""ctypes bindings for the native (C++/OpenMP) host geometry ops.

Builds ``csrc/nrt_native.cpp`` into a shared library on first use (cached
next to this file).  See csrc/nrt_native.cpp for the op inventory and its
role parity with the reference's csrc / scene.py host utilities.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "nrt_native.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_nrt_native.so")


def build(force: bool = False) -> str:
    """Compile the native library if needed; returns the .so path."""
    if force or (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
               "-std=c++17", _SRC, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(build())
        f32 = ctypes.POINTER(ctypes.c_float)
        i32 = ctypes.POINTER(ctypes.c_int32)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        lib.nrt_mesh_intersect.argtypes = [
            f32, i64, f32, i32, i64, ctypes.c_float, f32, i32, f32, f32, u8]
        lib.nrt_mesh_intersect_test.argtypes = [
            f32, i64, f32, i32, i64, f32, u8]
        lib.nrt_knn.argtypes = [f32, i64, f32, i64, ctypes.c_int32, i32, f32]
        lib.nrt_ray_point_min_dist.argtypes = [f32, i64, f32, i64, f32]
        lib.nrt_native_version.restype = ctypes.c_int
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        return _lib().nrt_native_version() >= 1
    except Exception:
        return False


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.float32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def mesh_intersect(rays, verts, faces, max_t: float = np.inf):
    """Closest-hit rays x mesh. Returns (t, face, uv, normal, hit)."""
    rays = _f32(rays).reshape(-1, 6)
    verts = _f32(verts)
    faces = np.ascontiguousarray(np.asarray(faces), dtype=np.int32)
    r = rays.shape[0]
    t = np.empty(r, np.float32)
    face = np.empty(r, np.int32)
    uv = np.empty((r, 2), np.float32)
    normal = np.empty((r, 3), np.float32)
    hit = np.empty(r, np.uint8)
    _lib().nrt_mesh_intersect(
        _ptr(rays, ctypes.c_float), r, _ptr(verts, ctypes.c_float),
        _ptr(faces, ctypes.c_int32), faces.shape[0],
        ctypes.c_float(np.float32(min(max_t, np.finfo(np.float32).max))),
        _ptr(t, ctypes.c_float), _ptr(face, ctypes.c_int32),
        _ptr(uv, ctypes.c_float), _ptr(normal, ctypes.c_float),
        _ptr(hit, ctypes.c_uint8))
    return t, face, uv, normal, hit.astype(bool)


def mesh_intersect_test(rays, verts, faces, max_t):
    """Any-hit shadow test; True where NOT blocked before max_t."""
    rays = _f32(rays).reshape(-1, 6)
    verts = _f32(verts)
    faces = np.ascontiguousarray(np.asarray(faces), dtype=np.int32)
    r = rays.shape[0]
    max_t = np.broadcast_to(_f32(max_t), (r,)).copy()
    out = np.empty(r, np.uint8)
    _lib().nrt_mesh_intersect_test(
        _ptr(rays, ctypes.c_float), r, _ptr(verts, ctypes.c_float),
        _ptr(faces, ctypes.c_int32), faces.shape[0],
        _ptr(max_t, ctypes.c_float), _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def knn(points, queries, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Brute-force KNN. Returns (idx [Q,k], dist2 [Q,k])."""
    points = _f32(points)
    queries = _f32(queries)
    q = queries.shape[0]
    idx = np.empty((q, k), np.int32)
    dist = np.empty((q, k), np.float32)
    _lib().nrt_knn(_ptr(points, ctypes.c_float), points.shape[0],
                   _ptr(queries, ctypes.c_float), q, k,
                   _ptr(idx, ctypes.c_int32), _ptr(dist, ctypes.c_float))
    return idx, dist


def ray_point_min_dist(rays, points) -> np.ndarray:
    """Minimum distance from each ray to any point."""
    rays = _f32(rays).reshape(-1, 6)
    points = _f32(points)
    out = np.empty(rays.shape[0], np.float32)
    _lib().nrt_ray_point_min_dist(
        _ptr(rays, ctypes.c_float), rays.shape[0],
        _ptr(points, ctypes.c_float), points.shape[0],
        _ptr(out, ctypes.c_float))
    return out
