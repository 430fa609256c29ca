"""Native host-side mesh kernels (C++ via ctypes) with pure-Python fallbacks.

Provides:
  * ``point_to_mesh_distance_native(points, verts, faces)`` — exact squared
    distances (double internally), the CPU oracle / kaolin-capability
    replacement (reference ico_utils.py:26-44).
  * ``detect_self_intersection(verts, faces)`` — intersecting face-pair
    indices, the PyMesh ``detect_self_intersection`` replacement used by the
    visualizer (reference visualizer_utils.py:50-58).

``build()`` compiles the shared library with g++ on first use; if no
compiler is available the callers fall back to numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "geniconet_native.cc")
_LIB = os.path.join(os.path.dirname(__file__), "libgeniconet_native.so")
_lib = None
_build_failed = False


def build(force: bool = False) -> bool:
    """Compile the native library. Returns True on success."""
    global _build_failed
    if os.path.exists(_LIB) and not force:
        if not force and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, text=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"[native] build failed: {msg}")
        _build_failed = True
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not build():
            return None
    lib = ctypes.CDLL(_LIB)
    lib.ptm_distance.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.self_intersections.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.self_intersections.restype = ctypes.c_int
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def available() -> bool:
    return _load() is not None


def point_to_mesh_distance_native(points, verts, faces) -> np.ndarray:
    """(P,) squared distances; falls back to the numpy oracle if unbuilt."""
    p = np.ascontiguousarray(points, np.float32)
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    lib = _load()
    if lib is None:
        from geniconet_tpu.ops.point_mesh import point_to_mesh_distance_numpy

        return point_to_mesh_distance_numpy(p, v, f).astype(np.float32)
    out = np.empty(p.shape[0], np.float32)
    lib.ptm_distance(_fptr(p), p.shape[0], _fptr(v), v.shape[0], _iptr(f),
                     f.shape[0], _fptr(out))
    return out


def detect_self_intersection(verts, faces) -> np.ndarray:
    """(K, 2) int32 indices of intersecting, non-adjacent face pairs."""
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    lib = _load()
    if lib is None:
        return _self_intersections_numpy(v, f)
    cap = max(1024, f.shape[0])
    out = np.empty((cap, 2), np.int32)
    n = lib.self_intersections(_fptr(v), v.shape[0], _iptr(f), f.shape[0],
                               _iptr(out), cap)
    if n > cap:  # rerun with enough room
        out = np.empty((n, 2), np.int32)
        n = lib.self_intersections(_fptr(v), v.shape[0], _iptr(f), f.shape[0],
                                   _iptr(out), n)
    return out[:n].copy()


def _self_intersections_numpy(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Slow numpy fallback (AABB prefilter + SAT-lite via shapely-free code).

    Only used when no compiler exists; fine for small meshes.
    """
    tri = v[f]  # (F, 3, 3)
    lo = tri.min(1)
    hi = tri.max(1)
    pairs = []
    F = f.shape[0]
    for i in range(F):
        cand = np.where(
            np.all(hi[i] >= lo, axis=1) & np.all(hi >= lo[i], axis=1)
        )[0]
        for j in cand:
            if j <= i:
                continue
            if len(set(f[i]) & set(f[j])):
                continue
            if _tri_tri_numpy(tri[i], tri[j]):
                pairs.append((i, j))
    return np.asarray(pairs, np.int32).reshape(-1, 2)


def _tri_tri_numpy(t0, t1) -> bool:
    """Segment-triangle based tri-tri intersection (double precision)."""

    def seg_tri(p, q, a, b, c):
        # Möller–Trumbore segment/triangle
        d = q - p
        e1, e2 = b - a, c - a
        h = np.cross(d, e2)
        det = e1 @ h
        if abs(det) < 1e-14:
            return False
        inv = 1.0 / det
        s = p - a
        u = (s @ h) * inv
        if u < 0 or u > 1:
            return False
        qv = np.cross(s, e1)
        vv = (d @ qv) * inv
        if vv < 0 or u + vv > 1:
            return False
        t = (e2 @ qv) * inv
        return 0.0 <= t <= 1.0

    t0 = np.asarray(t0, np.float64)
    t1 = np.asarray(t1, np.float64)
    for (p, q) in [(t0[0], t0[1]), (t0[1], t0[2]), (t0[2], t0[0])]:
        if seg_tri(p, q, *t1):
            return True
    for (p, q) in [(t1[0], t1[1]), (t1[1], t1[2]), (t1[2], t1[0])]:
        if seg_tri(p, q, *t0):
            return True
    return False
