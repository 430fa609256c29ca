"""Native C++ kernels: build, exactness vs oracles, self-intersection."""

import numpy as np
import pytest

from geniconet_tpu import native
from geniconet_tpu.geometry import ico
from geniconet_tpu.ops.point_mesh import point_to_mesh_distance_numpy


def test_build():
    assert native.build(), "g++ build of the native library failed"
    assert native.available()


def test_ptm_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    s = 2
    v = ico.get_vertex_coords(s).astype(np.float32)
    f = ico.get_ico_faces(s)
    pts = rng.randn(100, 3).astype(np.float32)
    got = native.point_to_mesh_distance_native(pts, v, f)
    expected = point_to_mesh_distance_numpy(pts, v, f)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


def test_self_intersection_clean_sphere():
    s = 3
    v, f = ico.get_icosahedral_grid(s)
    pairs = native.detect_self_intersection(v, f)
    assert pairs.shape == (0, 2) or len(pairs) == 0  # icosphere is clean


def test_self_intersection_detects_crossing():
    """Two separated crossing triangles embedded in a small mesh."""
    # a tiny planar patch plus a triangle stabbing through it
    verts = np.array(
        [
            [0, 0, 0], [1, 0, 0], [0, 1, 0],      # tri 0 in z=0 plane
            [0.3, 0.3, -0.5], [0.4, 0.2, 0.5], [0.2, 0.4, 0.5],  # tri 1 pierces it
            [5, 5, 5], [6, 5, 5], [5, 6, 5],      # far-away tri 2 (no hit)
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    pairs = native.detect_self_intersection(verts, faces)
    assert (pairs.tolist() == [[0, 1]]), pairs


def test_self_intersection_excludes_adjacent():
    """Faces sharing vertices are never reported (mesh neighbors touch)."""
    s = 1
    v, f = ico.get_icosahedral_grid(s)
    pairs = native.detect_self_intersection(v, f)
    assert len(pairs) == 0


def test_self_intersected_deformed_mesh():
    """A violently deformed icosphere should self-intersect somewhere."""
    s = 3
    v, f = ico.get_icosahedral_grid(s)
    rng = np.random.RandomState(3)
    v = v.copy()
    # push a band of vertices through the opposite side
    v[v[:, 2] > 0.4] *= np.array([0.1, 0.1, -2.0])
    pairs = native.detect_self_intersection(v.astype(np.float32), f)
    assert len(pairs) > 0
