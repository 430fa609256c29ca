"""Point-to-mesh distance vs the double-precision numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops.point_mesh import (
    point_to_mesh_distance,
    point_to_mesh_distance_numpy,
    point_to_triangle_sq,
)


def test_point_to_triangle_regions():
    """Hand-checked distances for every Voronoi region of one triangle."""
    tri = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    pts = np.array(
        [
            [0.25, 0.25, 1.0],   # above the face -> dist 1
            [-1.0, -1.0, 0.0],   # vertex A region -> sqrt(2)
            [2.0, 0.0, 0.0],     # vertex B region -> 1
            [0.0, 2.0, 0.0],     # vertex C region -> 1
            [0.5, -1.0, 0.0],    # edge AB region -> 1
            [-1.0, 0.5, 0.0],    # edge AC region -> 1
            [1.0, 1.0, 0.0],     # edge BC region -> dist to line x+y=1 = sqrt(2)/2
            [0.2, 0.2, 0.0],     # inside -> 0
        ],
        np.float32,
    )
    d = np.asarray(point_to_triangle_sq(jnp.asarray(pts), tri))[:, 0]
    expected = np.array([1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 0.5, 0.0])
    np.testing.assert_allclose(d, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("s", [1, 2])
def test_matches_numpy_oracle(s):
    rng = np.random.RandomState(0)
    v = ico.get_vertex_coords(s).astype(np.float32)
    f = ico.get_ico_faces(s)
    pts = rng.randn(64, 3).astype(np.float32) * 0.8
    got = np.asarray(point_to_mesh_distance(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(f), chunk=16))
    expected = point_to_mesh_distance_numpy(pts, v, f)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_points_on_mesh_are_zero():
    s = 2
    v = ico.get_vertex_coords(s).astype(np.float32)
    f = ico.get_ico_faces(s)
    d = np.asarray(point_to_mesh_distance(jnp.asarray(v[:50]), jnp.asarray(v), jnp.asarray(f)))
    np.testing.assert_allclose(d, 0.0, atol=1e-10)


def test_sphere_center_distance():
    """Center of the unit icosphere: distance = inradius of closest face."""
    s = 3
    v = ico.get_vertex_coords(s).astype(np.float32)
    f = ico.get_ico_faces(s)
    d = np.asarray(
        point_to_mesh_distance(jnp.zeros((1, 3)), jnp.asarray(v), jnp.asarray(f), squared=False)
    )
    assert 0.97 < d[0] < 1.0  # slightly inside the unit sphere (planar faces)


def test_chunk_padding_invariance():
    s = 1
    v = ico.get_vertex_coords(s).astype(np.float32)
    f = ico.get_ico_faces(s)  # 80 faces
    pts = np.random.RandomState(1).randn(10, 3).astype(np.float32)
    d1 = np.asarray(point_to_mesh_distance(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(f), chunk=7))
    d2 = np.asarray(point_to_mesh_distance(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(f), chunk=80))
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
