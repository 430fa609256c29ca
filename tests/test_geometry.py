"""Closed-manifold invariants of the icosahedral grid geometry.

These tests validate the first-principles chart construction without any
reference implementation: vertex/face/edge counts, Euler characteristic,
edge-manifoldness, orientability, vertex degrees, coordinate sanity.
"""

import numpy as np
import pytest

from geniconet_tpu.geometry import ico

SUBDIVS = [0, 1, 2, 3, 4, 5]


@pytest.mark.parametrize("s", SUBDIVS)
def test_counts(s):
    V, F = ico.num_vertices(s), ico.num_faces(s)
    assert V == 10 * 4**s + 2
    assert F == 20 * 4**s
    faces = ico.get_ico_faces(s)
    assert faces.shape == (F, 3)
    # faces index exactly V vertices, all of them (reference losses.py:34-39
    # uses max()+1 as the vertex count)
    assert faces.max() + 1 == V
    assert set(np.unique(faces)) == set(range(V))


@pytest.mark.parametrize("s", SUBDIVS)
def test_closed_manifold(s):
    faces = ico.get_ico_faces(s)
    V, F = ico.num_vertices(s), ico.num_faces(s)
    # every directed edge appears exactly once => orientable closed 2-manifold
    directed = set()
    for a, b, c in faces:
        for e in ((a, b), (b, c), (c, a)):
            assert e not in directed, f"duplicate directed edge {e}"
            directed.add(e)
    # each undirected edge has both directions present
    for a, b in list(directed):
        assert (b, a) in directed
    E = len(directed) // 2
    assert E == 30 * 4**s
    assert V - E + F == 2  # Euler characteristic of the sphere
    # degenerate faces
    assert not np.any(faces[:, 0] == faces[:, 1])
    assert not np.any(faces[:, 1] == faces[:, 2])
    assert not np.any(faces[:, 0] == faces[:, 2])


@pytest.mark.parametrize("s", SUBDIVS)
def test_degrees(s):
    nbrs, mask = ico.get_neighbor_table(s)
    deg = mask.sum(axis=1)
    # exactly 12 degree-5 vertices (the base icosahedron), rest degree 6
    assert (deg == 5).sum() == 12
    assert (deg == 6).sum() == ico.num_vertices(s) - 12
    V = ico.num_vertices(s)
    # poles are always degree 5
    assert deg[V - 2] == 5 and deg[V - 1] == 5


@pytest.mark.parametrize("s", SUBDIVS)
def test_coords(s):
    v = ico.get_vertex_coords(s)
    assert v.shape == (ico.num_vertices(s), 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)
    # all vertices distinct
    assert len(np.unique(np.round(v, 9), axis=0)) == v.shape[0]
    # poles at +-z
    np.testing.assert_allclose(v[-2], [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose(v[-1], [0, 0, -1], atol=1e-12)


@pytest.mark.parametrize("s", [1, 2, 3])
def test_edges_are_geometric_neighbors(s):
    """Mesh edges must connect geometrically nearby points on the sphere.

    For an icosphere the max edge chord at subdivision s is strictly smaller
    than the min distance between non-adjacent vertices near any vertex, so a
    wrong seam stitch (connecting far-away vertices) would blow up the max
    edge length. Compare max edge chord against the base edge length / 2^s
    with generous slack.
    """
    v, f = ico.get_icosahedral_grid(s)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    d = np.linalg.norm(v[edges[:, 0]] - v[edges[:, 1]], axis=1)
    base_edge = np.linalg.norm(
        ico.base_icosahedron()[0][0] - ico.base_icosahedron()[0][10]
    )
    assert d.max() < 1.4 * base_edge / 2**s
    assert d.min() > 0.4 * base_edge / 2**s


@pytest.mark.parametrize("s", [2, 3])
def test_five_fold_symmetry(s):
    """Rotating charts by one (c -> c+1) == rotating the sphere by 72 deg."""
    v = ico.get_vertex_coords(s)
    h, w = ico.chart_shape(s)
    n = 5 * h * w
    rolled = np.roll(v[:n].reshape(5, h * w, 3), -1, axis=0).reshape(n, 3)
    ang = 2 * np.pi / 5
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    np.testing.assert_allclose(rolled, v[:n] @ R.T, atol=1e-9)


def test_patch_ids():
    s = 3
    p = ico.get_patch_ids(s)
    h, w = ico.chart_shape(s)
    assert p.shape == (ico.num_vertices(s),)
    assert (p[: 5 * h * w].reshape(5, h * w) == np.arange(5)[:, None]).all()
    assert p[-2] == 5 and p[-1] == 6
