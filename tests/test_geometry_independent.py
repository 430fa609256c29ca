"""Fully independent geometry cross-check.

Builds the icosphere a SECOND way — classic recursive face subdivision with
vertex deduplication by position — and verifies that the chart-based
construction in geometry/ico.py produces the identical mesh: same vertex set
(matched by position) and same edge set under that matching. This shares no
code with the chart parameterization, so a seam-stitching bug that still
satisfies manifold invariants would be caught here.
"""

import numpy as np
import pytest

from geniconet_tpu.geometry import ico


def _icosphere_by_subdivision(s):
    """Recursive midpoint icosphere with positional dedup (independent path)."""
    base_v, _ = ico.base_icosahedron()
    # base faces from scratch: n=10, s=11, u_c=c, l_c=5+c
    faces = []
    for c in range(5):
        c1 = (c + 1) % 5
        faces += [
            (10, c, c1),          # top fan
            (c, 5 + c, c1),       # upper middle
            (c1, 5 + c, 5 + c1),  # lower middle
            (5 + c, 11, 5 + c1),  # bottom fan
        ]
    verts = [tuple(v) for v in base_v]
    index = {np.round(v, 9).tobytes(): i for i, v in enumerate(base_v)}
    faces = np.asarray(faces, np.int64)

    def midpoint(a, b):
        m = np.asarray(verts[a]) + np.asarray(verts[b])
        m = m / np.linalg.norm(m)
        key = np.round(m, 9).tobytes()
        if key not in index:
            index[key] = len(verts)
            verts.append(tuple(m))
        return index[key]

    for _ in range(s):
        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (ab, b, bc), (ca, bc, c), (ab, bc, ca)]
        faces = np.asarray(new_faces, np.int64)
    return np.asarray(verts), faces


@pytest.mark.parametrize("s", [1, 2, 3])
def test_chart_construction_matches_independent_icosphere(s):
    v1, f1 = ico.get_icosahedral_grid(s)
    v2, f2 = _icosphere_by_subdivision(s)
    assert v1.shape == v2.shape and f1.shape == f2.shape

    # match vertices by position (both lie on the unit sphere)
    key2 = {np.round(v, 7).tobytes(): i for i, v in enumerate(v2)}
    mapping = np.empty(len(v1), np.int64)
    for i, v in enumerate(v1):
        k = np.round(v, 7).tobytes()
        assert k in key2, f"vertex {i} of the chart construction not found"
        mapping[i] = key2[k]
    assert len(set(mapping.tolist())) == len(v1)  # bijection

    def edge_set(f):
        es = set()
        for a, b, c in f:
            for e in ((a, b), (b, c), (c, a)):
                es.add((min(e), max(e)))
        return es

    e1 = {(min(mapping[a], mapping[b]), max(mapping[a], mapping[b]))
          for (a, b) in edge_set(f1)}
    e2 = edge_set(f2)
    assert e1 == e2, (
        f"edge sets differ: {len(e1 - e2)} extra, {len(e2 - e1)} missing"
    )
