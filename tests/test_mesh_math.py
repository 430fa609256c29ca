"""Vertex normals, Laplacian, and grid<->vertex conversions vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops import mesh_math
from geniconet_tpu.ops.vertices import grid_to_vertices, vertices_to_grid


@pytest.mark.parametrize("s", [1, 2, 3])
def test_vertex_normals_match_numpy_oracle(s):
    rng = np.random.RandomState(0)
    v = ico.get_vertex_coords(s).astype(np.float32)
    v = v + 0.05 * rng.randn(*v.shape).astype(np.float32)  # non-spherical
    faces = ico.get_ico_faces(s)
    expected = mesh_math.vertex_normals_numpy(v, faces)
    got = np.asarray(mesh_math.vertex_normals(jnp.asarray(v[None]), s))[0]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_vertex_normals_sphere_point_outward():
    s = 3
    v = ico.get_vertex_coords(s).astype(np.float32)
    n = np.asarray(mesh_math.vertex_normals(jnp.asarray(v[None]), s))[0]
    # normals of a sphere mesh ~= radial directions
    cos = (n * v).sum(axis=1)
    assert cos.min() > 0.9


@pytest.mark.parametrize("s", [1, 2, 3])
def test_laplacian_matches_numpy_oracle(s):
    rng = np.random.RandomState(1)
    v = rng.randn(ico.num_vertices(s), 3).astype(np.float32)
    faces = ico.get_ico_faces(s)
    expected = mesh_math.laplacian_numpy(v, faces)
    got = np.asarray(mesh_math.laplacian(jnp.asarray(v[None]), s))[0]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_laplacian_of_constant_is_zero():
    s = 2
    v = jnp.full((2, ico.num_vertices(s), 3), 3.25)
    lap = np.asarray(mesh_math.laplacian(v, s))
    np.testing.assert_allclose(lap, 0.0, atol=1e-6)


def test_normals_differentiable():
    s = 2
    v = jnp.asarray(ico.get_vertex_coords(s).astype(np.float32))[None]

    def f(v):
        return jnp.sum(mesh_math.vertex_normals(v, s))

    g = jax.grad(f)(v)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("s", [2, 5])
def test_grid_vertices_roundtrip(s):
    """grid -> vertices appends pole means; vertices -> grid drops them.

    Pole means follow the reference recipe (ico_utils.py:10-24): top pole =
    mean over grid rows c*2^s col 0, bottom = rows (c+1)*2^s-1 last col.
    """
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5 * h, w, 3).astype(np.float32)
    v = np.asarray(grid_to_vertices(jnp.asarray(x), s))
    assert v.shape == (2, ico.num_vertices(s), 3)
    # explicit reference-style indexing on the stacked (H, W) grid
    rows_top = np.arange(5) * h
    rows_bot = np.arange(1, 6) * h - 1
    np.testing.assert_allclose(v[:, -2], x[:, rows_top, 0, :].mean(axis=1), rtol=1e-6)
    np.testing.assert_allclose(v[:, -1], x[:, rows_bot, -1, :].mean(axis=1), rtol=1e-6)
    np.testing.assert_allclose(v[:, : 5 * h * w], x.reshape(2, -1, 3), rtol=1e-6)
    back = np.asarray(vertices_to_grid(jnp.asarray(v), s))
    np.testing.assert_array_equal(back, x)


def test_grid_vertices_storage_order_matches_geometry():
    """Row-major flatten of the grid == geometry storage ids (the contract
    that makes faces/normals correct on network outputs)."""
    s = 2
    h, w = ico.chart_shape(s)
    coords = ico.get_vertex_coords(s).astype(np.float32)
    grid = coords[: 5 * h * w].reshape(1, 5 * h, w, 3)
    v = np.asarray(grid_to_vertices(jnp.asarray(grid), s))[0]
    np.testing.assert_allclose(v[:-2], coords[:-2], rtol=1e-6)


# ---------------------------------------------------------------------------
# Gather-transpose backwards (round-4: scatter-free loss-route gradients)
# ---------------------------------------------------------------------------


def _vn_plain(v, s):
    """vertex_normals spelled with plain takes (autodiff -> scatter-add)."""
    faces = jnp.asarray(ico.get_ico_faces(s))
    fidx, fmask = ico.get_vertex_face_table(s)
    fn = mesh_math.face_normals(v, faces)
    gathered = jnp.take(fn, jnp.asarray(fidx), axis=1)
    gathered = gathered * jnp.asarray(fmask, jnp.float32)[None, :, :, None]
    vn = jnp.sum(gathered, axis=2)
    return vn / mesh_math.safe_norm(vn)


def _lap_plain(v, s):
    nbrs, mask = ico.get_neighbor_table(s)
    deg = mask.sum(axis=1).astype(np.float32)
    gathered = jnp.take(v, jnp.asarray(nbrs), axis=1)
    gathered = gathered * jnp.asarray(mask, jnp.float32)[None, :, :, None]
    return jnp.sum(gathered, axis=2) / jnp.asarray(deg)[None, :, None] - v


@pytest.mark.parametrize("s", [1, 2, 3])
def test_gather_transpose_backwards_match_scatter_autodiff(s):
    """The custom-VJP inverse-incidence gathers must reproduce XLA's
    scatter-add transpose: forward bit-exact, gradients equal up to fp32
    summation order."""
    rng = np.random.RandomState(7)
    V = ico.num_vertices(s)
    v = jnp.asarray(rng.randn(2, V, 3).astype(np.float32))
    for f_new, f_ref in [
        (lambda x: mesh_math.vertex_normals(x, s), lambda x: _vn_plain(x, s)),
        (lambda x: mesh_math.laplacian(x, s), lambda x: _lap_plain(x, s)),
    ]:
        assert jnp.array_equal(f_new(v), f_ref(v))
        ct = jnp.asarray(rng.randn(*f_new(v).shape).astype(np.float32))
        g_new = jax.grad(lambda x: jnp.vdot(f_new(x), ct))(v)
        g_ref = jax.grad(lambda x: jnp.vdot(f_ref(x), ct))(v)
        scale = float(jnp.max(jnp.abs(g_ref)))
        np.testing.assert_allclose(
            np.asarray(g_new), np.asarray(g_ref), atol=1e-6 * max(scale, 1.0)
        )


def test_gather_transpose_tables_invariants():
    """Every inverse table row must cover exactly the incidences of the
    forward tables (counts: 3 corners per face; degree per vertex)."""
    s = 3
    t = mesh_math._gather_transpose_tables(s)
    faces = ico.get_ico_faces(s)
    _, fmask = ico.get_vertex_face_table(s)
    _, nmask = ico.get_neighbor_table(s)
    # each vertex references as many (face, slot) pairs as incident faces
    assert (t["fc_mask"].sum(axis=1) == fmask.sum(axis=1)).all()
    # vf_inv covers every unmasked vertex-face slot exactly once
    assert t["vf_inv"].shape == (faces.shape[0], 3)
    flat = t["vf_inv"].reshape(-1)
    assert len(set(flat.tolist())) == flat.size
    # neighbor inverse degree == forward degree (symmetric adjacency)
    assert (t["nb_mask"].sum(axis=1) == nmask.sum(axis=1)).all()
