"""Point-to-mesh distance on TPU — the kaolin CUDA kernel replacement.

The reference's evaluation metric of record is the mean point→mesh distance
computed by kaolin's compiled CUDA extension (reference ico_utils.py:26-44,
run.py:531-534; kaolin 0.9.1 ``point_to_mesh_distance`` returns *squared*
distances, and the reference averages them). Here it is a batched JAX op:
exact point-to-triangle closest-point computation (barycentric region
classification, Ericson's method) for every (point, triangle) pair, tiled
over triangle chunks with a running min inside a ``lax.scan`` so the
(P × F) pair matrix never materializes in HBM at once.

A pure-numpy twin (`point_to_mesh_distance_numpy`) serves as the exactness
oracle in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["point_to_triangle_sq", "point_to_mesh_distance", "point_to_mesh_distance_numpy"]


def point_to_triangle_sq(p: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Squared distances between points and triangles, all pairs.

    Args:
      p: (P, 3) query points.
      tri: (T, 3, 3) triangle vertices.

    Returns:
      (P, T) squared distances.
    """
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]        # (T, 3)
    ab = b - a
    ac = c - a
    ap = p[:, None, :] - a[None, :, :]               # (P, T, 3)

    d1 = jnp.einsum("tk,ptk->pt", ab, ap)
    d2 = jnp.einsum("tk,ptk->pt", ac, ap)
    bp = p[:, None, :] - b[None, :, :]
    d3 = jnp.einsum("tk,ptk->pt", ab, bp)
    d4 = jnp.einsum("tk,ptk->pt", ac, bp)
    cp = p[:, None, :] - c[None, :, :]
    d5 = jnp.einsum("tk,ptk->pt", ab, cp)
    d6 = jnp.einsum("tk,ptk->pt", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-20
    # face region barycentric coordinates
    denom = jnp.maximum(va + vb + vc, eps)
    v_f = vb / denom
    w_f = vc / denom
    # edge clamps
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, eps), 0.0, 1.0)
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, eps), 0.0, 1.0)
    t_bc = jnp.clip(
        (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), eps), 0.0, 1.0
    )

    # candidate closest points
    q_face = a[None] + v_f[..., None] * ab[None] + w_f[..., None] * ac[None]
    q_ab = a[None] + t_ab[..., None] * ab[None]
    q_ac = a[None] + t_ac[..., None] * ac[None]
    q_bc = b[None] + t_bc[..., None] * (c - b)[None]

    # region selection (Ericson, Real-Time Collision Detection §5.1.5)
    in_vertex_a = (d1 <= 0) & (d2 <= 0)
    in_vertex_b = (d3 >= 0) & (d4 <= d3)
    in_vertex_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    q = q_face
    q = jnp.where(in_edge_bc[..., None], q_bc, q)
    q = jnp.where(in_edge_ac[..., None], q_ac, q)
    q = jnp.where(in_edge_ab[..., None], q_ab, q)
    q = jnp.where(in_vertex_c[..., None], c[None], q)
    q = jnp.where(in_vertex_b[..., None], b[None], q)
    q = jnp.where(in_vertex_a[..., None], a[None], q)

    d = p[:, None, :] - q
    return jnp.sum(d * d, axis=-1)


@partial(jax.jit, static_argnames=("chunk", "squared"))
def point_to_mesh_distance(
    points: jnp.ndarray,
    mesh_vertices: jnp.ndarray,
    faces: jnp.ndarray,
    chunk: int = 2048,
    squared: bool = True,
) -> jnp.ndarray:
    """Min distance from each point to the triangle mesh.

    Args:
      points: (P, 3).
      mesh_vertices: (V, 3).
      faces: (F, 3) int.
      chunk: triangles per scan step (bounds peak memory at P×chunk).
      squared: return squared distances (kaolin 0.9.1 behavior the
        reference's metric uses) or Euclidean.

    Returns:
      (P,) distances.
    """
    tri = jnp.take(mesh_vertices.astype(jnp.float32), faces, axis=0)  # (F, 3, 3)
    F = tri.shape[0]
    pad = (-F) % chunk
    if pad:
        # pad with copies of the first triangle — cannot increase the min
        tri = jnp.concatenate([tri, jnp.broadcast_to(tri[:1], (pad, 3, 3))], axis=0)
    tri = tri.reshape(-1, chunk, 3, 3)
    p = points.astype(jnp.float32)

    def body(best, tri_chunk):
        d = point_to_triangle_sq(p, tri_chunk)
        return jnp.minimum(best, jnp.min(d, axis=1)), None

    init = jnp.full((p.shape[0],), jnp.inf, jnp.float32)
    best, _ = jax.lax.scan(body, init, tri)
    return best if squared else jnp.sqrt(best)


def point_to_mesh_distance_numpy(points, mesh_vertices, faces, squared=True):
    """Exact numpy oracle (double precision, brute force)."""
    p = np.asarray(points, np.float64)
    tri = np.asarray(mesh_vertices, np.float64)[np.asarray(faces)]
    best = np.full(p.shape[0], np.inf)
    for k in range(tri.shape[0]):
        a, b, c = tri[k]
        ab, ac = b - a, c - a
        ap = p - a
        d1, d2 = ap @ ab, ap @ ac
        bp = p - b
        d3, d4 = bp @ ab, bp @ ac
        cp = p - c
        d5, d6 = cp @ ab, cp @ ac
        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2
        q = np.empty_like(p)
        # face region
        denom = np.maximum(va + vb + vc, 1e-300)
        v = (vb / denom)[:, None]
        w = (vc / denom)[:, None]
        q[:] = a + v * ab + w * ac
        m = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
        t = np.clip((d4 - d3) / np.maximum((d4 - d3) + (d5 - d6), 1e-300), 0, 1)
        q[m] = b + t[m, None] * (c - b)
        m = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
        t = np.clip(d2 / np.maximum(d2 - d6, 1e-300), 0, 1)
        q[m] = a + t[m, None] * ac
        m = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
        t = np.clip(d1 / np.maximum(d1 - d3, 1e-300), 0, 1)
        q[m] = a + t[m, None] * ab
        m = (d6 >= 0) & (d5 <= d6)
        q[m] = c
        m = (d3 >= 0) & (d4 <= d3)
        q[m] = b
        m = (d1 <= 0) & (d2 <= 0)
        q[m] = a
        d = ((p - q) ** 2).sum(1)
        best = np.minimum(best, d)
    return best if squared else np.sqrt(best)
