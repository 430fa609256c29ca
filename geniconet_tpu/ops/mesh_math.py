"""Differentiable mesh math on TPU: vertex normals and the umbrella Laplacian.

The reference computes these per training step on the predicted vertices
(reference losses.py:53-57) using a torch scatter-add / sparse matvec from a
non-vendored sibling repo. Scatter and sparse ops are a poor fit for the TPU;
here both are *dense masked gathers* with static shapes:

* vertex normals — face normals from a ``(F, 3)`` gather + cross product,
  then per-vertex accumulation via the precomputed ``(V, 6)``
  incident-face table (every vertex touches ≤ 6 faces). Numerical spec is
  the reference's numpy twin ``generate.py:20-43``: area-weighted face
  normals summed per vertex, then normalized with an eps-clipped magnitude.
* umbrella Laplacian — ``lap_i = (Σ_{j∈N(i)} v_j) / deg_i − v_i`` via the
  ``(V, 6)`` neighbor table (usage contract: reference generate.py:197,
  losses.py:57 — `compute_laplacian` over the sparse adjacency).

Both are jit-safe, batched, and differentiable (used inside the training
loss), with fp32 math regardless of input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from geniconet_tpu.geometry import ico

__all__ = [
    "face_normals",
    "vertex_normals",
    "laplacian",
    "laplacian_numpy",
    "vertex_normals_numpy",
]

_EPS = 1e-10


def safe_norm(x: jnp.ndarray, axis=-1, keepdims=True, eps: float = _EPS) -> jnp.ndarray:
    """eps-floored L2 norm with a NaN-free gradient at zero vectors.

    ``maximum(linalg.norm(x), eps)`` is NOT safe: the norm's gradient at 0 is
    NaN and ``0 * NaN = NaN`` propagates through the clamp. Clamping the
    squared sum *inside* the sqrt keeps the whole backward path finite —
    degenerate (zero-area) faces do occur in early training.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def face_normals(v: jnp.ndarray, faces: jnp.ndarray, *, normalize: bool = False) -> jnp.ndarray:
    """(B, V, 3), (F, 3) -> (B, F, 3) (area-weighted unless normalize=True)."""
    p0 = jnp.take(v, faces[:, 0], axis=1)
    p1 = jnp.take(v, faces[:, 1], axis=1)
    p2 = jnp.take(v, faces[:, 2], axis=1)
    n = jnp.cross(p1 - p0, p2 - p0)
    if normalize:
        n = n / safe_norm(n)
    return n


def vertex_normals(v: jnp.ndarray, subdivisions: int) -> jnp.ndarray:
    """(B, V, 3) vertices -> (B, V, 3) unit vertex normals.

    Spec: reference generate.py:20-43 (area-weighted accumulation).
    """
    v = v.astype(jnp.float32)
    faces = jnp.asarray(ico.get_ico_faces(subdivisions))
    fidx, fmask = ico.get_vertex_face_table(subdivisions)
    fn = face_normals(v, faces)                                # (B, F, 3)
    gathered = jnp.take(fn, jnp.asarray(fidx), axis=1)         # (B, V, 6, 3)
    gathered = gathered * jnp.asarray(fmask, jnp.float32)[None, :, :, None]
    vn = jnp.sum(gathered, axis=2)                             # (B, V, 3)
    return vn / safe_norm(vn)


def laplacian(v: jnp.ndarray, subdivisions: int) -> jnp.ndarray:
    """(B, V, C) signal -> (B, V, C) umbrella Laplacian (mean-of-neighbors − self)."""
    v = v.astype(jnp.float32)
    nbrs, mask = ico.get_neighbor_table(subdivisions)
    deg = mask.sum(axis=1).astype(np.float32)                  # (V,)
    gathered = jnp.take(v, jnp.asarray(nbrs), axis=1)          # (B, V, 6, C)
    gathered = gathered * jnp.asarray(mask, jnp.float32)[None, :, :, None]
    mean_nbr = jnp.sum(gathered, axis=2) / jnp.asarray(deg)[None, :, None]
    return mean_nbr - v


# ---------------------------------------------------------------------------
# Pure-numpy oracles (tests + offline preprocessing)
# ---------------------------------------------------------------------------


def vertex_normals_numpy(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Single-mesh (V, 3) numpy twin; spec of reference generate.py:20-43."""
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    vn = np.zeros_like(vertices)
    np.add.at(vn, faces[:, 0], fn)
    np.add.at(vn, faces[:, 1], fn)
    np.add.at(vn, faces[:, 2], fn)
    mag = np.clip(np.sqrt((vn**2).sum(axis=1)), _EPS, None)[:, None]
    return vn / mag


def laplacian_numpy(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Single-mesh (V, C) umbrella Laplacian oracle (mean-of-neighbors − self)."""
    V = vertices.shape[0]
    nbr_sets: list[set[int]] = [set() for _ in range(V)]
    for a, b, c in faces:
        nbr_sets[a].update((b, c))
        nbr_sets[b].update((a, c))
        nbr_sets[c].update((a, b))
    out = np.zeros_like(vertices)
    for i, s in enumerate(nbr_sets):
        idx = sorted(s)
        out[i] = vertices[idx].mean(axis=0) - vertices[i]
    return out
