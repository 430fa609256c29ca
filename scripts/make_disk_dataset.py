"""Synthesize a ModelNet-layout raw dataset for the file-based e2e chain.

The reference's real inputs are manifold ``.off`` meshes plus per-mesh
``.mat`` sampling weights produced by the (out-of-repo) spherical
parameterization pipeline (reference README.md:26-33, generate.py:52-60).
Neither the ModelNet10 npz release nor the Matlab tools are reachable in
this environment (zero egress), so this script manufactures inputs with the
same *shape*: per sample, a deformed-icosphere source mesh written as
``.off`` (randomly rotated, so source vertices do NOT align with the target
grid) and a ``sparse_indices``/``sparse_weights`` ``.mat`` that resamples
the source onto the subdivision-``s`` icosahedral grid via its 3 nearest
source vertices — exactly the contract ``geniconet_tpu.data.generate``
consumes. Classes differ in their radial-bump statistics so latent-space
structure (PCA class clusters) is learnable.

Layout (``--nested_dir 2`` / ModelNet style):
    <root>/data/<class>/{train,test}/mesh_<id>.off
    <root>/weights/<class>/{train,test}/weights_<id>.mat
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scipy.io import savemat
from scipy.spatial import cKDTree

from geniconet_tpu.data.offio import write_off
from geniconet_tpu.geometry import ico


def _class_field(base: np.ndarray, rng: np.random.RandomState, cls: int) -> np.ndarray:
    """Radial field with per-class mode statistics (class = frequency band)."""
    r = np.ones(base.shape[0], np.float32)
    n_modes = 3 + 2 * cls
    for _ in range(n_modes):
        d = rng.randn(3).astype(np.float32)
        d /= np.linalg.norm(d)
        freq = rng.uniform(0.8 + 0.7 * cls, 1.6 + 0.9 * cls)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.03, 0.14) / np.sqrt(n_modes / 3)
        r += amp * np.sin(freq * np.pi * (base @ d) + phase).astype(np.float32)
    return r


def _random_rotation(rng: np.random.RandomState) -> np.ndarray:
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def make_sample(out_off: str, out_mat: str, s: int, cls: int, seed: int,
                sphere_v: np.ndarray, sphere_f: np.ndarray, grid_v: np.ndarray):
    rng = np.random.RandomState(seed)
    R = _random_rotation(rng)
    base = sphere_v @ R.T                       # rotated unit sphere
    r = _class_field(base, rng, cls)
    verts = (r[:, None] * base).astype(np.float32)
    write_off(out_off, verts, sphere_f)

    # weights: each grid vertex <- 3 nearest *rotated sphere* vertices
    # (directional matching, like a spherical-parameterization resample)
    _, nn = cKDTree(base).query(grid_v, k=3)
    n_ico = grid_v.shape[0]
    rows = np.repeat(np.arange(1, n_ico + 1), 3)          # 1-based (Matlab)
    cols = (nn + 1).reshape(-1)
    vals = np.full(rows.shape[0], 1.0 / 3.0, np.float32)
    savemat(
        out_mat,
        {
            "sparse_indices": np.stack([rows, cols], axis=1).astype(np.float64),
            "sparse_weights": vals[:, None],
        },
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--root", required=True)
    p.add_argument("--subdivision", type=int, default=5)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--n_train", type=int, default=45, help="per class")
    p.add_argument("--n_test", type=int, default=9, help="per class")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    s = a.subdivision
    sphere_v, sphere_f = ico.get_icosahedral_grid(s)   # source mesh topology
    grid_v = ico.get_vertex_coords(s)                  # resample targets
    uid = 0
    for c in range(a.classes):
        cls = f"class{c}"
        for split, n in (("train", a.n_train), ("test", a.n_test)):
            d_off = os.path.join(a.root, "data", cls, split)
            d_mat = os.path.join(a.root, "weights", cls, split)
            os.makedirs(d_off, exist_ok=True)
            os.makedirs(d_mat, exist_ok=True)
            for _ in range(n):
                make_sample(
                    os.path.join(d_off, f"mesh_{uid}.off"),
                    os.path.join(d_mat, f"weights_{uid}.mat"),
                    s, c, a.seed + uid, sphere_v, sphere_f, grid_v,
                )
                uid += 1
    print(f"wrote {uid} samples under {a.root} "
          f"({a.classes} classes x ({a.n_train} train + {a.n_test} test))")


if __name__ == "__main__":
    main()
