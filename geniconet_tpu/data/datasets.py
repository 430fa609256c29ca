"""Datasets: npz ico-signal loading, directory layouts, synthetic data.

File-format contract (reference data.py:64-69): each sample is an ``.npz``
with key ``"data"`` of shape ``(9, V)`` float — rows 0:3 vertex positions,
3:6 normals, 6:9 Laplacian, poles stored LAST (V = 10·4^s + 2). The network
input is rows 0:3 without the 2 poles, reshaped to the ``(5·2^s, 2^(s+1))``
grid; the target is the full ``(V, 9)``.

Directory layouts (reference data.py:7-36):
* ``level=1`` (SHREC-style): ``<root>/*.npz``
* ``level=2`` (ModelNet-style): ``<root>/<class>/{train,test}/*.npz`` with
  instance mapping trn→train, val→test.

Loading is eager into packed numpy arrays (the reference also eager-loads,
data.py:79-80); batches are then zero-copy slices, which is what a TPU host
loop wants.

``synthetic_dataset`` generates closed genus-0 meshes (random smooth radial
fields on the icosahedral sphere) with self-consistent normals/Laplacian
targets — used by tests, benchmarks and quick-start (no dataset download in
this environment).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import numpy as np

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops import mesh_math

__all__ = [
    "natural_sort",
    "list_files",
    "load_ico_npz",
    "save_ico_npz",
    "IcoDataset",
    "synthetic_dataset",
    "synthetic_vertices",
]

_NUM_RE = re.compile(r"(\d+)")


def natural_sort(names):
    """Natural (numeric-aware) sort, replacement for natsort.natsorted."""

    def key(s):
        return [int(t) if t.isdigit() else t.lower() for t in _NUM_RE.split(str(s))]

    return sorted(names, key=key)


def list_files(root: str, ext: str = ".npz", level: int = 2, instance: str = "trn"):
    """List dataset files for the given layout level and data instance."""
    out = []
    if level == 1:
        for f in natural_sort(os.listdir(root)):
            if f.endswith(ext):
                out.append(os.path.join(root, f))
    elif level == 2:
        sub = {"trn": "train", "val": "test", "tst": "test"}.get(instance, instance)
        for cls in sorted(os.listdir(root)):
            d = os.path.join(root, cls, sub)
            if not os.path.isdir(d):
                continue
            for f in natural_sort(os.listdir(d)):
                if f.endswith(ext):
                    out.append(os.path.join(d, f))
    else:
        raise ValueError(f"unsupported layout level {level}")
    return out


def load_ico_npz(path: str, subdivisions: int):
    """-> (input grid (H, W, 3) float32, target (V, 9) float32)."""
    data = np.load(path)["data"].astype(np.float32)  # (9, V)
    V = ico.num_vertices(subdivisions)
    if data.shape != (9, V):
        raise ValueError(f"{path}: expected (9, {V}), got {data.shape}")
    H, W = ico.grid_shape(subdivisions)
    grid = data[0:3, :-2].reshape(3, H, W).transpose(1, 2, 0)
    return np.ascontiguousarray(grid), np.ascontiguousarray(data.T)


def load_ico_mat(path: str, subdivisions: int):
    """Load a ``.mat`` ico grid sample (reference data.py:47-58 semantics).

    The mat carries ``variable`` of shape (H, W, C); channels 0:3 are
    0-255-scaled positions (divided by 255 here). Returns the same
    (grid (H, W, 3), target (V, 9)) contract as `load_ico_npz`, with the
    normals/Laplacian target rows computed from the loaded positions.
    """
    from scipy.io import loadmat

    from geniconet_tpu.ops.mesh_math import laplacian_numpy, vertex_normals_numpy
    from geniconet_tpu.ops.vertices import grid_to_vertices

    md = loadmat(path)
    if "sparse_weights" in md:
        raise ValueError(
            f"{path}: sampling-weight .mat files are preprocessing inputs — "
            "use geniconet_tpu.data.generate"
        )
    if "variable" not in md:
        raise ValueError(f"{path}: unhandleable .mat contents")
    arr = np.asarray(md["variable"], np.float32)  # (H, W, C)
    H, W = ico.grid_shape(subdivisions)
    if arr.shape[:2] != (H, W):
        raise ValueError(f"{path}: expected ({H}, {W}, C), got {arr.shape}")
    grid = np.ascontiguousarray(arr[:, :, :3] / 255.0)
    if np.isnan(grid).any():
        raise ValueError(f"{path}: NaNs in the data")
    import jax.numpy as jnp

    v = np.asarray(grid_to_vertices(jnp.asarray(grid[None]), subdivisions))[0]
    faces = ico.get_ico_faces(subdivisions)
    target = np.concatenate(
        [v, vertex_normals_numpy(v, faces), laplacian_numpy(v, faces)], axis=1
    ).astype(np.float32)
    return grid, np.ascontiguousarray(target)


def save_ico_npz(path: str, pos: np.ndarray, nor: np.ndarray, lap: np.ndarray):
    """Write the (9, V) 'data' npz the loader expects (generate.py:200-203)."""
    data = np.concatenate([pos, nor, lap], axis=1).astype(np.float32)  # (V, 9)
    np.savez(path, data=data.transpose())


@dataclass
class IcoDataset:
    """Packed in-memory dataset.

    inputs:  (N, H, W, 3) float32 grids
    targets: (N, V, 9) float32 [pos | normals | laplacian]
    names:   per-sample identifiers (file stems)
    classes: per-sample class label strings (ModelNet layout) or ''
    """

    inputs: np.ndarray
    targets: np.ndarray
    names: list[str] = field(default_factory=list)
    classes: list[str] = field(default_factory=list)
    subdivisions: int = 5

    def __len__(self):
        return self.inputs.shape[0]

    @staticmethod
    def from_directory(
        root: str,
        subdivisions: int,
        level: int = 2,
        instance: str = "trn",
        ext: str = ".npz",
        quick_learn: int = 0,
    ) -> "IcoDataset":
        files = list_files(root, ext, level, instance)
        if quick_learn:
            files = files[:quick_learn]
        if not files:
            raise FileNotFoundError(f"no {ext} files under {root} ({instance})")
        H, W = ico.grid_shape(subdivisions)
        V = ico.num_vertices(subdivisions)
        inputs = np.empty((len(files), H, W, 3), np.float32)
        targets = np.empty((len(files), V, 9), np.float32)
        names, classes = [], []
        loader = load_ico_mat if ext == ".mat" else load_ico_npz
        for k, f in enumerate(files):
            inputs[k], targets[k] = loader(f, subdivisions)
            names.append(os.path.splitext(os.path.basename(f))[0])
            cls = os.path.basename(os.path.dirname(os.path.dirname(f))) if level == 2 else ""
            classes.append(cls)
        return IcoDataset(inputs, targets, names, classes, subdivisions)


def synthetic_vertices(subdivisions: int, rng: np.random.RandomState, n_modes: int = 6):
    """One random smooth genus-0 mesh on the ico grid: r(x) = 1 + bumps."""
    base = ico.get_vertex_coords(subdivisions).astype(np.float32)  # (V, 3)
    r = np.ones(base.shape[0], np.float32)
    for _ in range(n_modes):
        d = rng.randn(3).astype(np.float32)
        d /= np.linalg.norm(d)
        freq = rng.uniform(1.0, 3.0)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.02, 0.12)
        r += amp * np.sin(freq * np.pi * (base @ d) + phase).astype(np.float32)
    scale = rng.uniform(0.5, 0.9)
    return (scale / np.abs(r).max()) * r[:, None] * base


def synthetic_dataset(
    subdivisions: int, n: int, seed: int = 0, class_names: tuple[str, ...] = ("synth",)
) -> IcoDataset:
    """Dataset of random smooth meshes with consistent (pos, nor, lap) targets.

    Vertex coordinates are scaled into (-1, 1) so the tanh output head can
    represent them, like the reference's normalized ModelNet data.
    """
    rng = np.random.RandomState(seed)
    faces = ico.get_ico_faces(subdivisions)
    H, W = ico.grid_shape(subdivisions)
    V = ico.num_vertices(subdivisions)
    inputs = np.empty((n, H, W, 3), np.float32)
    targets = np.empty((n, V, 9), np.float32)
    names, classes = [], []
    for k in range(n):
        v = synthetic_vertices(subdivisions, rng)
        nor = mesh_math.vertex_normals_numpy(v, faces)
        lap = mesh_math.laplacian_numpy(v, faces)
        targets[k] = np.concatenate([v, nor, lap], axis=1)
        inputs[k] = v[:-2].reshape(H, W, 3)
        names.append(f"synth_{k}")
        classes.append(class_names[k % len(class_names)])
    return IcoDataset(inputs, targets, names, classes, subdivisions)
