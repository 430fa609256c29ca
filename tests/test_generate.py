"""Preprocessing CLI: .off + .mat -> .npz pipeline end-to-end."""

import os

import numpy as np
import pytest

from geniconet_tpu.data import generate
from geniconet_tpu.data.datasets import load_ico_npz
from geniconet_tpu.data.offio import write_off
from geniconet_tpu.geometry import ico
from geniconet_tpu.ops import mesh_math

scipy = pytest.importorskip("scipy")
from scipy.io import savemat  # noqa: E402

S = 2


def _make_pair(tmp_path, idx, scale=0.7, seed=0):
    """A dense source mesh + a .mat whose sampling matrix selects a smooth
    combination of source vertices for each ico grid vertex."""
    rng = np.random.RandomState(seed)
    # source mesh = icosphere at subdivision S+1 (denser), scaled
    src_v, src_f = ico.get_icosahedral_grid(S + 1)
    src_v = (src_v * scale).astype(np.float32)
    off = str(tmp_path / f"mesh_{idx}.off")
    write_off(off, src_v, src_f)

    # sampling weights: each ico-S vertex = average of 3 nearest source verts
    tgt_v = ico.get_vertex_coords(S)
    n_ico = tgt_v.shape[0]
    rows, cols, vals = [], [], []
    for i in range(n_ico):
        d = np.linalg.norm(src_v / scale - tgt_v[i], axis=1)
        nn = np.argsort(d)[:3]
        for j in nn:
            rows.append(i + 1)  # 1-based, like the Matlab pipeline
            cols.append(j + 1)
            vals.append(1.0 / 3.0)
    mat = str(tmp_path / f"weights_{idx}.mat")
    savemat(
        mat,
        {
            "sparse_indices": np.stack([rows, cols], axis=1).astype(np.float64),
            "sparse_weights": np.asarray(vals, np.float32)[:, None],
        },
    )
    return off, mat


def test_process_pair(tmp_path):
    off, mat = _make_pair(tmp_path, 1)
    out = str(tmp_path / "out_1.npz")
    ok = generate.process_pair(off, mat, out, S)
    assert ok
    grid, target = load_ico_npz(out, S)
    V = ico.num_vertices(S)
    assert target.shape == (V, 9)
    # positions ~ scaled sphere (3-NN average of a 0.7-sphere)
    r = np.linalg.norm(target[:, :3], axis=1)
    assert 0.6 < r.min() and r.max() < 0.72
    # normals/lap consistent with our mesh math on the sampled vertices
    faces = ico.get_ico_faces(S)
    np.testing.assert_allclose(
        target[:, 3:6], mesh_math.vertex_normals_numpy(target[:, :3], faces), atol=1e-5
    )
    np.testing.assert_allclose(
        target[:, 6:9], mesh_math.laplacian_numpy(target[:, :3], faces), atol=1e-5
    )


def test_cli_flat_and_skip(tmp_path):
    d_off = tmp_path / "off"
    d_mat = tmp_path / "mat"
    d_out = tmp_path / "out"
    d_off.mkdir(), d_mat.mkdir()
    for i in [1, 2]:
        off, mat = _make_pair(tmp_path, i, seed=i)
        os.rename(off, d_off / os.path.basename(off))
        os.rename(mat, d_mat / os.path.basename(mat))
    # unmatched extra off file is ignored
    write_off(str(d_off / "mesh_99.off"), *ico.get_icosahedral_grid(1))

    argv = [
        "--data_dir", str(d_off), "--samp_weights_dir", str(d_mat),
        "--out_dir", str(d_out), "--subdivision", str(S),
    ]
    generate.main(argv)
    assert sorted(os.listdir(d_out)) == ["weights_1.npz", "weights_2.npz"]
    # idempotent: rerun skips existing outputs
    t0 = os.path.getmtime(d_out / "weights_1.npz")
    generate.main(argv)
    assert os.path.getmtime(d_out / "weights_1.npz") == t0


def test_unitsphere_normalization(tmp_path):
    off, mat = _make_pair(tmp_path, 3, scale=5.0)
    out = str(tmp_path / "out_3.npz")
    generate.process_pair(off, mat, out, S, normalization_mode="unitsphere")
    _, target = load_ico_npz(out, S)
    r = np.linalg.norm(target[:, :3] - target[:, :3].mean(0), axis=1)
    assert r.max() <= 1.0 + 1e-6
    assert r.max() > 0.95
