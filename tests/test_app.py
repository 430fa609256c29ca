"""App backend: AppState capabilities + HTTP API end-to-end."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.geometry import ico
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def trained_log(tmp_path_factory):
    """Train tiny AE and VAE checkpoints once for the app tests."""
    root = tmp_path_factory.mktemp("applog")
    for name in ["ico2ico", "ico2ico_vae"]:
        cfg = Config()
        cfg.model.name = name
        cfg.model.subdivisions = 3
        cfg.model.widths = (8, 12, 16)
        cfg.model.latent_features = 24
        cfg.train.batch_size = 8
        cfg.train.train_epoch = 1
        cfg.train.log_mesh_epoch = 0
        cfg.log_dir = str(root)
        ds = synthetic_dataset(3, 8, seed=0)
        tr = Trainer(cfg)
        state = tr.init_state(ds.inputs[:1])
        trn = Batches(ds, 8, shuffle=True)
        val = Batches(ds, 8, shuffle=False)
        tr.fit(state, trn, val, 0)
    return str(root)


def _app_cfg(trained_log, name="ico2ico"):
    cfg = Config()
    cfg.model.name = name
    cfg.model.subdivisions = 3
    cfg.model.widths = (8, 12, 16)
    cfg.model.latent_features = 24
    cfg.log_dir = trained_log
    cfg.data.synthetic = 8
    return cfg


def test_appstate_ae_paths(trained_log):
    from geniconet_tpu.app.state import AppState

    st = AppState()
    info = st.load(_app_cfg(trained_log))
    assert info["n"] == 8 and not info["is_vae"]
    V = ico.num_vertices(3)

    v = st.reconstruct(0)
    assert v.shape == (V, 3)
    vi = st.interpolate(0, 1, 0.5)
    assert vi.shape == (V, 3)
    va, z = st.arithmetic([("+", 0), ("-", 1), ("+", 2)])
    assert va.shape == (V, 3) and z.shape == st.latents[0].shape
    ve = st.explore_channel(0, 2, 1.5, noise=0.1)
    assert ve.shape == (V, 3)
    vp = st.patch_combine(0, 1, [0, 3])
    assert vp.shape == (V, 3)
    # patch combine with all charts from j == reconstruction of j
    vall = st.patch_combine(0, 1, [0, 1, 2, 3, 4])
    np.testing.assert_allclose(vall, st.reconstruct(1), atol=1e-5)

    st.fit_pca()
    assert st.pca_points.shape == (8, 3)
    vd, idx = st.pca_nearest_decode(st.pca_points[3].tolist())
    assert idx == 3
    pairs = st.closest_pairs(3)
    assert len(pairs) == 3 and pairs[0]["d"] <= pairs[1]["d"]

    # colorings
    for mode in ["selfintersection", "distance", "patch", "none"]:
        c = st.colorize(v, mode, st.reference_vertices(0))
        assert c.shape == (V, 3) and c.min() >= 0 and c.max() <= 1

    with pytest.raises(ValueError):
        st.regenerate(0, 1.0)


def test_appstate_vae_regen(trained_log):
    from geniconet_tpu.app.state import AppState

    st = AppState()
    info = st.load(_app_cfg(trained_log, "ico2ico_vae"))
    assert info["is_vae"]
    v1 = st.regenerate(0, 1.0, seed=1)
    v2 = st.regenerate(0, 1.0, seed=2)
    assert v1.shape == (ico.num_vertices(3), 3)
    assert not np.allclose(v1, v2)  # different samples
    v0 = st.regenerate(0, 0.0, seed=3)
    np.testing.assert_allclose(v0, st.reconstruct(0), atol=1e-5)  # k=0 => mu


def test_http_server_endpoints(trained_log):
    from geniconet_tpu.app import server as srv_mod
    from http.server import ThreadingHTTPServer

    srv_mod.STATE.load(_app_cfg(trained_log))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv_mod.Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def post(path, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                json.dumps(body).encode(),
                {"Content-Type": "application/json"},
            )
            return json.loads(urllib.request.urlopen(req).read())

        info = post("/api/info", {})
        assert info["n"] == 8
        m = post("/api/mesh", {"i": 0, "which": "recon"})
        V = ico.num_vertices(3)
        assert len(m["vertices"]) == 3 * V
        assert len(m["faces"]) == 3 * ico.num_faces(3)
        m2 = post("/api/interpolate", {"i": 0, "j": 1, "t": 0.25})
        assert len(m2["vertices"]) == 3 * V
        pca = post("/api/pca", {})
        assert len(pca["points"]) == 8
        a = post("/api/arithmetic", {"terms": [{"op": "+", "i": 0}, {"op": "-", "i": 1}]})
        assert "nearest" in a
        # batched programmatic decode of cached latents
        d = post("/api/decode", {"indices": [0, 1, 2]})
        assert len(d["vertices"]) == 3 and len(d["vertices"][0]) == V
        # export: .off + figure-object, collision-free renaming on re-export
        srv_mod._allow_root(srv_mod.STATE.cfg.log_dir)
        e1 = post("/api/export", {"i": 0})
        e2 = post("/api/export", {"i": 0})
        assert os.path.exists(e1["path"]) and os.path.exists(e2["path"])
        assert e1["path"] != e2["path"]  # never overwrites (get_new_name parity)
        f1 = post("/api/export", {"i": 0, "fmt": "fig"})
        fig = json.load(open(f1["path"]))
        assert f1["path"].endswith(".fig.json")
        assert len(fig["vertices"]) == 3 * V and "coloring" in fig
        # index page served
        html = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read()
        assert b"GenIcoNet-TPU Explorer" in html
        js = urllib.request.urlopen(f"http://127.0.0.1:{port}/static/viewer.js").read()
        assert b"MeshViewer" in js
        # round-4 surfaces ------------------------------------------------
        # checkpoint-epoch list + selection (reference app.py:54-96)
        eps = post("/api/epochs", {})
        assert eps["best"], eps
        target = eps["best"][0]
        info2 = post("/api/load", {
            "model": "ico2ico", "logDir": trained_log, "synthetic": 8,
            "subdivision": 3, "widths": [8, 12, 16], "epoch": target,
        })
        assert info2["epoch"] == target
        assert info2["epochs"]["best"] == eps["best"]
        # saved viewpoints (reference app.py:612-628)
        vp = post("/api/viewpoint", {
            "op": "save", "name": "front",
            "camera": {"rx": 0.1, "ry": 0.2, "dist": 2.5},
        })
        assert vp["viewpoints"]["front"]["dist"] == 2.5
        vp2 = post("/api/viewpoint", {"op": "list"})
        assert "front" in vp2["viewpoints"]
        # wireframe toggle shipped in the viewer
        assert b"Wireframe" in js and b"LINES" in js
    finally:
        httpd.shutdown()


def test_view_file_ply(trained_log, tmp_path):
    """Generic viewer reads .ply (reference app.py:1271-1274, SHAPE_EXT
    app.py:1545) — ascii and binary_little_endian."""
    import struct

    from geniconet_tpu.app.state import AppState
    from geniconet_tpu.data.offio import read_ply

    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3]], np.int64)

    ascii_p = tmp_path / "mesh_ascii.ply"
    with open(ascii_p, "w") as fh:
        fh.write("ply\nformat ascii 1.0\ncomment made by test\n")
        fh.write(f"element vertex {len(v)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(f)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        for row in v:
            fh.write(" ".join(str(float(x)) for x in row) + "\n")
        for row in f:
            fh.write("3 " + " ".join(str(int(x)) for x in row) + "\n")

    bin_p = tmp_path / "mesh_bin.ply"
    with open(bin_p, "wb") as fh:
        fh.write(b"ply\nformat binary_little_endian 1.0\n")
        fh.write(f"element vertex {len(v)}\n".encode())
        fh.write(b"property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(f)}\n".encode())
        fh.write(b"property list uchar int vertex_indices\nend_header\n")
        for row in v:
            fh.write(struct.pack("<3f", *row))
        for row in f:
            fh.write(struct.pack("<B3i", 3, *row))

    for p in [ascii_p, bin_p]:
        rv, rf = read_ply(str(p))
        np.testing.assert_allclose(rv, v)
        np.testing.assert_array_equal(rf, f)

    st = AppState()
    st.load(_app_cfg(trained_log))
    rv, rf = st.view_file(str(bin_p))
    assert rv.shape == (4, 3) and rf.shape == (2, 3)


def test_appstate_epoch_selection(trained_log):
    """AppState.load(epoch=N) restores that checkpoint; unknown epochs raise
    with the available list (reference test_epoch -> loadModel flow)."""
    from geniconet_tpu.app.state import AppState
    from geniconet_tpu.train import checkpoint as ckpt

    cfg = _app_cfg(trained_log)
    ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
    eps = ckpt.available_epochs(ckpt_dir, "ico2ico")
    assert eps["best"]
    st = AppState()
    info = st.load(cfg, epoch=eps["best"][0])
    assert info["epoch"] == eps["best"][0]
    with pytest.raises(FileNotFoundError, match="available"):
        AppState().load(_app_cfg(trained_log), epoch=987654)
