"""Regression tests for the round-1 advisor findings (ADVICE.md)."""

import os

import numpy as np
import pytest

from geniconet_tpu.train import checkpoint as ckpt


def test_checkpoint_name_match_is_anchored(tmp_path):
    """Model 'ico2ico' must not pick up 'ico2ico_vae_EB*.ckpt' files."""
    d = str(tmp_path)
    for f in ["ico2ico_EB3.ckpt", "ico2ico_vae_EB9.ckpt", "ico2ico_E5.ckpt",
              "xico2ico_EB11.ckpt"]:
        open(os.path.join(d, f), "wb").close()
    assert ckpt.latest_best_epoch(d, "ico2ico") == 3
    assert ckpt.latest_best_epoch(d, "ico2ico_vae") == 9

    # GC must only delete this model's EB files
    for e in range(1, 9):
        open(ckpt.checkpoint_path(d, "ico2ico", e, best=True), "wb").close()
    ckpt.gc_best_checkpoints(d, "ico2ico", keep=6)
    kept = sorted(f for f in os.listdir(d) if "EB" in f)
    assert "ico2ico_vae_EB9.ckpt" in kept
    assert "xico2ico_EB11.ckpt" in kept
    own = [f for f in kept if f.startswith("ico2ico_EB")]
    assert len(own) == 6 and "ico2ico_EB3.ckpt" in own


def test_server_path_sandbox(tmp_path):
    from geniconet_tpu.app import server

    old = list(server.ALLOWED_ROOTS)
    server.ALLOWED_ROOTS.clear()
    try:
        root = tmp_path / "data"
        root.mkdir()
        (root / "m.off").write_text("OFF\n0 0 0\n")
        server._allow_root(str(root))
        assert server._check_path(str(root / "m.off")) == os.path.realpath(
            str(root / "m.off")
        )
        with pytest.raises(PermissionError):
            server._check_path("/etc/passwd")
        # prefix trickery: /tmp/.../dataX must not match root /tmp/.../data
        with pytest.raises(PermissionError):
            server._check_path(str(root) + "X/m.off")
    finally:
        server.ALLOWED_ROOTS.clear()
        server.ALLOWED_ROOTS.extend(old)


def test_server_malformed_json_returns_500_payload():
    """A malformed JSON body must produce the standard {'error': ...} 500
    response instead of dropping the connection."""
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from geniconet_tpu.app.server import Handler

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/info", data=b"{not json",
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            payload = json.loads(e.read().decode())
            assert "error" in payload
    finally:
        srv.shutdown()
        srv.server_close()


def test_pca_cache_key_distinguishes_datasets(tmp_path):
    """Two same-size datasets must map to different PCA cache paths."""
    from geniconet_tpu.app.state import AppState
    from geniconet_tpu.data.datasets import synthetic_dataset
    from geniconet_tpu.train.config import Config

    st = AppState()
    cfg = Config()
    cfg.log_dir = str(tmp_path)
    cfg.data.synthetic = 4
    st.cfg = cfg
    st.epoch = 1
    st.instance = "val"
    st.dataset = synthetic_dataset(3, 4, seed=0)
    p1 = st._pca_cache_path()

    ds2 = synthetic_dataset(3, 4, seed=0)
    ds2.names = [n + "_other" for n in ds2.names]
    st.dataset = ds2
    p2 = st._pca_cache_path()
    assert p1 != p2
