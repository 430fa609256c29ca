"""Self-contained latent-space explorer (the Dash app equivalent).

The reference serves a Dash/plotly app on :8050 (reference app.py:2132) with
~40 callbacks. This environment has no dash/plotly, so the app is built
dependency-free: a stdlib ``http.server`` JSON API over ``AppState`` plus a
single-page frontend with a from-scratch WebGL mesh renderer (no CDN — works
in zero-egress deployments). Feature parity: model/dataset loading,
reconstruction viewing with self-intersection / distance / patch colorings,
latent interpolation, latent arithmetic with PCA nearest-neighbor decode,
PCA scatter, per-channel exploration, VAE re-generation, patch-wise latent
combination, closest/farthest pair listing, generic file viewer, camera sync
across panes, and .off export.

Usage:
    python -m geniconet_tpu.app.server --model ico2ico --logDir log \
        [--dataDir D | --synthetic N] [--port 8050]
"""

from __future__ import annotations

import argparse
import json
import os
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from geniconet_tpu.app.state import AppState
from geniconet_tpu.data.offio import write_off
from geniconet_tpu.train.config import Config

_STATIC = os.path.join(os.path.dirname(__file__), "static")

STATE = AppState()
_LOCK = threading.Lock()

# Roots that /api/view_file may read from and /api/export may write under.
# Populated from the loaded config (logDir/dataDir) and --allow_dir; the
# reference Dash app had the same arbitrary-path viewer but only ever
# listened on localhost, so the explorer here sandboxes file access before
# the server can be exposed with --host.
ALLOWED_ROOTS: list = []


def _allow_root(path: str):
    if path:
        ALLOWED_ROOTS.append(os.path.realpath(path))


def _check_path(path: str) -> str:
    """Resolve `path` and require it under an allowed root."""
    rp = os.path.realpath(path)
    for root in ALLOWED_ROOTS:
        if rp == root or rp.startswith(root + os.sep):
            return rp
    raise PermissionError(
        f"path outside the configured data/log roots: {path!r}"
    )


def _unique_path(path: str) -> str:
    """Collision-free renaming: foo.off exists -> foo_1.off, foo_2.off, ...
    (reference save_figure semantics, visualizer_utils.py:163-192)."""
    if not os.path.exists(path):
        return path
    base, ext = os.path.splitext(path)
    k = 1
    while os.path.exists(f"{base}_{k}{ext}"):
        k += 1
    return f"{base}_{k}{ext}"


def _mesh_payload(vertices: np.ndarray, faces: np.ndarray, colors: np.ndarray):
    return {
        "vertices": np.asarray(vertices, np.float32).round(5).ravel().tolist(),
        "faces": np.asarray(faces, np.int32).ravel().tolist(),
        "colors": np.asarray(colors, np.float32).round(4).ravel().tolist(),
    }


def _available_epochs(cfg) -> dict:
    from geniconet_tpu.train import checkpoint as ckpt

    ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
    return ckpt.available_epochs(ckpt_dir, cfg.model.name)


def handle_api(path: str, body: dict) -> dict:
    st = STATE
    if path == "/api/load":
        cfg = Config()
        cfg.model.name = body.get("model", "ico2ico")
        cfg.model.subdivisions = int(body.get("subdivision", 5))
        if body.get("widths"):
            cfg.model.widths = tuple(body["widths"])
        cfg.log_dir = body.get("logDir", "log")
        cfg.data.data_dir = body.get("dataDir", "")
        cfg.data.synthetic = int(body.get("synthetic", 0))
        cfg.data.layout_level = int(body.get("dataPthLvl", 2))
        info = st.load(cfg, body.get("instance", "val"),
                       epoch=int(body.get("epoch", 0)))
        _allow_root(cfg.log_dir)
        _allow_root(cfg.data.data_dir)
        info["epochs"] = _available_epochs(cfg)
        return info

    if path == "/api/info":
        if st.info is None:
            raise RuntimeError("no model loaded — POST /api/load first")
        return st.info

    if path == "/api/epochs":
        # checkpoint-epoch dropdown source (reference update_epoch_list,
        # app.py:54-96) — reloadable without reloading the model
        if st.cfg is None:
            raise RuntimeError("no model loaded — POST /api/load first")
        return _available_epochs(st.cfg)

    if path == "/api/viewpoint":
        # saved camera viewpoints (reference update_viewpoint_list,
        # app.py:612-628): op=save stores {name: camera}, op=list returns
        # them; persisted as JSON next to the model's logs
        if st.cfg is None:
            raise RuntimeError("no model loaded — POST /api/load first")
        vp_path = os.path.join(st.cfg.model_log_dir(), "viewpoints.json")
        vps = {}
        if os.path.exists(vp_path):
            with open(vp_path) as f:
                vps = json.load(f)
        op = body.get("op", "list")
        if op == "save":
            name = str(body["name"])[:64]
            vps[name] = body["camera"]
            with open(vp_path, "w") as f:
                json.dump(vps, f)
        elif op == "delete":
            vps.pop(str(body.get("name", "")), None)
            with open(vp_path, "w") as f:
                json.dump(vps, f)
        return {"viewpoints": vps}

    if st.dataset is None:
        raise RuntimeError("no model loaded — POST /api/load first")

    faces = st.faces()
    coloring = body.get("coloring", "selfintersection")

    if path == "/api/mesh":
        i = int(body["i"])
        which = body.get("which", "recon")
        ref = st.reference_vertices(i)
        v = ref if which == "reference" else st.reconstruct(i)
        return _mesh_payload(v, faces, st.colorize(v, coloring, ref))
    if path == "/api/interpolate":
        v = st.interpolate(int(body["i"]), int(body["j"]), float(body["t"]))
        return _mesh_payload(v, faces, st.colorize(v, coloring))
    if path == "/api/arithmetic":
        terms = [(t["op"], int(t["i"])) for t in body["terms"]]
        v, z = st.arithmetic(terms)
        out = _mesh_payload(v, faces, st.colorize(v, coloring))
        # PCA nearest-neighbor of the combined latent (app.py:998-1050)
        st.fit_pca(st._pca_cache_path())
        p = st.pca.transform(z.reshape(1, -1).astype(np.float64))[0]
        _, nn_idx = st.kdtree.query(p)
        out["nearest"] = {"index": int(nn_idx), "name": st.dataset.names[int(nn_idx)]}
        return out
    if path == "/api/explore":
        v = st.explore_channel(
            int(body["i"]), int(body["channel"]), float(body["delta"]),
            float(body.get("noise", 0.0)), int(body.get("seed", 0)),
        )
        return _mesh_payload(v, faces, st.colorize(v, coloring))
    if path == "/api/regenerate":
        v = st.regenerate(int(body["i"]), float(body["k"]), int(body.get("seed", 0)))
        return _mesh_payload(v, faces, st.colorize(v, coloring))
    if path == "/api/patch_combine":
        v = st.patch_combine(int(body["i"]), int(body["j"]), list(body["patches"]))
        return _mesh_payload(v, faces, st.colorize(v, "patch"))
    if path == "/api/decode":
        # programmatic batched decode: {"z": nested list (N, Hz, Wz, C)} or
        # {"indices": [...]} to decode cached dataset latents
        if "indices" in body:
            zs = st.latents[np.asarray(body["indices"], np.int64)]
        else:
            zs = np.asarray(body["z"], np.float32)
            if zs.ndim == 3:
                zs = zs[None]
        vs = st.decode_batch(zs)
        return {
            "vertices": vs.round(5).tolist(),
            "faces": faces.ravel().tolist(),
        }
    if path == "/api/pca":
        return st.pca_scatter()
    if path == "/api/pca_decode":
        v, idx = st.pca_nearest_decode(body["p"])
        out = _mesh_payload(v, faces, st.colorize(v, coloring))
        out["index"] = idx
        out["name"] = st.dataset.names[idx]
        return out
    if path == "/api/pairs":
        return {"pairs": st.closest_pairs(int(body.get("k", 5)),
                                          bool(body.get("farthest", False)))}
    if path == "/api/view_file":
        v, f = st.view_file(_check_path(body["path"]))
        colors = np.tile(np.array([0.62, 0.66, 0.72], np.float32), (len(v), 1))
        return _mesh_payload(v, f, colors)
    if path == "/api/export":
        # fmt 'off' = mesh file; fmt 'fig' = the complete renderable figure
        # object (vertices/faces/colors/coloring) as JSON — the reference's
        # plotly .pkl figure export equivalent (visualizer_utils.py:163-192).
        # Existing files are never overwritten (collision-free renaming).
        i = int(body["i"])
        fmt = body.get("fmt", "off")
        v = st.reconstruct(i)
        out_dir = body.get("dir", os.path.join(st.cfg.model_log_dir(), "export"))
        out_dir = _check_path(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        if fmt == "fig":
            fig = _mesh_payload(v, faces, st.colorize(v, coloring))
            fig["coloring"] = coloring
            fig["name"] = st.dataset.names[i]
            p = _unique_path(os.path.join(out_dir, f"{st.dataset.names[i]}_recon.fig.json"))
            with open(p, "w") as f:
                json.dump(fig, f)
        else:
            p = _unique_path(os.path.join(out_dir, f"{st.dataset.names[i]}_recon.off"))
            write_off(p, v, faces)
        return {"path": p}
    raise ValueError(f"unknown endpoint {path}")


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):  # quiet
        pass

    def _send(self, code: int, content: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        # mesh payloads are ~MB of JSON — gzip when the client accepts it
        ae = self.headers.get("Accept-Encoding", "")
        accepts_gzip = "gzip" in ae and "gzip;q=0" not in ae.replace(" ", "")
        if len(content) > 16384 and accepts_gzip:
            import gzip

            content = gzip.compress(content, compresslevel=4)
            self.send_header("Content-Encoding", "gzip")
        self.send_header("Content-Length", str(len(content)))
        self.end_headers()
        self.wfile.write(content)

    def do_GET(self):
        path = self.path.split("?")[0]
        if path in ("/", "/index.html"):
            with open(os.path.join(_STATIC, "index.html"), "rb") as f:
                return self._send(200, f.read(), "text/html")
        if path.startswith("/static/"):
            fp = os.path.join(_STATIC, os.path.basename(path))
            if os.path.exists(fp):
                ctype = "text/javascript" if fp.endswith(".js") else "text/css"
                with open(fp, "rb") as f:
                    return self._send(200, f.read(), ctype)
        return self._send(404, b"not found", "text/plain")

    def do_POST(self):
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            with _LOCK:
                out = handle_api(self.path, body)
            self._send(200, json.dumps(out).encode(), "application/json")
        except Exception as e:
            traceback.print_exc()
            self._send(500, json.dumps({"error": str(e)}).encode(), "application/json")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ico2ico")
    p.add_argument("--logDir", default="log")
    p.add_argument("--dataDir", default="")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--subdivision", type=int, default=5)
    p.add_argument("--port", type=int, default=8050)
    p.add_argument(
        "--host", default="127.0.0.1",
        help="bind address; pass 0.0.0.0 to opt into network exposure",
    )
    p.add_argument(
        "--allow_dir", action="append", default=[],
        help="extra root(s) the file viewer/exporter may access",
    )
    p.add_argument("--no_autoload", action="store_true")
    a = p.parse_args(argv)

    for d in a.allow_dir:
        _allow_root(d)
    if not a.no_autoload:
        body = {
            "model": a.model, "logDir": a.logDir, "dataDir": a.dataDir,
            "synthetic": a.synthetic, "subdivision": a.subdivision,
        }
        info = handle_api("/api/load", body)
        print(f"loaded: {info['n']} meshes, epoch {info['epoch']}")

    srv = ThreadingHTTPServer((a.host, a.port), Handler)
    print(f"GenIcoNet-TPU explorer on http://{a.host}:{a.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
