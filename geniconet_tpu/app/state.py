"""App backend state: model halves, latent cache, PCA/KDTree, decode paths.

Capability parity with the reference Dash app's callback backend (app.py):
encoder/decoder access on a trained checkpoint (app.py:1323-1369 — here via
``apply(method='encode'/'decode')`` instead of split-model weight surgery),
latent interpolation (app.py:1502-1504), latent arithmetic (app.py:998-1050),
PCA(3)+KDTree over dataset latents with on-disk cache (app.py:255-279),
per-channel latent exploration ±3σ with optional noise (app.py:814-852),
re-generation ``z = mu + k·σ·ε`` (app.py:929-948), patch-wise latent
combination (app.py:1191-1202), and mesh colorings: self-intersection
(visualizer_utils.py:50-58, via the native C++ detector), distance to
reference (:30-37), patch colors (:38-43).
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from geniconet_tpu import native
from geniconet_tpu.data.datasets import IcoDataset, load_ico_npz, synthetic_dataset
from geniconet_tpu.data.offio import read_off
from geniconet_tpu.geometry import ico
from geniconet_tpu.ops.vertices import grid_to_vertices
from geniconet_tpu.train import checkpoint as ckpt
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer, build_model

__all__ = ["AppState"]


class AppState:
    def __init__(self):
        self.info = None
        self.instance = "val"
        self.cfg: Config | None = None
        self.model = None
        self.variables = None
        self.dataset: IcoDataset | None = None
        self.latents = None      # (N, Hz, Wz, C) mu for VAE / z for AE
        self.logvars = None      # (N, Hz, Wz, C) for VAE
        self.pca = None
        self.pca_points = None
        self.kdtree = None
        self._encode_fn = None
        self._decode_fn = None
        self.epoch = None

    # ------------------------------------------------------------------

    def load(self, cfg: Config, data_instance: str = "val", epoch: int = 0):
        """Load checkpoint + dataset, jit encode/decode, build latent cache.

        ``epoch``: 0 picks the newest EB checkpoint; a positive value loads
        that specific epoch (best EB file first, then a periodic E save) —
        the reference app's epoch dropdown (app.py:54-96, test_epoch flowing
        into loadModel)."""
        self.cfg = cfg
        self.instance = data_instance
        s = cfg.model.subdivisions
        if cfg.data.synthetic:
            self.dataset = synthetic_dataset(s, cfg.data.synthetic,
                                             seed=cfg.data.synthetic_seed)
        else:
            self.dataset = IcoDataset.from_directory(
                cfg.data.data_dir, s, cfg.data.layout_level, data_instance,
                cfg.data.ext, cfg.train.quick_learn,
            )

        name = cfg.model.name
        ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
        if epoch:
            path = ckpt.checkpoint_path(ckpt_dir, name, int(epoch), best=True)
            if not os.path.exists(path):
                path = ckpt.checkpoint_path(ckpt_dir, name, int(epoch), best=False)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"no checkpoint for epoch {epoch} under {ckpt_dir} "
                    f"(available: {ckpt.available_epochs(ckpt_dir, name)})")
        else:
            best = ckpt.latest_best_epoch(ckpt_dir, name)
            if best is None:
                raise FileNotFoundError(f"no EB checkpoint under {ckpt_dir}")
            path = ckpt.checkpoint_path(ckpt_dir, name, best, best=True)
        trainer = Trainer(cfg)
        state = trainer.init_state(self.dataset.inputs[:1], seed=0)
        state, self.epoch, _ = trainer.restore(state, path)
        self.model = trainer.model
        # device_put once; pass as jit ARGUMENTS (closing over restored
        # numpy params would inline them as huge HLO literals — the
        # tunneled TPU backend fails such programs at run time)
        self.variables = jax.device_put(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        model, variables = self.model, self.variables
        is_vae = cfg.model.is_vae

        _encode = jax.jit(lambda v, x: model.apply(v, x, method="encode"))

        # decode transfer format: the head is tanh-bounded, so vertices ship
        # as int16 fixed-point (resolution 2^-15 ≈ 3e-5, an order below the
        # model's reconstruction error and the JSON payload's 5-decimal
        # rounding) — HALVES the device→host bytes per decode, which
        # dominates end-to-end latency on tunneled backends (round-3
        # VERDICT #7: 26.5 of 27 ms was shipping fp32 vertices).
        # GENICONET_DECODE_QUANT=0 restores fp32 transfers.
        quant = os.environ.get("GENICONET_DECODE_QUANT", "1") == "1"

        @jax.jit
        def _decode(v, z):
            out = model.apply(v, z, method="decode")
            verts = grid_to_vertices(out, s)
            if not quant:
                return verts
            q = jnp.round(verts.astype(jnp.float32) * 32767.0)
            return jnp.clip(q, -32767.0, 32767.0).astype(jnp.int16)

        def _decode_host(z):
            v = np.asarray(_decode(variables, z))
            return v.astype(np.float32) / 32767.0 if quant else v

        self._encode_fn = lambda x: _encode(variables, x)
        self._decode_fn = _decode_host

        # latent cache over the dataset (batched)
        zs, lvs = [], []
        bs = 16
        for i in range(0, len(self.dataset), bs):
            x = jnp.asarray(self.dataset.inputs[i : i + bs])
            enc = self._encode_fn(x)
            if is_vae:
                mu, logvar = enc
                # float32 host cache even under bf16 compute: npz export,
                # sklearn PCA and KDTree all need a portable dtype
                zs.append(np.asarray(mu, np.float32))
                lvs.append(np.asarray(logvar, np.float32))
            else:
                zs.append(np.asarray(enc, np.float32))
        self.latents = np.concatenate(zs, 0)
        self.logvars = np.concatenate(lvs, 0) if lvs else None
        self.pca = None  # invalidate
        self.info = {
            "n": len(self.dataset),
            "names": self.dataset.names,
            "classes": self.dataset.classes,
            "epoch": self.epoch,
            "latent_shape": list(self.latents.shape[1:]),
            "is_vae": is_vae,
            "subdivisions": s,
            # echo the load parameters so the frontend can re-POST
            # /api/load with a different checkpoint epoch
            "model": name,
            "logDir": cfg.log_dir,
            "dataDir": cfg.data.data_dir,
            "synthetic": cfg.data.synthetic,
            "instance": data_instance,
        }
        return self.info

    # ------------------------------------------------------------------
    # decode paths
    # ------------------------------------------------------------------

    def decode_latent(self, z: np.ndarray) -> np.ndarray:
        """(Hz, Wz, C) latent -> (V, 3) vertices."""
        v = self._decode_fn(jnp.asarray(z[None]))
        return np.asarray(v)[0]

    def decode_batch(self, zs: np.ndarray) -> np.ndarray:
        """(N, Hz, Wz, C) latents -> (N, V, 3) in one batched TPU inference
        (the app generative path as batched inference, BASELINE configs[3]).

        N is zero-padded up to the next power of two so arbitrary request
        sizes reuse a handful of jit specializations instead of compiling
        per distinct N (compiles cost seconds-to-minutes on tunneled TPUs).
        """
        n = zs.shape[0]
        bucket = 1 << max(0, (n - 1).bit_length())
        if bucket != n:
            pad = np.zeros((bucket - n, *zs.shape[1:]), zs.dtype)
            zs = np.concatenate([zs, pad], axis=0)
        return np.asarray(self._decode_fn(jnp.asarray(zs)))[:n]

    def interpolate(self, i: int, j: int, t: float) -> np.ndarray:
        z = (1.0 - t) * self.latents[i] + t * self.latents[j]
        return self.decode_latent(z)

    def arithmetic(self, terms: list[tuple[str, int]]) -> np.ndarray:
        """terms: [('+', i), ('-', j), ...] over dataset latents."""
        z = np.zeros_like(self.latents[0])
        for op, idx in terms:
            z = z + self.latents[idx] if op == "+" else z - self.latents[idx]
        return self.decode_latent(z), z

    def explore_channel(self, i: int, channel: int, delta: float,
                        noise: float = 0.0, seed: int = 0) -> np.ndarray:
        """Shift one latent channel by delta·sigma (+ optional noise), decode.

        sigma is the per-channel std over the dataset latents (the ±3σ UI
        range of the reference, app.py:814-852).
        """
        z = self.latents[i].copy()
        sigma = self.latents.std(axis=0)
        z[..., channel] += delta * sigma[..., channel].mean()
        if noise:
            rng = np.random.RandomState(seed)
            z += noise * sigma * rng.randn(*z.shape)
        return self.decode_latent(z)

    def regenerate(self, i: int, k: float, seed: int = 0) -> np.ndarray:
        """VAE re-generation z = mu + k·σ·ε (app.py:929-948)."""
        if self.logvars is None:
            raise ValueError("regeneration requires a VAE model")
        rng = np.random.RandomState(seed)
        std = np.exp(0.5 * self.logvars[i])
        z = self.latents[i] + k * std * rng.randn(*std.shape).astype(np.float32)
        return self.decode_latent(z)

    def patch_combine(self, i: int, j: int, take_from_j: list[int]) -> np.ndarray:
        """Mix latent charts: rows of chart c come from j if c in take_from_j
        (app.py:1191-1202 index_select/cat over the 5 patches)."""
        s = self.cfg.model.subdivisions
        hz = 2 ** (s - 3)
        z = self.latents[i].copy()
        zj = self.latents[j]
        for c in take_from_j:
            z[c * hz : (c + 1) * hz] = zj[c * hz : (c + 1) * hz]
        return self.decode_latent(z)

    # ------------------------------------------------------------------
    # PCA + nearest neighbor (app.py:255-279, 383-409)
    # ------------------------------------------------------------------

    def fit_pca(self, cache_path: str | None = None):
        if self.pca is not None:
            return
        flat = self.latents.reshape(len(self.latents), -1)
        if cache_path and os.path.exists(cache_path):
            with open(cache_path, "rb") as f:
                self.pca, self.pca_points = pickle.load(f)
            if len(self.pca_points) != len(self.latents):
                self.pca = None  # stale cache — refit below
        if self.pca is None:
            from sklearn.decomposition import PCA

            self.pca = PCA(n_components=3)
            self.pca_points = self.pca.fit_transform(flat).astype(np.float32)
            if cache_path:
                with open(cache_path, "wb") as f:
                    pickle.dump((self.pca, self.pca_points), f)
        from scipy.spatial import KDTree

        self.kdtree = KDTree(self.pca_points)

    def _pca_cache_path(self):
        """On-disk PCA cache like the reference's pca.pkl (app.py:255-279),
        keyed by checkpoint epoch, data instance, and a content fingerprint
        (data dir + mesh names) so a *different* dataset of the same size
        never silently reuses a stale fit."""
        if self.cfg is None:
            return None
        import hashlib

        h = hashlib.sha1()
        h.update(self.cfg.data.data_dir.encode())
        h.update(str(self.cfg.data.synthetic).encode())
        h.update(str(self.cfg.train.quick_learn).encode())
        for name in self.dataset.names:
            h.update(name.encode())
            h.update(b"\0")
        return os.path.join(
            self.cfg.model_log_dir(),
            f"pca_{self.cfg.model.name}_e{self.epoch}_{self.instance}"
            f"_n{len(self.dataset)}_{h.hexdigest()[:10]}.pkl",
        )

    def pca_scatter(self):
        self.fit_pca(self._pca_cache_path())
        return {
            "points": self.pca_points.tolist(),
            "classes": self.dataset.classes,
            "names": self.dataset.names,
        }

    def pca_nearest_decode(self, p3: list[float]):
        """Nearest dataset latent to a 3-D PCA point, decoded."""
        self.fit_pca(self._pca_cache_path())
        _, idx = self.kdtree.query(np.asarray(p3, np.float32))
        return self.decode_latent(self.latents[int(idx)]), int(idx)

    def closest_pairs(self, k: int = 5, farthest: bool = False):
        """Top-k closest/farthest PCA pairs (app.py:383-409)."""
        self.fit_pca(self._pca_cache_path())
        p = self.pca_points
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        iu = np.triu_indices(len(p), 1)
        order = np.argsort(d[iu])
        if farthest:
            order = order[::-1]
        out = []
        for t in order[:k]:
            out.append({"i": int(iu[0][t]), "j": int(iu[1][t]), "d": float(d[iu][t])})
        return out

    # ------------------------------------------------------------------
    # mesh assembly + colorings
    # ------------------------------------------------------------------

    def faces(self) -> np.ndarray:
        return ico.get_ico_faces(self.cfg.model.subdivisions)

    def reference_vertices(self, i: int) -> np.ndarray:
        return self.dataset.targets[i, :, :3]

    def reconstruct(self, i: int) -> np.ndarray:
        return self.decode_latent(self.latents[i])

    def colorize(self, vertices: np.ndarray, mode: str, ref: np.ndarray | None = None):
        """Per-vertex RGB in [0,1] for the requested coloring mode."""
        V = vertices.shape[0]
        if mode == "patch":
            palette = np.array(
                [[0.84, 0.37, 0.0], [0.0, 0.62, 0.45], [0.34, 0.71, 0.91],
                 [0.94, 0.89, 0.26], [0.8, 0.47, 0.65], [0.9, 0.9, 0.9],
                 [0.5, 0.5, 0.5]], np.float32,
            )
            return palette[ico.get_patch_ids(self.cfg.model.subdivisions)]
        if mode == "distance" and ref is not None:
            d = np.linalg.norm(vertices - ref, axis=1)
            dn = np.clip(d / max(d.mean() * 3.0, 1e-9), 0, 1)[:, None]
            base = np.array([0.7, 0.7, 0.75], np.float32)
            red = np.array([0.9, 0.1, 0.1], np.float32)
            return (1 - dn) * base + dn * red
        if mode == "selfintersection":
            colors = np.tile(np.array([0.62, 0.66, 0.72], np.float32), (V, 1))
            pairs = native.detect_self_intersection(vertices, self.faces())
            if len(pairs):
                bad_faces = np.unique(pairs.ravel())
                bad_verts = np.unique(self.faces()[bad_faces].ravel())
                colors[bad_verts] = [0.95, 0.15, 0.1]
            return colors
        return np.tile(np.array([0.62, 0.66, 0.72], np.float32), (V, 1))

    # ------------------------------------------------------------------

    def view_file(self, path: str):
        """Generic .off/.ply/.npz viewer (app.py:1266-1296; SHAPE_EXT incl.
        .ply via plyfile, app.py:1271-1274,1545)."""
        if path.endswith(".off"):
            v, f = read_off(path)
            return v, f
        if path.endswith(".ply"):
            from geniconet_tpu.data.offio import read_ply

            return read_ply(path)
        if path.endswith(".npz"):
            s = self.cfg.model.subdivisions if self.cfg else 5
            _, target = load_ico_npz(path, s)
            return target[:, :3], ico.get_ico_faces(s)
        raise ValueError(f"unsupported file type: {path}")
