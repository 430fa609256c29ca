"""Test/evaluation driver (reference experiment_test, run.py:499-536).

Loads the best (or a named-epoch) checkpoint, runs *batched* inference on
the test split, converts grids to vertex lists, computes the per-mesh mean
point→mesh distance (squared, kaolin-0.9.1 convention) against the reference
vertices on the same faces, optionally writes reconstructed ``.off`` meshes,
and emits the distances CSV + histogram PNG with mean±std/median in the
title (reference ico_utils.py:46-64).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from geniconet_tpu.data.datasets import IcoDataset
from geniconet_tpu.data.offio import write_off
from geniconet_tpu.geometry import ico
from geniconet_tpu.ops.point_mesh import point_to_mesh_distance
from geniconet_tpu.ops.vertices import grid_to_vertices
from geniconet_tpu.train import checkpoint as ckpt
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer

__all__ = ["run_test", "run_decode", "save_distances", "resolve_checkpoint"]


def resolve_checkpoint(cfg: Config) -> str:
    """Map cfg.test_epoch to a checkpoint path (reference run.py:343-349:
    0 -> latest best EB, 'B<ep>' -> that best epoch, int -> periodic save)."""
    name = cfg.model.name
    ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
    ep = cfg.test_epoch
    if str(ep) in ("0", ""):
        epoch = ckpt.latest_best_epoch(ckpt_dir, name)
        if epoch is None:
            raise FileNotFoundError(f"no EB checkpoints under {ckpt_dir}")
        return ckpt.checkpoint_path(ckpt_dir, name, epoch, best=True)
    if str(ep).startswith("B"):
        return ckpt.checkpoint_path(ckpt_dir, name, int(str(ep)[1:]), best=True)
    return ckpt.checkpoint_path(ckpt_dir, name, int(ep), best=False)


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad axis 0 to length n by repeating row 0 (fixed batch shape -> one
    jit specialization even for a ragged tail batch). Repeating a real row —
    not zeros — keeps the padded tail out of degenerate-geometry paths
    (all-zero meshes are 0-area triangles in point_to_mesh_distance)."""
    if arr.shape[0] == n:
        return arr
    pad = np.broadcast_to(arr[:1], (n - arr.shape[0], *arr.shape[1:]))
    return np.concatenate([arr, pad], axis=0)


def save_distances(name_dist_pairs, path: str):
    """CSV + histogram PNG (reference ico_utils.py:46-64)."""
    names = [n for n, _ in name_dist_pairs]
    dists = np.asarray([d for _, d in name_dist_pairs], np.float64)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".csv", "w") as f:
        f.write("Name,Distance\n")
        for n, d in name_dist_pairs:
            f.write(f"{n},{d:f}\n")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.hist(dists)
        plt.xlabel("Distance")
        plt.xticks(rotation=30)
        plt.ylabel(f"Frequency (total={len(dists)})")
        plt.title(
            "Histogram of %s\n(%0.8f ± %0.8f) (Median: %0.8f)"
            % (os.path.basename(path), dists.mean(), dists.std(), np.median(dists))
        )
        plt.savefig(path + ".png")
        plt.close()
    except Exception as e:
        print(f"[test] histogram skipped: {e}")
    print(
        "%s: %0.8f +- %0.8f, Median: %0.8f"
        % (os.path.basename(path), dists.mean(), dists.std(), np.median(dists))
    )
    return float(dists.mean()), float(dists.std()), float(np.median(dists))


def _batched_distances(cfg: Config, pred_v: np.ndarray, ref_v: np.ndarray,
                       faces: jnp.ndarray, dist_fn) -> np.ndarray:
    """Per-mesh mean distance for a whole batch with ONE device dispatch."""
    if cfg.test_mode == "point2mesh":
        return np.asarray(dist_fn(jnp.asarray(pred_v), jnp.asarray(ref_v)))
    if cfg.test_mode == "point2point":
        return np.mean(np.linalg.norm(pred_v - ref_v, axis=-1), axis=-1)
    if cfg.test_mode == "none":
        # reference --test_mode None: inference/mesh dump without a metric
        return np.full(pred_v.shape[0], np.nan)
    raise ValueError(f"unknown test_mode {cfg.test_mode}")


def _eval_vertex_batches(cfg: Config, infer, inputs: np.ndarray, names,
                         targets: np.ndarray, out_dir: str | None):
    """Shared test/decode loop: fixed-shape batches (tail padded with a
    repeat of row 0 — `_pad_to` — so the jit never re-specializes on a
    ragged shape AND the padded rows stay off degenerate-geometry paths),
    batched per-mesh distances, optional .off dump."""
    s = cfg.model.subdivisions
    faces_np = ico.get_ico_faces(s)
    faces = jnp.asarray(faces_np)
    bs = min(cfg.train.batch_size, len(names))

    @jax.jit
    def dist_fn(pv, rv):
        # one dispatch per batch: (b, V, 3) x (b, V, 3) -> (b,) mean sq
        # point2mesh. lax.map (not vmap) — vmap multiplies the point x
        # triangle-chunk pair matrix by b and overflows HBM at I5/bs36.
        return jax.lax.map(
            lambda pr: jnp.mean(point_to_mesh_distance(pr[0], pr[1], faces)),
            (pv, rv),
        )

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
    pairs = []
    for i0 in range(0, len(names), bs):
        nb = min(bs, len(names) - i0)
        x = jnp.asarray(_pad_to(inputs[i0 : i0 + bs], bs))
        pred_v = np.asarray(infer(x))[:nb]  # (nb, V, 3)
        ref_v = _pad_to(targets[i0 : i0 + bs, :, :3], bs)
        d = _batched_distances(cfg, _pad_to(pred_v, bs), ref_v, faces, dist_fn)[:nb]
        for k in range(nb):
            pairs.append((names[i0 + k], float(d[k])))
            if out_dir is not None:
                write_off(
                    os.path.join(out_dir, names[i0 + k] + ".off"), pred_v[k], faces_np
                )
    return pairs


def run_test(cfg: Config, dataset: IcoDataset, write_meshes: bool | None = None):
    """Evaluate a trained model; returns (name, distance) pairs + stats.

    write_meshes=None defers to cfg.write_output_mesh (the reference's
    --write_output_mesh flag, run.py:567 — meshes are NOT written by
    default there either)."""
    if write_meshes is None:
        write_meshes = cfg.write_output_mesh
    s = cfg.model.subdivisions
    name = cfg.model.name
    path = resolve_checkpoint(cfg)
    trainer = Trainer(cfg)
    state = trainer.init_state(dataset.inputs[:1], seed=cfg.train.seed)
    state, epoch, _ = trainer.restore(state, path)
    print(f"[test] loaded {path} (epoch {epoch})")

    model = trainer.model
    # variables are jit ARGUMENTS, not a closure: restored (numpy) params
    # closed over would be inlined as ~30 MB of HLO literals, which the
    # tunneled TPU backend rejects at run time (observed INTERNAL errors)
    variables = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats}
    )

    @jax.jit
    def _infer(vars_, x):
        if cfg.model.is_vae:
            recon, _, _ = model.apply(vars_, x, train=False, sample=False)
        else:
            recon = model.apply(vars_, x, train=False)
        return grid_to_vertices(recon, s)

    infer = lambda x: _infer(variables, x)

    out_dir = os.path.join(cfg.out_dir or os.path.join(cfg.model_log_dir(), "data"), "test")
    pairs = _eval_vertex_batches(
        cfg, infer, dataset.inputs, dataset.names, dataset.targets,
        out_dir if write_meshes else None,
    )
    if cfg.test_mode == "none":
        print(f"[test] {len(pairs)} meshes evaluated (test_mode none: no metric)")
        return pairs, None
    stats = save_distances(
        pairs, os.path.join(cfg.model_log_dir(), f"{name}_{cfg.test_mode}")
    )
    return pairs, stats


def run_decode(cfg: Config, reference: IcoDataset | None = None,
               write_meshes: bool = True):
    """Decode saved latent encodings through the decoder half (reference
    createenc2icoDataset flow, data.py:121-148: enc .npz key 'arr_0' ->
    decoder -> mesh, distance vs the matching ico reference when present).

    Latents are read from cfg.enc_dir (default ``<out>/enc/val`` as written
    by ``--process encode``); meshes land in ``<out>/dec``; if ``reference``
    is given, per-mesh distances (matched by name) are written as CSV +
    histogram like the test process.
    """
    from geniconet_tpu.data.datasets import natural_sort

    s = cfg.model.subdivisions
    name = cfg.model.name
    out_root = cfg.out_dir or os.path.join(cfg.model_log_dir(), "data")
    enc_dir = cfg.enc_dir or os.path.join(out_root, "enc", "val")
    files = [f for f in natural_sort(os.listdir(enc_dir)) if f.endswith(".npz")]
    if not files:
        raise FileNotFoundError(f"no .npz encodings under {enc_dir}")
    names = [os.path.splitext(f)[0] for f in files]
    zs = np.stack(
        [np.load(os.path.join(enc_dir, f))["arr_0"].astype(np.float32) for f in files]
    )

    path = resolve_checkpoint(cfg)
    trainer = Trainer(cfg)
    H, W = ico.grid_shape(s)
    state = trainer.init_state(np.zeros((1, H, W, 3), np.float32), seed=cfg.train.seed)
    state, epoch, _ = trainer.restore(state, path)
    print(f"[decode] loaded {path} (epoch {epoch}); {len(names)} encodings from {enc_dir}")

    model = trainer.model
    variables = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats}
    )

    @jax.jit
    def _infer(vars_, z):
        recon = model.apply(vars_, z, train=False, method=model.decode)
        return grid_to_vertices(recon, s)

    infer = lambda z: _infer(variables, z)

    out_dir = os.path.join(out_root, "dec") if write_meshes else None
    if reference is not None:
        by_name = {n: k for k, n in enumerate(reference.names)}
        missing = [n for n in names if n not in by_name]
        if missing:
            raise KeyError(f"encodings without reference meshes: {missing[:5]}...")
        targets = reference.targets[[by_name[n] for n in names]]
        pairs = _eval_vertex_batches(cfg, infer, zs, names, targets, out_dir)
        stats = save_distances(
            pairs, os.path.join(cfg.model_log_dir(), f"{name}_decode_{cfg.test_mode}")
        )
        return pairs, stats
    # no reference: just decode + dump meshes
    faces_np = ico.get_ico_faces(s)
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
    bs = min(cfg.train.batch_size, len(names))
    pairs = []
    for i0 in range(0, len(names), bs):
        nb = min(bs, len(names) - i0)
        z = jnp.asarray(_pad_to(zs[i0 : i0 + bs], bs))
        pred_v = np.asarray(infer(z))[:nb]
        for k in range(nb):
            pairs.append((names[i0 + k], float("nan")))
            if out_dir is not None:
                write_off(os.path.join(out_dir, names[i0 + k] + ".off"),
                          pred_v[k], faces_np)
    return pairs, None
