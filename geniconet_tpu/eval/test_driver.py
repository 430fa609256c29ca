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

__all__ = ["run_test", "save_distances"]


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


def run_test(cfg: Config, dataset: IcoDataset, write_meshes: bool = True):
    """Evaluate a trained model; returns (name, distance) pairs + stats."""
    s = cfg.model.subdivisions
    name = cfg.model.name
    ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")

    # resolve checkpoint: 0 -> latest best (reference run.py:343-349)
    ep = cfg.test_epoch
    if str(ep) in ("0", ""):
        epoch = ckpt.latest_best_epoch(ckpt_dir, name)
        if epoch is None:
            raise FileNotFoundError(f"no EB checkpoints under {ckpt_dir}")
        path = ckpt.checkpoint_path(ckpt_dir, name, epoch, best=True)
    elif str(ep).startswith("B"):
        path = ckpt.checkpoint_path(ckpt_dir, name, int(str(ep)[1:]), best=True)
    else:
        path = ckpt.checkpoint_path(ckpt_dir, name, int(ep), best=False)

    trainer = Trainer(cfg)
    state = trainer.init_state(dataset.inputs[:1], seed=cfg.train.seed)
    state, epoch, _ = trainer.restore(state, path)
    print(f"[test] loaded {path} (epoch {epoch})")

    model = trainer.model
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def infer(x):
        if cfg.model.is_vae:
            recon, _, _ = model.apply(variables, x, train=False, sample=False)
        else:
            recon = model.apply(variables, x, train=False)
        return grid_to_vertices(recon, s)

    faces_np = ico.get_ico_faces(s)
    faces = jnp.asarray(faces_np)
    out_dir = os.path.join(cfg.out_dir or os.path.join(cfg.model_log_dir(), "data"), "test")
    if write_meshes:
        os.makedirs(out_dir, exist_ok=True)

    bs = cfg.train.batch_size
    pairs = []
    for i0 in range(0, len(dataset), bs):
        x = jnp.asarray(dataset.inputs[i0 : i0 + bs])
        pred_v = np.asarray(infer(x))  # (b, V, 3)
        for k in range(pred_v.shape[0]):
            idx = i0 + k
            ref_v = dataset.targets[idx, :, :3]
            if cfg.test_mode == "point2mesh":
                d = float(
                    jnp.mean(
                        point_to_mesh_distance(
                            jnp.asarray(pred_v[k]), jnp.asarray(ref_v), faces
                        )
                    )
                )
            elif cfg.test_mode == "point2point":
                d = float(np.mean(np.linalg.norm(pred_v[k] - ref_v, axis=-1)))
            else:
                raise ValueError(f"unknown test_mode {cfg.test_mode}")
            pairs.append((dataset.names[idx], d))
            if write_meshes:
                write_off(os.path.join(out_dir, dataset.names[idx] + ".off"), pred_v[k], faces_np)

    stats = save_distances(
        pairs, os.path.join(cfg.model_log_dir(), f"{name}_{cfg.test_mode}")
    )
    return pairs, stats
