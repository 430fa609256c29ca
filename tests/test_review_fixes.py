"""Regression tests for review findings: resume best-loss, ragged batches, GC."""

import os

import numpy as np
import pytest

from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.parallel import mesh as mesh_lib
from geniconet_tpu.train import checkpoint as ckpt
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer


def test_resume_preserves_best_loss(tmp_path):
    """A resumed run must not overwrite the true best checkpoint with a
    worse model (reference restores last_best_loss, run.py:374-376)."""
    cfg = Config()
    cfg.model.name = "ico2ico"
    cfg.model.subdivisions = 3
    cfg.model.widths = (8, 12, 16)
    cfg.train.batch_size = 8
    cfg.train.train_epoch = 2
    cfg.train.log_mesh_epoch = 0
    cfg.optim.lr_base = 1e-4
    cfg.optim.lr_max = 3e-3
    cfg.log_dir = str(tmp_path)
    ds = synthetic_dataset(3, 8, seed=0)
    tr = Trainer(cfg)
    state = tr.init_state(ds.inputs[:1])
    trn = Batches(ds, 8, shuffle=True)
    val = Batches(ds, 8, shuffle=False)
    state, hist = tr.fit(state, trn, val, 0)

    ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
    best_ep = ckpt.latest_best_epoch(ckpt_dir, "ico2ico")
    best_blob = ckpt.load_checkpoint(
        ckpt.checkpoint_path(ckpt_dir, "ico2ico", best_ep, best=True)
    )
    saved_best = best_blob["loss"]

    # restore returns that loss; fitting 1 more epoch with a HUGE lr (which
    # will worsen the model) must not produce a new EB checkpoint
    tr2 = Trainer(cfg)
    st2 = tr2.init_state(ds.inputs[:1], seed=9)
    path = ckpt.checkpoint_path(ckpt_dir, "ico2ico", 2, best=False)
    st2, epoch, best_loss = tr2.restore(st2, path)
    assert best_loss == pytest.approx(hist[-1] if hist[-1] <= min(hist) else min(hist))
    cfg.train.train_epoch = 3
    cfg.optim.lr_base = cfg.optim.lr_max = 0.5  # destructive lr
    tr3 = Trainer(cfg)
    st3 = tr3.init_state(ds.inputs[:1], seed=9)
    st3, epoch, best_loss = tr3.restore(st3, path)
    st3, hist3 = tr3.fit(st3, trn, val, epoch, best_loss)
    assert ckpt.latest_best_epoch(ckpt_dir, "ico2ico") == best_ep, (
        "worse resumed model overwrote the best checkpoint"
    )
    assert saved_best <= min(hist)


def test_ragged_train_batch_truncated_not_padded():
    """Sharded ragged TRAIN batches are truncated to a device multiple
    (never zero-padded — padding would pollute BatchNorm statistics)."""
    ds = synthetic_dataset(1, 10, seed=0)
    mesh = mesh_lib.make_mesh(8)
    b = Batches(ds, 16, shuffle=True, sharding=mesh_lib.data_sharding(mesh),
                drop_remainder=False)
    batches = list(b.epoch())
    assert len(batches) == 1
    x, y, wt = batches[0]
    assert x.shape[0] == 8  # 10 -> truncated to 8 (not padded to 16)
    assert float(np.asarray(wt).sum()) == 8.0

    # eval: zero-weight padded instead
    be = Batches(ds, 16, shuffle=False, sharding=mesh_lib.data_sharding(mesh))
    xe, ye, wte = next(iter(be.epoch()))
    assert xe.shape[0] == 16
    assert float(np.asarray(wte).sum()) == 10.0


def test_gc_keeps_newest_six(tmp_path):
    d = str(tmp_path)
    for e in [1, 3, 5, 7, 9, 11, 13, 15]:
        ckpt.save_checkpoint(
            ckpt.checkpoint_path(d, "m", e, best=True), {"params": {"w": np.zeros(1)}}
        )
    ckpt.gc_best_checkpoints(d, "m")
    left = sorted(
        int(f.split("_EB")[1].split(".")[0]) for f in os.listdir(d) if "_EB" in f
    )
    assert left == [5, 7, 9, 11, 13, 15]  # newest 6, oldest NOT protected
