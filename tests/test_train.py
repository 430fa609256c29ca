"""End-to-end training: loss goes down, resume works, DP == single-device."""

import os

import jax
import numpy as np
import pytest

from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.parallel import mesh as mesh_lib
from geniconet_tpu.train import checkpoint as ckpt
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.schedule import cyclic_triangular
from geniconet_tpu.train.trainer import Trainer


def small_cfg(tmp_path, model="ico2ico", epochs=3):
    cfg = Config()
    cfg.model.name = model
    cfg.model.subdivisions = 3
    cfg.model.widths = (8, 12, 16)
    cfg.model.latent_features = 24
    cfg.train.batch_size = 8
    cfg.train.train_epoch = epochs
    cfg.train.save_epoch_freq = 2
    cfg.train.log_mesh_epoch = 0
    cfg.optim.lr_base = 1e-4
    cfg.optim.lr_max = 3e-3
    cfg.optim.step_size_up = 20
    cfg.optim.step_size_down = 20
    cfg.log_dir = str(tmp_path)
    return cfg


def test_cyclic_lr_matches_torch_semantics():
    base, mx = 1e-9, 1e-3
    lrs = [float(cyclic_triangular(s, base, mx, 4, 4)) for s in range(10)]
    # step 0 -> base; step 4 -> max; step 8 -> base again
    np.testing.assert_allclose(lrs[0], base)
    np.testing.assert_allclose(lrs[4], mx)
    np.testing.assert_allclose(lrs[8], base)
    assert lrs[1] < lrs[2] < lrs[3] < lrs[4] > lrs[5] > lrs[6]


def test_ae_train_loss_decreases(tmp_path):
    cfg = small_cfg(tmp_path, epochs=4)
    ds = synthetic_dataset(3, 16, seed=0)
    trainer = Trainer(cfg)
    state = trainer.init_state(ds.inputs[:1])
    trn = Batches(ds, cfg.train.batch_size, shuffle=True)
    val = Batches(ds, cfg.train.batch_size, shuffle=False)
    state, history = trainer.fit(state, trn, val, 0)
    assert history[-1] < history[0]
    # EB checkpoints exist and GC keeps them bounded
    ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
    files = os.listdir(ckpt_dir)
    assert any("_EB" in f for f in files)
    assert any("_E2.ckpt" in f or "_E4.ckpt" in f for f in files)


def test_vae_train_and_misc(tmp_path):
    cfg = small_cfg(tmp_path, model="ico2ico_vae", epochs=2)
    ds = synthetic_dataset(3, 12, seed=1)
    trainer = Trainer(cfg)
    state = trainer.init_state(ds.inputs[:1])
    trn = Batches(ds, cfg.train.batch_size, shuffle=True)
    val = Batches(ds, cfg.train.batch_size, shuffle=False)
    state, history = trainer.fit(state, trn, val, 0)
    assert np.isfinite(history).all()
    # VAE checkpoints carry the last-batch (mu, logvar) misc (run.py:274-277)
    ep = ckpt.latest_best_epoch(os.path.join(cfg.model_log_dir(), "savedModel"), cfg.model.name)
    blob = ckpt.load_checkpoint(
        ckpt.checkpoint_path(
            os.path.join(cfg.model_log_dir(), "savedModel"), cfg.model.name, ep, best=True
        )
    )
    assert "misc" in blob and "trn_mean" in blob["misc"]
    assert blob["misc"]["trn_mean"].ndim == 4


def test_resume_roundtrip(tmp_path):
    cfg = small_cfg(tmp_path, epochs=2)
    ds = synthetic_dataset(3, 8, seed=2)
    trainer = Trainer(cfg)
    state = trainer.init_state(ds.inputs[:1])
    trn = Batches(ds, cfg.train.batch_size, shuffle=True)
    val = Batches(ds, cfg.train.batch_size, shuffle=False)
    state, _ = trainer.fit(state, trn, val, 0)
    step_before = int(jax.device_get(state.step))

    ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
    path = ckpt.checkpoint_path(ckpt_dir, cfg.model.name, 2, best=False)
    trainer2 = Trainer(cfg)
    state2 = trainer2.init_state(ds.inputs[:1], seed=7)
    state2, epoch, best_loss = trainer2.restore(state2, path)
    assert epoch == 2
    assert np.isfinite(best_loss)
    assert int(jax.device_get(state2.step)) == step_before
    # params restored identically
    p1 = jax.device_get(state.params)
    p2 = jax.device_get(state2.params)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dp_matches_single_device(tmp_path):
    """8-way data parallel must reproduce the single-device loss trajectory
    (global-batch BatchNorm + summed gradient semantics under GSPMD)."""
    ds = synthetic_dataset(3, 16, seed=3)

    def run(mesh):
        cfg = small_cfg(tmp_path / ("dp" if mesh else "sp"), epochs=2)
        trainer = Trainer(cfg, mesh=mesh)
        state = trainer.init_state(ds.inputs[:1], seed=5)
        sharding = mesh_lib.data_sharding(mesh) if mesh else None
        trn = Batches(ds, 8, shuffle=True, sharding=sharding, seed=9)
        val = Batches(ds, 8, shuffle=False, sharding=sharding)
        state, history = trainer.fit(state, trn, val, 0)
        return np.asarray(history)

    h_single = run(None)
    h_dp = run(mesh_lib.make_mesh(8))
    np.testing.assert_allclose(h_single, h_dp, rtol=2e-3, atol=1e-5)


def test_restore_filtered_partial():
    """Key-filtered partial restore (split-model capability, run.py:360-367)."""
    tgt = {"a": {"x": np.zeros((2, 2), np.float32)}, "b": np.zeros(3, np.float32)}
    stored = {"a": {"x": np.ones((2, 2), np.float32)}, "c": np.ones(5, np.float32)}
    merged, matched, total = ckpt.restore_filtered(tgt, stored)
    assert matched == 1 and total == 2
    np.testing.assert_array_equal(merged["a"]["x"], 1.0)
    np.testing.assert_array_equal(merged["b"], 0.0)


def test_device_resident_gather_matches_streaming(tmp_path, monkeypatch):
    """The fused-dispatch path (batch gather inside the jitted step,
    pipeline.epoch_indices + trainer._jit_train_step_gather) must be
    bit-identical to the streaming epoch() path: same train metrics, same
    validate averages, same final params. (Whole-epoch scan pinned off —
    scan fuses the step differently, so it is loss-curve- but not
    bit-equivalent; see test_epoch_scan_matches_per_step_loop.)"""
    monkeypatch.setenv("GENICONET_EPOCH_SCAN", "0")
    ds = synthetic_dataset(3, 12, seed=0)

    def run(resident):
        cfg = small_cfg(tmp_path / ("r" if resident else "s"), epochs=1)
        trainer = Trainer(cfg)
        state = trainer.init_state(ds.inputs[:1], seed=1)
        trn = Batches(ds, 8, shuffle=True, seed=3, device_resident=resident)
        val = Batches(ds, 8, shuffle=False, device_resident=resident)
        for ep in range(2):
            state, info = trainer.train_epoch(state, trn, ep)
        avg = trainer.validate(state, val, 0)
        return info["last"], avg, state.params

    (m1, v1, p1), (m2, v2, p2) = run(True), run(False)
    assert m1 == m2
    assert v1 == v2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_scan_matches_per_step_loop(tmp_path, monkeypatch):
    """The single-dispatch whole-epoch scan (Trainer._train_epoch_scan_impl)
    must match the per-step gather loop: same shuffle stream
    (Batches.epoch_order vs epoch_indices), same trajectory. Scan inlines
    the step into one program, so XLA fuses/rounds differently — the
    comparison is tight-tolerance, not bitwise."""
    ds = synthetic_dataset(3, 24, seed=0)  # 3 full batches of 8, no tail

    def run(scan):
        monkeypatch.setenv("GENICONET_EPOCH_SCAN", "1" if scan else "0")
        cfg = small_cfg(tmp_path / ("scan" if scan else "loop"), epochs=1)
        trainer = Trainer(cfg)
        state = trainer.init_state(ds.inputs[:1], seed=1)
        trn = Batches(ds, 8, shuffle=True, seed=3, device_resident=True)
        # epoch 0 always takes the per-step loop (the periodic NaN guard
        # fires at global step 0); the scan engages from epoch 1
        for ep in range(2):
            state, info = trainer.train_epoch(state, trn, ep)
        used_scan = trainer._jit_train_epoch_scan._cache_size() > 0
        last = info.get("last_device")
        assert last is not None
        return state.params, used_scan, float(jax.device_get(last["total"]))

    (p1, s1, m1), (p2, s2, m2) = run(True), run(False)
    assert s1 and not s2
    np.testing.assert_allclose(m1, m2, rtol=1e-4)
    # params: Adam turns any rounding difference into an lr-scale step
    # difference (grad/sqrt(v) is sign-like), so after 3 updates the
    # attainable agreement is ~lr_max, not machine epsilon
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-4)
