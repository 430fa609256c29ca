"""Round-3 surfaces: CLI flag parity (--data_instance/--test_mode/
--write_output_mesh/--corner_mode/optimizer/loss-factor knobs), the sample
process (reference createSample, models.py:329-332), encoding-logging parity
(reference run.py:167-215), and the fused pair-head kernel."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from geniconet_tpu import cli
from geniconet_tpu.train.config import parse_args


def test_flag_parity_routing():
    a = parse_args([
        "--model", "ico2ico", "--process", "test", "--data_instance", "trn",
        "--test_mode", "none", "--write_output_mesh", "--corner_mode", "zeros",
        "--lr_base", "1e-8", "--lr_max", "1e-2", "--step_size_up", "5",
        "--f_pos", "0.5", "--f_nor", "0.25", "--deviceResident", "off",
        "--synthetic", "4",
    ])
    assert a.data_instance == "trn"
    assert a.test_mode == "none"
    assert a.write_output_mesh is True
    assert a.model.corner_mode == "zeros"
    assert a.optim.lr_base == 1e-8 and a.optim.lr_max == 1e-2
    assert a.optim.step_size_up == 5
    f = a.loss_factors
    assert f.pos == 0.5 and f.nor == 0.25 and f.lap == 0.0  # AE base lap
    assert a.data.device_resident_flag() is False
    # defaults keep the per-model factors (reference run.py:689-696)
    b = parse_args(["--model", "ico2ico_vae", "--process", "train",
                    "--synthetic", "4"])
    bf = b.loss_factors
    assert (bf.pos, bf.nor, bf.lap, bf.kl) == (0.6, 0.2, 0.2, 1.0)


def test_test_mode_none_and_write_output_mesh(tmp_path):
    log_dir = str(tmp_path / "log")
    base = [
        "--model", "ico2ico", "--subdivision", "3", "--batch_size", "6",
        "--synthetic", "6", "--logDir", log_dir, "--no_data_parallel",
        "--widths", "8", "12", "16",
    ]
    cli.main(base + ["--process", "train", "--train_epoch", "1"])
    # default: no meshes written (reference --write_output_mesh default off)
    cli.main(base + ["--process", "test"])
    out = os.path.join(log_dir, "ae", "data", "test")
    assert not os.path.exists(out) or not os.listdir(out)
    assert os.path.exists(os.path.join(log_dir, "ae", "ico2ico_point2mesh.csv"))
    # test_mode none + write flag: meshes, no metric file
    cli.main(base + ["--process", "test", "--test_mode", "none",
                     "--write_output_mesh"])
    assert len(os.listdir(out)) == 6
    assert not os.path.exists(os.path.join(log_dir, "ae", "ico2ico_none.csv"))


def test_sample_process_from_checkpoint_misc(tmp_path):
    log_dir = str(tmp_path / "log")
    base = [
        "--model", "ico2ico_vae", "--subdivision", "3", "--batch_size", "6",
        "--synthetic", "6", "--logDir", log_dir, "--no_data_parallel",
        "--widths", "8", "12", "16", "--latent_features", "24",
    ]
    cli.main(base + ["--process", "train", "--train_epoch", "1"])
    cli.main(base + ["--process", "sample", "--n_samples", "3"])
    out = os.path.join(log_dir, "vae", "data", "sample")
    offs = sorted(os.listdir(out))
    assert offs == ["sample_000.off", "sample_001.off", "sample_002.off"]
    from geniconet_tpu.data.offio import read_off

    v, f = read_off(os.path.join(out, offs[0]))
    assert v.shape == (10 * 4**3 + 2, 3) and np.isfinite(v).all()


def test_sample_process_rejects_ae(tmp_path):
    log_dir = str(tmp_path / "log")
    base = [
        "--model", "ico2ico", "--subdivision", "3", "--batch_size", "6",
        "--synthetic", "6", "--logDir", log_dir, "--no_data_parallel",
        "--widths", "8", "12", "16",
    ]
    cli.main(base + ["--process", "train", "--train_epoch", "1"])
    with pytest.raises(SystemExit, match="misc"):
        cli.main(base + ["--process", "sample"])


def test_encoding_logging_both_models(tmp_path):
    """AE logs the 'enc' bottleneck histogram of the fixed 3-sample subset;
    VAE logs mu/logvar/reparam of the first sample (reference
    run.py:167-215); epoch 0 is skipped (run.py:193-194)."""
    import json

    for model, sub in (("ico2ico", "ae"), ("ico2ico_vae", "vae")):
        log_dir = str(tmp_path / model)
        cli.main([
            "--model", model, "--subdivision", "3", "--batch_size", "6",
            "--synthetic", "6", "--logDir", log_dir, "--no_data_parallel",
            "--widths", "8", "12", "16", "--latent_features", "24",
            "--process", "train", "--train_epoch", "2",
            "--log_encoding_epoch", "1",
        ])
        events = [
            json.loads(l)
            for l in open(os.path.join(log_dir, sub, "events.jsonl"))
        ]
        tags = {e["prefix"] for e in events if "prefix" in e}
        if model == "ico2ico":
            assert "ico2ico" in tags, tags  # histogram JSONL fallback tag
        else:
            assert {"mu", "logvar", "reparam"} <= tags, tags


def test_fused_pair_head_matches_xla_composition():
    """fused_pair_head == relu(two-affine pair) -> 1x1 head -> tanh, values
    and gradients (fp32, interpret mode)."""
    from geniconet_tpu.ops.pallas.phase_kernel import fused_pair_head
    from geniconet_tpu.ops.phase import phase_merge

    rng = np.random.RandomState(0)
    B, h, w, C, F = 4, 4, 8, 16, 3
    b0 = tuple(jnp.asarray(rng.randn(B, 5, h, w, C), jnp.float32) for _ in range(4))
    y10 = tuple(jnp.asarray(rng.randn(B, 5, h, w, C), jnp.float32) for _ in range(4))
    affines = tuple(jnp.asarray(rng.rand(C) + 0.5, jnp.float32) for _ in range(4))
    W = jnp.asarray(rng.randn(C, F) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)

    def xla_ref(b0, y10, m1, a1, m2, a2, W, bias):
        out = tuple(
            jnp.maximum(a * m1 + a1 + b * m2 + a2, 0.0)
            for a, b in zip(b0, y10)
        )
        x = phase_merge(out)
        return jnp.tanh(x @ W + bias)

    def fused(b0, y10, m1, a1, m2, a2, W, bias):
        return phase_merge(fused_pair_head(b0, y10, (m1, a1, m2, a2), W, bias))

    args = (b0, y10, *affines, W, bias)
    with pltpu.force_tpu_interpret_mode():
        out_f = fused(*args)
        out_x = xla_ref(*args)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                                   rtol=1e-6, atol=1e-6)
        # gradients through every argument
        loss_f = lambda *a: jnp.sum(jnp.sin(fused(*a)))
        loss_x = lambda *a: jnp.sum(jnp.sin(xla_ref(*a)))
        gf = jax.grad(loss_f, argnums=tuple(range(8)))(*args)
        gx = jax.grad(loss_x, argnums=tuple(range(8)))(*args)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


def test_fit_with_retry_resumes(tmp_path, monkeypatch):
    """A transient backend error mid-fit auto-resumes from the newest
    checkpoint (soak-stability wrapper); non-transient errors re-raise."""
    import time
    import types

    from geniconet_tpu.cli import _fit_with_retry
    from geniconet_tpu.train.config import Config

    monkeypatch.setattr(time, "sleep", lambda s: None)
    cfg = Config()
    cfg.log_dir = str(tmp_path)
    cfg.train.backend_retries = 2
    ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
    os.makedirs(ckpt_dir)
    open(os.path.join(ckpt_dir, "ico2ico_E3.ckpt"), "wb").close()

    calls = {"fit": 0, "restored_from": None}

    class FakeTrainer:
        def fit(self, state, trn, val, start_epoch, best_loss):
            calls["fit"] += 1
            if calls["fit"] == 1:
                raise RuntimeError("INTERNAL: TPU backend error: wedged")
            return (state, [start_epoch, best_loss])

        def init_state(self, x, seed=0):
            return "fresh"

        def restore(self, state, path):
            calls["restored_from"] = path
            return ("restored", 3, 0.25)

    trn = types.SimpleNamespace(ds=types.SimpleNamespace(inputs=np.zeros((2, 4))))
    state, hist = _fit_with_retry(cfg, FakeTrainer(), "s0", trn, None, 0, np.inf)
    assert calls["fit"] == 2
    assert calls["restored_from"].endswith("ico2ico_E3.ckpt")
    assert hist == [3, 0.25]  # resumed epoch/best_loss reached the retry fit

    class FatalTrainer(FakeTrainer):
        def fit(self, *a):
            raise ValueError("user bug, not a backend error")

    with pytest.raises(ValueError):
        _fit_with_retry(cfg, FatalTrainer(), "s0", trn, None, 0, np.inf)


def test_latest_checkpoint_prefers_newest():
    import tempfile

    from geniconet_tpu.train import checkpoint as ckpt

    with tempfile.TemporaryDirectory() as d:
        for name in ("ico2ico_EB4.ckpt", "ico2ico_E3.ckpt",
                     "ico2ico_vae_EB9.ckpt"):
            open(os.path.join(d, name), "wb").close()
        assert ckpt.latest_checkpoint(d, "ico2ico").endswith("ico2ico_EB4.ckpt")
        assert ckpt.latest_checkpoint(d, "ico2ico_vae").endswith("_EB9.ckpt")
        assert ckpt.latest_checkpoint(d, "nope") is None


def test_fused_mse_loss_matches_general_path():
    """The AE loss-fused route (head+tanh+SSE in one kernel, recon never in
    HBM) must reproduce the general p2p path: loss + one optimizer step, and
    the XLA fallback of recon_sse must match grid_to_vertices-based SSE."""
    import unittest.mock as mock

    from geniconet_tpu.data.datasets import synthetic_dataset
    from geniconet_tpu.data.pipeline import Batches
    from geniconet_tpu.train.config import Config
    from geniconet_tpu.train.trainer import Trainer

    ds = synthetic_dataset(3, 8, seed=0)

    def one(use_pallas, fused_mse):
        cfg = Config()
        cfg.model.name = "ico2ico"
        cfg.model.subdivisions = 3
        cfg.model.widths = (8, 12, 16)
        cfg.model.use_pallas = use_pallas
        cfg.train.batch_size = 8
        cfg.train.log_grad_freq = 0
        with mock.patch.object(jax, "default_backend", lambda: "tpu"):
            with pltpu.force_tpu_interpret_mode():
                tr = Trainer(cfg)
                tr._fused_mse = fused_mse
                st = tr.init_state(ds.inputs[:1], seed=4)
                x, y, wt = next(iter(Batches(ds, 8, shuffle=False).epoch()))
                st, m, _, _ = tr._jit_train_step(st, x, y, wt, 0)
                st, m, _, _ = tr._jit_train_step(st, x, y, wt, 0)
                ev, _ = tr._jit_eval_step(st, x, y, wt, 0)
        return (float(jax.device_get(m["total"])),
                float(jax.device_get(ev["total"])),
                jax.device_get(st.params))

    l_gen, e_gen, p_gen = one(True, False)   # pallas, general p2p loss
    l_fus, e_fus, p_fus = one(True, True)    # pallas, kernel-fused SSE
    np.testing.assert_allclose(l_fus, l_gen, rtol=1e-6)
    np.testing.assert_allclose(e_fus, e_gen, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_gen), jax.tree.leaves(p_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # XLA fallback of recon_sse (use_pallas=False) matches too
    l_xla, e_xla, _ = one(False, True)
    np.testing.assert_allclose(l_xla, l_gen, rtol=1e-5)
    np.testing.assert_allclose(e_xla, e_gen, rtol=1e-5)


def test_orbax_checkpoint_backend(tmp_path, monkeypatch):
    """GENICONET_CKPT_BACKEND=orbax: directory-per-checkpoint saves with the
    same EB naming/GC/resume semantics; loading auto-detects the format."""
    import numpy as np

    from geniconet_tpu.train import checkpoint as ckpt

    monkeypatch.setenv("GENICONET_CKPT_BACKEND", "orbax")
    d = str(tmp_path / "savedModel")
    state = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": 7, "epoch": 3, "loss": 0.5, "best_loss": 0.5,
    }
    for ep in range(1, 9):
        state["epoch"] = ep
        p = ckpt.checkpoint_path(d, "ico2ico", ep, best=True)
        ckpt.save_checkpoint(p, state)
        ckpt.gc_best_checkpoints(d, "ico2ico")
    import os

    assert os.path.isdir(ckpt.checkpoint_path(d, "ico2ico", 8, best=True))
    # GC kept the newest 6 EB directories
    assert sorted(ckpt._best_epochs(d, "ico2ico")) == [3, 4, 5, 6, 7, 8]
    latest = ckpt.latest_checkpoint(d, "ico2ico")
    blob = ckpt.load_checkpoint(latest)
    assert int(blob["epoch"]) == 8
    np.testing.assert_array_equal(blob["params"]["w"],
                                  state["params"]["w"])
    # mixed-format dir: an msgpack file at a higher epoch wins
    monkeypatch.setenv("GENICONET_CKPT_BACKEND", "msgpack")
    state["epoch"] = 9
    ckpt.save_checkpoint(ckpt.checkpoint_path(d, "ico2ico", 9, best=False), state)
    blob2 = ckpt.load_checkpoint(ckpt.latest_checkpoint(d, "ico2ico"))
    assert int(blob2["epoch"]) == 9
