"""Whole-model parity: use_pallas=True must reproduce the XLA path exactly
(fp32, interpret mode) through forward, loss, and one optimizer step."""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # pretend to be TPU so build_model keeps use_pallas, but run kernels in
    # the interpreter (tests run on CPU)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cm = pltpu.force_tpu_interpret_mode()
    cm.__enter__()
    yield
    cm.__exit__(None, None, None)


@pytest.mark.parametrize("model", ["ico2ico", "ico2ico_vae"])
def test_train_step_matches_xla(model):
    ds = synthetic_dataset(3, 8, seed=0)

    def one_step(use_pallas):
        cfg = Config()
        cfg.model.name = model
        cfg.model.subdivisions = 3
        cfg.model.widths = (8, 12, 16)
        cfg.model.latent_features = 24
        cfg.model.use_pallas = use_pallas
        cfg.train.batch_size = 8
        cfg.train.log_grad_freq = 0
        tr = Trainer(cfg)
        state = tr.init_state(ds.inputs[:1], seed=4)
        x, y, wt = next(iter(Batches(ds, 8, shuffle=False).epoch()))
        state, m, _, _ = tr._jit_train_step(state, x, y, wt, 0)
        # a second step exercises gradients applied by the first
        state, m, _, _ = tr._jit_train_step(state, x, y, wt, 0)
        return float(jax.device_get(m["total"])), jax.device_get(state.params)

    loss_x, params_x = one_step(False)
    loss_p, params_p = one_step(True)
    np.testing.assert_allclose(loss_p, loss_x, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_x), jax.tree.leaves(params_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_running_stats_and_eval_match_xla():
    """The kernel-stats BatchNorm path (_StatsBN) must update running
    mean/var exactly like nn.BatchNorm AND produce the same eval-mode
    (use_running_average) forward — this is what checkpoint cross-loading
    between the XLA and Pallas paths relies on."""
    ds = synthetic_dataset(3, 8, seed=1)

    def train_then_eval(use_pallas):
        cfg = Config()
        cfg.model.name = "ico2ico"
        cfg.model.subdivisions = 3
        cfg.model.widths = (8, 12, 16)
        cfg.model.use_pallas = use_pallas
        cfg.train.batch_size = 8
        cfg.train.log_grad_freq = 0
        tr = Trainer(cfg)
        state = tr.init_state(ds.inputs[:1], seed=7)
        x, y, wt = next(iter(Batches(ds, 8, shuffle=False).epoch()))
        for _ in range(3):
            state, m, _, _ = tr._jit_train_step(state, x, y, wt, 0)
        # eval-mode forward consumes the RUNNING stats
        (metrics, _) = tr._jit_eval_step(state, x, y, wt, 0)
        return (
            jax.device_get(state.batch_stats),
            float(jax.device_get(metrics["total"])),
        )

    bs_x, eval_x = train_then_eval(False)
    bs_p, eval_p = train_then_eval(True)
    flat_x = jax.tree_util.tree_flatten_with_path(bs_x)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(bs_p)[0]
    assert [p for p, _ in flat_x] == [p for p, _ in flat_p]  # same variable tree
    for (path, a), (_, b) in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg="/".join(str(getattr(k, "key", k)) for k in path),
        )
    np.testing.assert_allclose(eval_p, eval_x, rtol=1e-5)
