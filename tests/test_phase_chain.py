"""Phase-chain parity (GENICONET_PHASE_CHAIN): decoder UpBlocks handing
(b0, y10, affines) phase tuples to the next block — with the residual tail
as the consuming kernel's prologue (fused_up_dual_conv_pair) — must
reproduce the default fused route exactly (fp32, interpret mode) through
forward, loss, gradients, optimizer step, running stats, and eval."""

import jax

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer


# CLOSED family (measured negative/crashing on hardware,
# artifacts/env_sweep.json): knobs are quarantined behind the
# GENICONET_EXPERIMENTAL umbrella and these interpret-mode tests ride
# the slow tier only (round-5, VERDICT r4 #6)
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _experimental_umbrella(monkeypatch):
    monkeypatch.setenv("GENICONET_EXPERIMENTAL", "1")


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cm = pltpu.force_tpu_interpret_mode()
    cm.__enter__()
    yield
    cm.__exit__(None, None, None)


def _steps(model, chain, monkeypatch, n=2):
    monkeypatch.setenv("GENICONET_PHASE_CHAIN", "1" if chain else "0")
    ds = synthetic_dataset(3, 8, seed=0)
    cfg = Config()
    cfg.model.name = model
    cfg.model.subdivisions = 3
    cfg.model.widths = (8, 12, 16)
    cfg.model.latent_features = 24
    cfg.model.use_pallas = True
    cfg.train.batch_size = 8
    cfg.train.log_grad_freq = 0
    tr = Trainer(cfg)
    state = tr.init_state(ds.inputs[:1], seed=4)
    x, y, wt = next(iter(Batches(ds, 8, shuffle=False).epoch()))
    for _ in range(n):
        state, m, _, _ = tr._jit_train_step(state, x, y, wt, 0)
    metrics, _ = tr._jit_eval_step(state, x, y, wt, 0)
    return (
        float(jax.device_get(m["total"])),
        jax.device_get(state.params),
        jax.device_get(state.batch_stats),
        float(jax.device_get(metrics["total"])),
    )


@pytest.mark.parametrize("model", ["ico2ico", "ico2ico_vae"])
def test_phase_chain_matches_default(model, monkeypatch):
    # Tolerances: the pair kernels accumulate the affine gradients per grid
    # program instead of one XLA reduction — an fp32 reorder (~1 ulp) that
    # the first Adam update amplifies into an lr-scale parameter difference
    # (same class as test_train's scan-vs-loop comparison).
    loss_d, params_d, bs_d, ev_d = _steps(model, False, monkeypatch)
    loss_c, params_c, bs_c, ev_c = _steps(model, True, monkeypatch)
    np.testing.assert_allclose(loss_c, loss_d, rtol=3e-4)
    np.testing.assert_allclose(ev_c, ev_d, rtol=3e-4)
    for a, b in zip(jax.tree.leaves(params_d), jax.tree.leaves(params_c)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5)
    for a, b in zip(jax.tree.leaves(bs_d), jax.tree.leaves(bs_c)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5)


def test_pair_kernel_grads_match_xla_composition():
    """fused_up_dual_conv_pair == XLA join + phase_merge + fused_up_dual_conv
    at the VALUE level: forward outputs, stats, and every gradient (phases,
    affines, taps, biases) to tight fp32 tolerance on ONE evaluation (no
    optimizer amplification)."""
    import jax.numpy as jnp

    from geniconet_tpu.ops.pallas.phase_kernel import (
        fused_up_dual_conv,
        fused_up_dual_conv_pair,
    )
    from geniconet_tpu.ops.phase import phase_merge

    rng = np.random.RandomState(0)
    B, hp, wp, C, F = 4, 2, 4, 6, 5
    b0 = tuple(jnp.asarray(rng.randn(B, 5, hp, wp, C), jnp.float32)
               for _ in range(4))
    y10 = tuple(jnp.asarray(rng.randn(B, 5, hp, wp, C), jnp.float32)
                for _ in range(4))
    aff = tuple(jnp.asarray(rng.randn(C), jnp.float32) for _ in range(4))
    ta = jnp.asarray(rng.randn(7, C, F), jnp.float32)
    ba = jnp.asarray(rng.randn(F), jnp.float32)
    tb = jnp.asarray(rng.randn(7, C, F), jnp.float32)
    bb = jnp.asarray(rng.randn(F), jnp.float32)

    def loss_pair(args):
        b0, y10, aff, ta, ba, tb, bb = args
        ya, yb, sa, sb = fused_up_dual_conv_pair(
            b0, y10, aff, ta, ba, tb, bb, with_stats=True)
        return (sum(jnp.sum(jnp.sin(p)) for p in ya + yb)
                + jnp.sum(sa) + 2.0 * jnp.sum(sb))

    def loss_xla(args):
        b0, y10, aff, ta, ba, tb, bb = args
        mul1, add1, mul2, add2 = aff
        x = phase_merge(tuple(
            jnp.maximum(a * mul1 + add1 + b * mul2 + add2, 0.0)
            for a, b in zip(b0, y10)
        ))
        ya, yb, sa, sb = fused_up_dual_conv(
            x, ta, ba, tb, bb, with_stats=True)
        return (sum(jnp.sum(jnp.sin(p)) for p in ya + yb)
                + jnp.sum(sa) + 2.0 * jnp.sum(sb))

    args = (b0, y10, aff, ta, ba, tb, bb)
    vp, gp = jax.value_and_grad(loss_pair)(args)
    vx, gx = jax.value_and_grad(loss_xla)(args)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_split_kernel_grads_match_xla_composition():
    """fused_dual_s2_conv_split == fused_dual_s2_conv + phase_split at the
    value level: outputs, stats, and all grads (incl. the act prologue)."""
    import jax.numpy as jnp

    from geniconet_tpu.ops.pallas.phase_kernel import (
        fused_dual_s2_conv,
        fused_dual_s2_conv_split,
    )
    from geniconet_tpu.ops.phase import phase_split

    rng = np.random.RandomState(1)
    B, h, w, C, F = 4, 4, 8, 6, 5
    phases = tuple(jnp.asarray(rng.randn(B, 5, h, w, C), jnp.float32)
                   for _ in range(4))
    act = (jnp.asarray(rng.randn(C), jnp.float32),
           jnp.asarray(rng.randn(C), jnp.float32))
    ta = jnp.asarray(rng.randn(7, C, F), jnp.float32)
    ba = jnp.asarray(rng.randn(F), jnp.float32)
    tb = jnp.asarray(rng.randn(7, C, F), jnp.float32)
    bb = jnp.asarray(rng.randn(F), jnp.float32)

    def loss_split(args):
        phases, act, ta, ba, tb, bb = args
        ya, yb, sa, sb = fused_dual_s2_conv_split(
            phases, ta, ba, tb, bb, act=act, with_stats=True)
        return (sum((i + 1) * jnp.sum(jnp.sin(p))
                    for i, p in enumerate(ya + yb))
                + jnp.sum(sa) + 2.0 * jnp.sum(sb))

    def loss_xla(args):
        phases, act, ta, ba, tb, bb = args
        ya, yb, sa, sb = fused_dual_s2_conv(
            phases, ta, ba, tb, bb, act=act, with_stats=True)
        return (sum((i + 1) * jnp.sum(jnp.sin(p))
                    for i, p in enumerate(phase_split(ya) + phase_split(yb)))
                + jnp.sum(sa) + 2.0 * jnp.sum(sb))

    args = (phases, act, ta, ba, tb, bb)
    vs, gs = jax.value_and_grad(loss_split)(args)
    vx, gx = jax.value_and_grad(loss_xla)(args)
    np.testing.assert_allclose(float(vs), float(vx), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_phase_chain_xla_fallback_matches(monkeypatch):
    """A chain tuple reaching a NON-fused UpBlock (per-block routing) takes
    the XLA join+interleave fallback — trajectory must be unchanged."""
    monkeypatch.setenv("GENICONET_PALLAS_BLOCKS",
                       "conv_in,down0,down1,down2,up0,up2,head")
    loss_d, params_d, _, _ = _steps("ico2ico", False, monkeypatch)
    loss_c, params_c, _, _ = _steps("ico2ico", True, monkeypatch)
    np.testing.assert_allclose(loss_c, loss_d, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_d), jax.tree.leaves(params_c)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
