"""Fused phase-domain Pallas kernels vs the XLA phase composition
(interpret mode on CPU). ops/phase.py is itself pinned to the standard
grid ops in test_phase.py, so agreement here closes the chain
kernel == phase-XLA == grid-XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops import phase
from geniconet_tpu.ops.pad import ico_pad
from geniconet_tpu.ops.pallas import phase_kernel as pk


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    cm = pltpu.force_tpu_interpret_mode()
    cm.__enter__()
    yield
    cm.__exit__(None, None, None)


def _phases(s, B=2, C=4, seed=0):
    """Random phases of a level-s grid: 4 tensors of chart_shape(s-1)."""
    H, W = ico.chart_shape(s)
    x = np.random.RandomState(seed).randn(B, 5, H, W, C).astype(np.float32)
    return phase.phase_split(jnp.asarray(x)), jnp.asarray(x)


def _taps(cin, cout, seed):
    r = np.random.RandomState(seed)
    return (
        jnp.asarray(r.randn(7, cin, cout).astype(np.float32)),
        jnp.asarray(r.randn(cout).astype(np.float32)),
    )


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
@pytest.mark.parametrize("s", [2, 3])
def test_phase_conv_s1_forward(s, corner_mode):
    phases, _ = _phases(s, C=4, seed=0)
    taps, bias = _taps(4, 6, 1)
    ref = phase.phase_conv(phases, taps, bias, corner_mode)
    got = pk.fused_phase_conv_s1(phases, taps, bias, corner_mode)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
def test_phase_conv_s1_grads(corner_mode):
    phases, _ = _phases(2, C=3, seed=2)
    taps, bias = _taps(3, 5, 3)

    def loss_ref(phases, taps, bias):
        outs = phase.phase_conv(phases, taps, bias, corner_mode)
        return sum(jnp.sum(o**2) for o in outs)

    def loss_pk(phases, taps, bias):
        outs = pk.fused_phase_conv_s1(phases, taps, bias, corner_mode)
        return sum(jnp.sum(o**2) for o in outs)

    g0 = jax.grad(loss_ref, argnums=(0, 1, 2))(phases, taps, bias)
    g1 = jax.grad(loss_pk, argnums=(0, 1, 2))(phases, taps, bias)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
@pytest.mark.parametrize("s", [2, 3])
def test_dual_s2_forward(s, corner_mode):
    phases, _ = _phases(s, C=4, seed=4)
    ta, ba = _taps(4, 6, 5)
    tb, bb = _taps(4, 6, 6)
    (ra,) = phase.phase_conv(phases, ta, ba, corner_mode, out_phases=(2,))
    (rb,) = phase.phase_conv(phases, tb, bb, corner_mode, out_phases=(2,))
    ga, gb = pk.fused_dual_s2_conv(phases, ta, ba, tb, bb, corner_mode)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-5)


def test_dual_s2_grads():
    corner_mode = "average"
    phases, _ = _phases(2, C=3, seed=7)
    ta, ba = _taps(3, 4, 8)
    tb, bb = _taps(3, 4, 9)

    def loss_ref(phases, ta, ba, tb, bb):
        (a,) = phase.phase_conv(phases, ta, ba, corner_mode, out_phases=(2,))
        (b,) = phase.phase_conv(phases, tb, bb, corner_mode, out_phases=(2,))
        return jnp.sum(a**2) + jnp.sum(jnp.abs(b))

    def loss_pk(phases, ta, ba, tb, bb):
        a, b = pk.fused_dual_s2_conv(phases, ta, ba, tb, bb, corner_mode)
        return jnp.sum(a**2) + jnp.sum(jnp.abs(b))

    g0 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(phases, ta, ba, tb, bb)
    g1 = jax.grad(loss_pk, argnums=(0, 1, 2, 3, 4))(phases, ta, ba, tb, bb)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
@pytest.mark.parametrize("s", [2, 3])
def test_up_dual_conv_forward(s, corner_mode):
    _, x = _phases(s, C=4, seed=10)
    ta, ba = _taps(4, 6, 11)
    tb, bb = _taps(4, 6, 12)
    up_ph = phase.phase_upsample(ico_pad(x, s, corner_mode))
    ra = phase.phase_conv(up_ph, ta, ba, corner_mode)
    rb = phase.phase_conv(up_ph, tb, bb, corner_mode)
    ga, gb = pk.fused_up_dual_conv(x, ta, ba, tb, bb, corner_mode)
    for r, g in zip(list(ra) + list(rb), list(ga) + list(gb)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
def test_up_dual_conv_grads(corner_mode):
    s = 2
    _, x = _phases(s, C=3, seed=13)
    ta, ba = _taps(3, 4, 14)
    tb, bb = _taps(3, 4, 15)

    def loss_ref(x, ta, ba, tb, bb):
        up_ph = phase.phase_upsample(ico_pad(x, s, corner_mode))
        a = phase.phase_conv(up_ph, ta, ba, corner_mode)
        b = phase.phase_conv(up_ph, tb, bb, corner_mode)
        return sum(jnp.sum(o**2) for o in a) + sum(jnp.sum(jnp.abs(o)) for o in b)

    def loss_pk(x, ta, ba, tb, bb):
        a, b = pk.fused_up_dual_conv(x, ta, ba, tb, bb, corner_mode)
        return sum(jnp.sum(o**2) for o in a) + sum(jnp.sum(jnp.abs(o)) for o in b)

    g0 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, ta, ba, tb, bb)
    g1 = jax.grad(loss_pk, argnums=(0, 1, 2, 3, 4))(x, ta, ba, tb, bb)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_no_bias_paths():
    phases, x = _phases(2, C=3, seed=16)
    ta, _ = _taps(3, 4, 17)
    tb, _ = _taps(3, 4, 18)
    ref = phase.phase_conv(phases, ta, None, "average")
    got = pk.fused_phase_conv_s1(phases, ta, None, "average")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5)

    def loss(x, ta, tb):
        a, b = pk.fused_up_dual_conv(x, ta, None, tb, None, "average")
        return sum(jnp.sum(o**2) for o in a + b)

    g = jax.grad(loss, argnums=(0, 1, 2))(x, ta, tb)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))


def test_batched_k_gt_1():
    """B=4 with small grids exercises the k-sample batching path."""
    phases, _ = _phases(2, B=4, C=3, seed=19)
    taps, bias = _taps(3, 4, 20)
    ref = phase.phase_conv(phases, taps, bias, "average")
    got = pk.fused_phase_conv_s1(phases, taps, bias, "average")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("fam", ["pcs1", "ds2", "upd", "std"])
def test_kernel_geff_fold_matches_xla_fold(fam, monkeypatch):
    """The in-kernel stats-cotangent fold (GENICONET_KERNEL_GEFF) must give
    bit-equal gradients to the XLA-side `_stats_geff` route, including the
    Σg_eff bias gradient, for every kernel family."""
    phases, x_std = _phases(2, C=4, seed=7)
    ta, ba = _taps(4, 6, 8)
    tb, bb = _taps(4, 6, 9)

    if fam == "pcs1":
        def loss(phases, ta, ba):
            out, st = pk.fused_phase_conv_s1(
                phases, ta, ba, "average", with_stats=True)
            return (sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out)
                    + jnp.sum(st * jnp.arange(st.size).reshape(st.shape)))
        args = (phases, ta, ba)
    elif fam == "ds2":
        def loss(phases, ta, ba):
            ya, yb, sa, sb = pk.fused_dual_s2_conv(
                phases, ta, ba, tb, bb, "average", with_stats=True)
            return (jnp.sum(ya.astype(jnp.float32) ** 2)
                    + jnp.sum(yb.astype(jnp.float32) ** 2)
                    + jnp.sum(sa * 0.5) + jnp.sum(sb * 2.0))
        args = (phases, ta, ba)
    elif fam == "upd":
        def loss(x, ta, ba):
            ya, yb, sa, sb = pk.fused_up_dual_conv(
                x, ta, ba, tb, bb, "average", with_stats=True)
            return (sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in ya)
                    + sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in yb)
                    + jnp.sum(sa * 0.5) + jnp.sum(sb * 2.0))
        args = (x_std, ta, ba)
    else:  # std (standard-layout conv, with act prologue)
        from geniconet_tpu.ops.pallas.conv_kernel import fused_ico_conv_s2s

        mul = jnp.asarray(np.random.RandomState(11).rand(4) + 0.5, jnp.float32)
        add = jnp.asarray(np.random.RandomState(12).randn(4), jnp.float32)

        def loss(x, ta, ba):
            y, st = fused_ico_conv_s2s(
                x, ta, ba, 2, "average", stride=1, act=(mul, add),
                with_stats=True)
            return (jnp.sum(y.astype(jnp.float32) ** 2)
                    + jnp.sum(st * jnp.arange(st.size).reshape(st.shape)))
        args = (x_std, ta, ba)

    grad = jax.grad(loss, argnums=(0, 1, 2))
    monkeypatch.setenv("GENICONET_EXPERIMENTAL", "1")  # GEFF env is quarantined
    monkeypatch.setenv("GENICONET_KERNEL_GEFF", "0")
    g_xla = grad(*args)
    monkeypatch.setenv("GENICONET_KERNEL_GEFF", fam)
    g_fold = grad(*args)
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_fold)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
def test_phase_conv_s1_packed_input(corner_mode):
    """Lane-packed (1-tuple (B,5,h,w,4*cin)) input == 4-tuple input, fwd
    and taps/bias grads (the encoder-front path; needs_dx=False)."""
    phases, _ = _phases(3, C=3, seed=5)
    taps, bias = _taps(3, 6, 7)
    xpack = jnp.concatenate(phases, axis=-1)

    out_t, st_t = pk.fused_phase_conv_s1(
        phases, taps, bias, corner_mode, with_stats=True, needs_dx=False)
    out_p, st_p = pk.fused_phase_conv_s1(
        (xpack,), taps, bias, corner_mode, with_stats=True, needs_dx=False)
    for a, b in zip(out_t, out_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(st_t), np.asarray(st_p))

    def loss(form, taps, bias):
        out, st = pk.fused_phase_conv_s1(
            form, taps, bias, corner_mode, with_stats=True, needs_dx=False)
        return sum(jnp.sum(o**2) for o in out) + jnp.sum(st)

    gt = jax.grad(loss, argnums=(1, 2))(phases, taps, bias)
    gp = jax.grad(loss, argnums=(1, 2))((xpack,), taps, bias)
    for a, b in zip(jax.tree.leaves(gt), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("corner_mode", ["average"])
def test_phase_conv_s1_k2_pack_matches(monkeypatch, corner_mode):
    """K2 lane-packed contraction (GENICONET_K2_MAX, round-4): pairwise
    scratch-bounced K-packing must be bit-compatible with the per-tap
    contraction in forward AND both backward matmul shapes."""
    import os

    phases, _ = _phases(2, C=4, seed=7)
    taps, bias = _taps(4, 6, 8)

    def loss(phases, taps, bias):
        outs = pk.fused_phase_conv_s1(phases, taps, bias, corner_mode)
        return sum(jnp.sum(o**2) for o in outs)

    monkeypatch.setenv("GENICONET_EXPERIMENTAL", "1")  # closed family
    monkeypatch.delenv("GENICONET_K2_MAX", raising=False)
    ref_l = loss(phases, taps, bias)
    ref_g = jax.grad(loss, argnums=(0, 1, 2))(phases, taps, bias)
    monkeypatch.setenv("GENICONET_K2_MAX", "128")
    got_l = loss(phases, taps, bias)
    got_g = jax.grad(loss, argnums=(0, 1, 2))(phases, taps, bias)
    np.testing.assert_allclose(got_l, ref_l, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("corner_mode", ["average"])
def test_phase_conv_s1_im2col_scratch_matches(monkeypatch, corner_mode):
    """Scratch-bounced 7-tap im2col (GENICONET_IM2COL_SCRATCH, round-4):
    building the (rows, 7*cin) stacked operand through a scoped VMEM
    scratch must match the plain lane-concat im2col AND the per-tap
    contraction, forward and backward."""
    phases, _ = _phases(2, C=8, seed=11)
    taps, bias = _taps(8, 6, 9)

    def loss(phases, taps, bias):
        outs = pk.fused_phase_conv_s1(phases, taps, bias, corner_mode)
        return sum(jnp.sum(o**2) for o in outs)

    # per-tap reference (im2col off at 7*8=56 > max 0)
    monkeypatch.setenv("GENICONET_EXPERIMENTAL", "1")  # closed family
    monkeypatch.setenv("GENICONET_IM2COL_MAX", "0")
    monkeypatch.delenv("GENICONET_IM2COL_SCRATCH", raising=False)
    ref_l = loss(phases, taps, bias)
    ref_g = jax.grad(loss, argnums=(0, 1, 2))(phases, taps, bias)
    # scratch-bounced im2col
    monkeypatch.setenv("GENICONET_IM2COL_MAX", "128")
    monkeypatch.setenv("GENICONET_IM2COL_SCRATCH", "1")
    got_l = loss(phases, taps, bias)
    got_g = jax.grad(loss, argnums=(0, 1, 2))(phases, taps, bias)
    np.testing.assert_allclose(got_l, ref_l, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)
