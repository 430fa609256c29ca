"""act (BN-apply+ReLU prologue) and with_stats (in-kernel moment sums) on
the fused kernels, values AND gradients, vs independent XLA compositions
(interpret mode — same harness as test_phase_kernel.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops import phase as ph
from geniconet_tpu.ops.conv import ico_conv_s2s
from geniconet_tpu.ops.pallas import conv_kernel as ck
from geniconet_tpu.ops.pallas import phase_kernel as pk


@pytest.fixture(autouse=True)
def _interpret_mode():
    cm = pltpu.force_tpu_interpret_mode()
    cm.__enter__()
    yield
    cm.__exit__(None, None, None)


@pytest.fixture(autouse=True, params=["0", "1"])
def _merged_bwd(request, monkeypatch):
    # cover BOTH backward routes: separate dx/dtaps kernels with the XLA
    # stats fold ("0", the hardware default) and the merged single-kernel
    # backward ("1", a closed family quarantined behind the experimental
    # umbrella — interpret-mode parity coverage is kept here)
    monkeypatch.setenv("GENICONET_EXPERIMENTAL", "1")
    monkeypatch.setenv("GENICONET_MERGED_BWD", request.param)


def _mk(s, B, cin, cout, seed=0):
    rng = np.random.RandomState(seed)
    H, W = ico.grid_shape(s)
    x = jnp.asarray(rng.randn(B, 5, H // 5, W, cin).astype(np.float32))
    taps = jnp.asarray(0.2 * rng.randn(7, cin, cout).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(cout).astype(np.float32))
    mul = jnp.asarray(rng.uniform(0.5, 1.5, cin).astype(np.float32))
    add = jnp.asarray(0.3 * rng.randn(cin).astype(np.float32))
    return x, taps, bias, mul, add


def _stats_ref(arrs):
    s = sum(jnp.sum(a, axis=tuple(range(a.ndim - 1))) for a in arrs)
    ss = sum(jnp.sum(jnp.square(a), axis=tuple(range(a.ndim - 1))) for a in arrs)
    return jnp.stack([s, ss])


def test_phase_s1_act_stats_value_and_grad():
    s, B, cin, cout = 3, 4, 8, 16
    x, taps, bias, mul, add = _mk(s, B, cin, cout)

    def xla(x, taps, bias, mul, add):
        xa = jnp.maximum(x * mul + add, 0.0)
        outs = ph.phase_conv(ph.phase_split(xa), taps, bias, "average")
        st = _stats_ref(outs)
        return outs, st

    def fused(x, taps, bias, mul, add):
        phases = ph.phase_split(jax.lax.stop_gradient(x) * 0 + x)
        return pk.fused_phase_conv_s1(
            phases, taps, bias, "average", act=(mul, add), with_stats=True
        )

    o_x, s_x = xla(x, taps, bias, mul, add)
    o_f, s_f = fused(x, taps, bias, mul, add)
    for a, b in zip(o_x, o_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_f), rtol=1e-5)

    # gradient through BOTH the activations and the stats outputs
    def loss(fn):
        def f(x, taps, bias, mul, add):
            outs, st = fn(x, taps, bias, mul, add)
            return (
                sum(jnp.sum(jnp.sin(o)) for o in outs)
                + jnp.sum(st[0] * 0.3)
                + jnp.sum(st[1] * 0.1)
            )
        return f

    gx = jax.grad(loss(xla), argnums=(0, 1, 2, 3, 4))(x, taps, bias, mul, add)
    gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(x, taps, bias, mul, add)
    for a, b in zip(gx, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_dual_s2_act_stats_value_and_grad():
    s, B, cin, cout = 3, 4, 8, 12
    x, ta, ba, mul, add = _mk(s, B, cin, cout)
    _, tb, bb, _, _ = _mk(s, B, cin, cout, seed=1)

    def xla(x, ta, ba, tb, bb, mul, add):
        xa = jnp.maximum(x * mul + add, 0.0)
        phases = ph.phase_split(xa)
        (ya,) = ph.phase_conv(phases, ta, ba, "average", out_phases=(2,))
        (yb,) = ph.phase_conv(phases, tb, bb, "average", out_phases=(2,))
        return ya, yb, _stats_ref([ya]), _stats_ref([yb])

    def fused(x, ta, ba, tb, bb, mul, add):
        return pk.fused_dual_s2_conv(
            ph.phase_split(x), ta, ba, tb, bb, "average",
            act=(mul, add), with_stats=True,
        )

    rx = xla(x, ta, ba, tb, bb, mul, add)
    rf = fused(x, ta, ba, tb, bb, mul, add)
    for a, b in zip(rx, rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def loss(fn):
        def f(*args):
            ya, yb, sa, sb = fn(*args)
            return (jnp.sum(jnp.sin(ya)) + jnp.sum(jnp.cos(yb))
                    + jnp.sum(sa * 0.2) + jnp.sum(sb[1] * 0.05))
        return f

    gx = jax.grad(loss(xla), argnums=tuple(range(7)))(x, ta, ba, tb, bb, mul, add)
    gf = jax.grad(loss(fused), argnums=tuple(range(7)))(x, ta, ba, tb, bb, mul, add)
    for a, b in zip(gx, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_up_dual_stats_value_and_grad():
    s, B, cin, cout = 2, 4, 6, 10
    x, ta, ba, _, _ = _mk(s, B, cin, cout)
    _, tb, bb, _, _ = _mk(s, B, cin, cout, seed=2)

    from geniconet_tpu.ops.pad import ico_pad
    from geniconet_tpu.ops.upsample import ico_upsample_s2s

    def xla(x, ta, ba, tb, bb):
        up = ico_upsample_s2s(x, s, "average")
        phases = ph.phase_split(up)
        ya = ph.phase_conv(phases, ta, ba, "average")
        yb = ph.phase_conv(phases, tb, bb, "average")
        return ya, yb, _stats_ref(ya), _stats_ref(yb)

    def fused(x, ta, ba, tb, bb):
        return pk.fused_up_dual_conv(x, ta, ba, tb, bb, "average", with_stats=True)

    rx = xla(x, ta, ba, tb, bb)
    rf = fused(x, ta, ba, tb, bb)
    for a, b in zip(rx[0], rf[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(rx[1], rf[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rx[2]), np.asarray(rf[2]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rx[3]), np.asarray(rf[3]), rtol=1e-5)

    def loss(fn):
        def f(*args):
            ya, yb, sa, sb = fn(*args)
            return (sum(jnp.sum(jnp.sin(o)) for o in ya)
                    + sum(jnp.sum(jnp.cos(o)) for o in yb)
                    + jnp.sum(sa[0] * 0.1) + jnp.sum(sb * 0.07))
        return f

    gx = jax.grad(loss(xla), argnums=tuple(range(5)))(x, ta, ba, tb, bb)
    gf = jax.grad(loss(fused), argnums=tuple(range(5)))(x, ta, ba, tb, bb)
    for a, b in zip(gx, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_standard_conv_act_stats_value_and_grad():
    s, B, cin, cout = 3, 4, 8, 16
    x, taps, bias, mul, add = _mk(s, B, cin, cout, seed=3)

    def xla(x, taps, bias, mul, add):
        xa = jnp.maximum(x * mul + add, 0.0)
        y = ico_conv_s2s(xa, taps, bias, s, stride=1, corner_mode="average")
        return y, _stats_ref([y])

    def fused(x, taps, bias, mul, add):
        return ck.fused_ico_conv_s2s(
            x, taps, bias, s, "average", 1, act=(mul, add), with_stats=True
        )

    y_x, s_x = xla(x, taps, bias, mul, add)
    y_f, s_f = fused(x, taps, bias, mul, add)
    np.testing.assert_allclose(np.asarray(y_x), np.asarray(y_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_f), rtol=1e-5)

    def loss(fn):
        def f(*args):
            y, st = fn(*args)
            return jnp.sum(jnp.sin(y)) + jnp.sum(st[0] * 0.2) + jnp.sum(st[1] * 0.03)
        return f

    gx = jax.grad(loss(xla), argnums=tuple(range(5)))(x, taps, bias, mul, add)
    gf = jax.grad(loss(fused), argnums=tuple(range(5)))(x, taps, bias, mul, add)
    for a, b in zip(gx, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_standard_conv_bias_none():
    """'bias may be None' contract on the fused standard conv (fwd + vjp)."""
    s, B, cin, cout = 3, 4, 8, 12
    x, taps, _, _, _ = _mk(s, B, cin, cout, seed=5)
    y = ck.fused_ico_conv_s2s(x, taps, None, s, "average", 1)
    yr = ico_conv_s2s(x, taps, None, s, stride=1, corner_mode="average")
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5)
    g = jax.grad(
        lambda x, t: jnp.sum(ck.fused_ico_conv_s2s(x, t, None, s, "average", 1) ** 2),
        argnums=(0, 1),
    )(x, taps)
    gr = jax.grad(
        lambda x, t: jnp.sum(ico_conv_s2s(x, t, None, s, stride=1,
                                          corner_mode="average") ** 2),
        argnums=(0, 1),
    )(x, taps)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_no_stats_no_act_unchanged():
    """The plain paths still bit-match the pre-feature behavior."""
    s, B, cin, cout = 3, 4, 8, 12
    x, taps, bias, _, _ = _mk(s, B, cin, cout, seed=4)
    got = pk.fused_phase_conv_s1(ph.phase_split(x), taps, bias, "average")
    want = ph.phase_conv(ph.phase_split(x), taps, bias, "average")
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    y = ck.fused_ico_conv_s2s(x, taps, bias, s, "average", 1)
    yr = ico_conv_s2s(x, taps, bias, s, stride=1, corner_mode="average")
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5)
