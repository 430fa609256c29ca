"""Fused Pallas conv vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops.conv import ico_conv_s2s
from geniconet_tpu.ops.pallas import conv_kernel


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode (tests run on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    cm = pltpu.force_tpu_interpret_mode()
    cm.__enter__()
    yield
    cm.__exit__(None, None, None)


@pytest.mark.parametrize("s", [1, 2, 3])
@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
def test_matches_xla_path(s, corner_mode):
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, h, w, 4).astype(np.float32))
    taps = jnp.asarray(rng.randn(7, 4, 6).astype(np.float32))
    bias = jnp.asarray(rng.randn(6).astype(np.float32))
    ref = ico_conv_s2s(x, taps, bias, s, stride=1, corner_mode=corner_mode)
    got = conv_kernel.fused_ico_conv_s2s(x, taps, bias, s, corner_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_no_bias():
    s = 2
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 5, h, w, 3).astype(np.float32))
    taps = jnp.asarray(rng.randn(7, 3, 5).astype(np.float32))
    ref = ico_conv_s2s(x, taps, None, s)
    got = conv_kernel.fused_ico_conv_s2s(x, taps, None, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("s", [2, 3])
@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
def test_stride2_matches_xla(s, corner_mode):
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 5, h, w, 4).astype(np.float32))
    taps = jnp.asarray(rng.randn(7, 4, 6).astype(np.float32))
    bias = jnp.asarray(rng.randn(6).astype(np.float32))
    ref = ico_conv_s2s(x, taps, bias, s, stride=2, corner_mode=corner_mode)
    got = conv_kernel.fused_ico_conv_s2s(x, taps, bias, s, corner_mode, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_stride2_gradients_match_xla():
    s = 3
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 5, h, w, 3).astype(np.float32))
    taps = jnp.asarray(rng.randn(7, 3, 4).astype(np.float32))
    bias = jnp.asarray(rng.randn(4).astype(np.float32))

    def loss_fused(x, t, b):
        return jnp.sum(conv_kernel.fused_ico_conv_s2s(x, t, b, s, "average", 2) ** 2)

    def loss_ref(x, t, b):
        return jnp.sum(ico_conv_s2s(x, t, b, s, stride=2) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, taps, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, taps, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_gradients_match_xla():
    s = 2
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 5, h, w, 3).astype(np.float32))
    taps = jnp.asarray(rng.randn(7, 3, 4).astype(np.float32))
    bias = jnp.asarray(rng.randn(4).astype(np.float32))

    def loss_fused(x, t, b):
        return jnp.sum(conv_kernel.fused_ico_conv_s2s(x, t, b, s) ** 2)

    def loss_ref(x, t, b):
        return jnp.sum(ico_conv_s2s(x, t, b, s) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, taps, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, taps, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)
