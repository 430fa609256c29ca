"""Phase-domain form: exact equivalence with the standard grid ops.

These tests pin the phase machinery (ops/phase.py) to the existing, already
independently-validated ops: ico_pad's halo (checked against the
face-derived adjacency oracle in test_conv.py), ico_conv_s2s, and
ico_upsample_s2s. The Pallas phase kernels are then tested against
phase.py in test_phase_kernel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops import phase
from geniconet_tpu.ops.conv import ico_conv_s2s
from geniconet_tpu.ops.pad import ico_pad
from geniconet_tpu.ops.upsample import ico_upsample_s2s


def _rand(s, B=2, C=3, seed=0):
    H, W = ico.chart_shape(s)
    return jnp.asarray(
        np.random.RandomState(seed).randn(B, 5, H, W, C).astype(np.float32)
    )


def test_split_merge_roundtrip():
    x = _rand(4)
    phases = phase.phase_split(x)
    assert all(p.shape == (2, 5, 8, 16, 3) for p in phases)
    np.testing.assert_array_equal(phase.phase_merge(phases), x)


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
@pytest.mark.parametrize("s", [3, 4])
def test_phase_pad_matches_ico_pad(s, corner_mode):
    """Every defined cell of every padded phase equals the corresponding
    cell of the standard padded tensor: padded_phase[p][a, b] ==
    ico_pad(x)[2(a-pr)+pr+1, 2(b-pq)+pq+1]."""
    x = _rand(s)
    U = np.asarray(ico_pad(x, s, corner_mode))  # (B,5,H+2,W+2,C)
    H, W = ico.chart_shape(s)
    h, w = H // 2, W // 2
    padded = phase.phase_pad(phase.phase_split(x), corner_mode)
    # masked cells (never read by the hex taps): ee corner (h, w) and oq
    # array corner (0, 0)
    masked = {0: [(h, w)], 1: [], 2: [], 3: [(0, 0)]}
    for p in range(4):
        pr, pq = p >> 1, p & 1
        got = np.asarray(padded[p])
        for a in range(h + 1):
            for b in range(w + 1):
                if (a, b) in masked[p]:
                    continue
                # phase coord (a - pr, b - pq) -> U cell (2i+pr, 2j+pq)
                R = 2 * (a - pr) + pr
                Q = 2 * (b - pq) + pq
                np.testing.assert_allclose(
                    got[:, :, a, b, :],
                    U[:, :, R + 1, Q + 1, :],
                    rtol=1e-6,
                    err_msg=f"phase {phase.PHASE_NAMES[p]} cell ({a},{b})",
                )


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
@pytest.mark.parametrize("s", [3, 4])
def test_phase_conv_stride1_matches_grid_conv(s, corner_mode):
    x = _rand(s, C=4, seed=1)
    taps = jnp.asarray(np.random.RandomState(2).randn(7, 4, 5).astype(np.float32))
    bias = jnp.asarray(np.random.RandomState(3).randn(5).astype(np.float32))
    ref = ico_conv_s2s(x, taps, bias, s, stride=1, corner_mode=corner_mode)
    outs = phase.phase_conv(phase.phase_split(x), taps, bias, corner_mode)
    got = phase.phase_merge(outs)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
@pytest.mark.parametrize("s", [3, 4])
def test_phase_conv_stride2_is_output_phase_oo(s, corner_mode):
    """The stride-2 conv is exactly output phase (1,0) of the phase conv,
    already in standard level-(s-1) layout."""
    x = _rand(s, C=4, seed=4)
    taps = jnp.asarray(np.random.RandomState(5).randn(7, 4, 6).astype(np.float32))
    ref = ico_conv_s2s(x, taps, None, s, stride=2, corner_mode=corner_mode)
    (got,) = phase.phase_conv(
        phase.phase_split(x), taps, None, corner_mode, out_phases=(2,)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
def test_phase_upsample_matches_grid_upsample(corner_mode):
    s = 3
    x = _rand(s, C=4, seed=6)
    ref = ico_upsample_s2s(x, s, corner_mode)
    phases = phase.phase_upsample(ico_pad(x, s, corner_mode))
    np.testing.assert_allclose(phase.phase_merge(phases), ref, rtol=1e-6)


@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
def test_fused_upsample_conv_pipeline(corner_mode):
    """upsample phases -> phase conv == conv(upsample(x)) at s+1: the whole
    fused-UpBlock contract, in XLA form."""
    s = 3
    x = _rand(s, C=4, seed=7)
    taps = jnp.asarray(np.random.RandomState(8).randn(7, 4, 5).astype(np.float32))
    bias = jnp.asarray(np.random.RandomState(9).randn(5).astype(np.float32))
    up = ico_upsample_s2s(x, s, corner_mode)
    ref = ico_conv_s2s(up, taps, bias, s + 1, stride=1, corner_mode=corner_mode)
    phases = phase.phase_upsample(ico_pad(x, s, corner_mode))
    outs = phase.phase_conv(phases, taps, bias, corner_mode)
    np.testing.assert_allclose(phase.phase_merge(outs), ref, rtol=1e-5, atol=1e-5)


def test_phase_conv_grad_matches_grid_conv_grad():
    """Autodiff through the phase form equals autodiff through the grid
    form (XLA path sanity before the custom-VJP kernels)."""
    s = 3
    x = _rand(s, C=4, seed=10)
    taps = jnp.asarray(np.random.RandomState(11).randn(7, 4, 5).astype(np.float32))

    def loss_grid(x, taps):
        return jnp.sum(ico_conv_s2s(x, taps, None, s, stride=1) ** 2)

    def loss_phase(x, taps):
        outs = phase.phase_conv(phase.phase_split(x), taps, None)
        return jnp.sum(phase.phase_merge(outs) ** 2)

    g0 = jax.grad(loss_grid, argnums=(0, 1))(x, taps)
    g1 = jax.grad(loss_phase, argnums=(0, 1))(x, taps)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
