"""Hex conv + halo padding correctness against the face-derived mesh graph.

The decisive test: a uniform-weight 7-tap conv must act as the graph operator
``A + I (+ one duplicated true neighbor at the 10 non-pole base vertices)``
on any vertex signal, with the pole taps reading the corner-mode synthesized
value. Adjacency comes from the face table — an independent code path from
the halo slicing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops import pad as pad_mod
from geniconet_tpu.ops.conv import (
    HEX_TAP_OFFSETS,
    ico_conv_s2s,
    kernel_to_taps,
    merge_charts,
    split_charts,
    taps_to_kernel,
)

jax.config.update("jax_default_matmul_precision", "float32")


def _vertex_signal_to_charts(sig, s):
    """(V, C) numpy vertex signal -> (1, 5, h, w, C) chart tensor (poles dropped)."""
    h, w = ico.chart_shape(s)
    return jnp.asarray(sig[: 5 * h * w].reshape(1, 5, h, w, -1))


@pytest.mark.parametrize("s", [1, 2, 3, 4])
@pytest.mark.parametrize("corner_mode", ["average", "zeros"])
def test_padded_index_map_matches_ico_pad(s, corner_mode):
    """ico_pad (jnp slicing) must realize exactly the symbolic index map."""
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(0)
    sig = rng.randn(ico.num_vertices(s), 3).astype(np.float32)
    x = _vertex_signal_to_charts(sig, s)
    P = np.asarray(pad_mod.ico_pad(x, s, corner_mode))[0]

    idx_map = pad_mod.padded_index_map(s)
    grid_sig = sig[: 5 * h * w]
    north = grid_sig.reshape(5, h, w, 3)[:, 0, 0].mean(0)
    south = grid_sig.reshape(5, h, w, 3)[:, h - 1, w - 1].mean(0)
    expect = np.empty(idx_map.shape + (3,), np.float32)
    stored = idx_map >= 0
    expect[stored] = grid_sig[idx_map[stored]]
    expect[idx_map == pad_mod.MASKED] = 0.0
    expect[idx_map == pad_mod.NORTH_SYNTH] = north if corner_mode == "average" else 0.0
    expect[idx_map == pad_mod.SOUTH_SYNTH] = south if corner_mode == "average" else 0.0
    np.testing.assert_allclose(P, expect, atol=1e-6)


@pytest.mark.parametrize("s", [1, 2, 3, 4])
def test_halo_cells_are_true_neighbors(s):
    """Every halo cell read by some tap must hold a true mesh neighbor of the
    cell(s) whose stencil reads it, per face-derived adjacency."""
    h, w = ico.chart_shape(s)
    idx_map = pad_mod.padded_index_map(s).copy()
    V = ico.num_vertices(s)
    north, south = V - 2, V - 1
    idx_map[idx_map == pad_mod.NORTH_SYNTH] = north
    idx_map[idx_map == pad_mod.SOUTH_SYNTH] = south

    nbrs, mask = ico.get_neighbor_table(s)
    # dense boolean adjacency for vectorized membership checks
    adj = np.zeros((V, V), bool)
    adj[np.repeat(np.arange(V), 6)[mask.ravel()], nbrs[mask]] = True

    centers = np.arange(5 * h * w).reshape(5, h, w)
    for di, dj in HEX_TAP_OFFSETS:
        if (di, dj) == (0, 0):
            continue
        reads = idx_map[:, 1 + di : 1 + di + h, 1 + dj : 1 + dj + w]
        assert (reads >= 0).all(), f"masked cell read by tap {(di, dj)}"
        assert adj[centers.ravel(), reads.ravel()].all(), (
            f"tap {(di, dj)} reads a non-neighbor somewhere"
        )


@pytest.mark.parametrize("s", [1, 2, 3])
def test_uniform_conv_is_adjacency_action(s):
    """Uniform-tap conv == x + sum of true neighbors (+dup at base vertices)."""
    h, w = ico.chart_shape(s)
    V = ico.num_vertices(s)
    rng = np.random.RandomState(1)
    sig = rng.randn(V, 2).astype(np.float32)
    # make pole signal values equal the average the halo synthesizes, so the
    # pole taps read the true pole signal and no special-casing is needed
    grid = sig[: 5 * h * w].reshape(5, h, w, 2)
    sig[V - 2] = grid[:, 0, 0].mean(0)
    sig[V - 1] = grid[:, h - 1, w - 1].mean(0)

    x = _vertex_signal_to_charts(sig, s)
    taps = jnp.ones((7, 2, 2), jnp.float32) * jnp.eye(2)[None]
    out = np.asarray(ico_conv_s2s(x, taps, None, s, stride=1))[0].reshape(5 * h * w, 2)

    nbrs, mask = ico.get_neighbor_table(s)
    expected = sig[: 5 * h * w] + (sig[nbrs] * mask[:, :, None])[: 5 * h * w].sum(1)

    # the 10 non-pole base vertices (degree 5) get one duplicated neighbor tap
    deg = mask.sum(1)
    dup_cells = np.where(deg[: 5 * h * w] == 5)[0]
    assert len(dup_cells) == 10
    idx_map = pad_mod.padded_index_map(s)
    for cell in dup_cells:
        c, rq = divmod(cell, h * w)
        r, q = divmod(rq, w)
        tap_reads = [
            idx_map[c, r + 1 + di, q + 1 + dj]
            for (di, dj) in HEX_TAP_OFFSETS
            if (di, dj) != (0, 0)
        ]
        # exactly one duplicate among the 6 neighbor taps
        vals, counts = np.unique(tap_reads, return_counts=True)
        dups = vals[counts == 2]
        assert len(dups) == 1 and (counts <= 2).all()
        expected[cell] += sig[dups[0]]

    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s", [2, 3])
def test_chart_roll_equivariance(s):
    """Conv must commute with the 5-fold chart rotation symmetry."""
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 5, h, w, 3).astype(np.float32))
    taps = jnp.asarray(rng.randn(7, 3, 4).astype(np.float32))
    out = ico_conv_s2s(x, taps, None, s)
    out_rolled = ico_conv_s2s(jnp.roll(x, 1, axis=1), taps, None, s)
    np.testing.assert_allclose(
        np.asarray(jnp.roll(out, 1, axis=1)), np.asarray(out_rolled), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("s", [2, 3])
def test_stride2_subsamples_stride1(s):
    """Stride-2 output == stride-1 output sampled at stored (2r'+1, 2q')."""
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 5, h, w, 2).astype(np.float32))
    taps = jnp.asarray(rng.randn(7, 2, 3).astype(np.float32))
    full = np.asarray(ico_conv_s2s(x, taps, None, s, stride=1))
    half = np.asarray(ico_conv_s2s(x, taps, None, s, stride=2))
    assert half.shape == (1, 5, h // 2, w // 2, 3)
    np.testing.assert_allclose(half, full[:, :, 1::2, 0::2, :], rtol=1e-5, atol=1e-5)


def test_taps_kernel_roundtrip():
    rng = np.random.RandomState(4)
    taps = rng.randn(7, 3, 5).astype(np.float32)
    k = np.asarray(taps_to_kernel(jnp.asarray(taps)))
    assert k.shape == (3, 3, 3, 5)
    np.testing.assert_array_equal(k[0, 0], 0)
    np.testing.assert_array_equal(k[2, 2], 0)
    np.testing.assert_allclose(kernel_to_taps(k), taps)


def test_split_merge_roundtrip():
    s = 3
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 5 * h, w, 4).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(merge_charts(split_charts(x, s))), np.asarray(x))


@pytest.mark.parametrize("s", [2])
def test_conv_bias_and_grad(s):
    h, w = ico.chart_shape(s)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 5, h, w, 2).astype(np.float32))
    taps = jnp.asarray(rng.randn(7, 2, 3).astype(np.float32))
    bias = jnp.asarray(rng.randn(3).astype(np.float32))

    def f(t, b):
        return jnp.sum(ico_conv_s2s(x, t, b, s) ** 2)

    g_taps, g_bias = jax.grad(f, argnums=(0, 1))(taps, bias)
    assert np.isfinite(np.asarray(g_taps)).all()
    assert np.isfinite(np.asarray(g_bias)).all()
    assert np.abs(np.asarray(g_taps)).max() > 0
