"""Loss semantics vs independent numpy computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geniconet_tpu.geometry import ico
from geniconet_tpu.losses.p2p import (
    LossFactors,
    kl_factor_at_epoch,
    kld_loss,
    p2p_loss,
    p2pkld_loss,
)
from geniconet_tpu.ops import mesh_math


def _setup(s=2, B=2, seed=0):
    rng = np.random.RandomState(seed)
    H, W = ico.grid_shape(s)
    out = rng.randn(B, H, W, 3).astype(np.float32)
    V = ico.num_vertices(s)
    tgt = rng.randn(B, V, 9).astype(np.float32)
    return jnp.asarray(out), jnp.asarray(tgt)


def test_pos_only_is_mse_with_poles():
    s = 2
    out, tgt = _setup(s)
    loss, m = p2p_loss(out, tgt, s, LossFactors.ae())
    # numpy oracle: reconstruct poles as in the reference then MSE
    o = np.asarray(out)
    h, w = ico.chart_shape(s)
    oc = o.reshape(o.shape[0], 5, h, w, 3)
    north = oc[:, :, 0, 0].mean(1)
    south = oc[:, :, h - 1, w - 1].mean(1)
    v = np.concatenate([o.reshape(o.shape[0], -1, 3), north[:, None], south[:, None]], 1)
    expected = np.mean((v - np.asarray(tgt)[..., :3]) ** 2)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)
    assert float(m["cos"]) == 0.0 and float(m["lap"]) == 0.0


def test_full_p2p_factors():
    s = 2
    out, tgt0 = _setup(s)
    # build a *consistent* target: normals/laplacian of a real mesh so the
    # cos term is well-conditioned
    coords = ico.get_vertex_coords(s).astype(np.float32)
    faces = ico.get_ico_faces(s)
    tn = mesh_math.vertex_normals_numpy(coords, faces)
    tl = mesh_math.laplacian_numpy(coords, faces)
    tgt = np.concatenate([coords, tn, tl], axis=1)[None].repeat(2, 0)
    factors = LossFactors(0.6, 0.2, 0.2, 0.0)
    loss, m = p2p_loss(out, jnp.asarray(tgt), s, factors)
    combo = 0.6 * float(m["mse"]) + 0.2 * float(m["cos"]) + 0.2 * float(m["lap"])
    np.testing.assert_allclose(float(loss), combo, rtol=1e-6)
    assert float(m["cos"]) > 0  # random output vs real normals

    # perfect prediction => near-zero loss
    grid_pred = jnp.asarray(coords[:-2].reshape(1, *ico.grid_shape(s), 3))
    # replace pole targets with the chart-corner averages the model can express
    loss2, m2 = p2p_loss(grid_pred, jnp.asarray(tgt[:1]), s, factors)
    assert float(m2["mse"]) < 1e-3  # poles differ slightly from corner average


def test_kld_mean_over_dims():
    rng = np.random.RandomState(0)
    mu = rng.randn(4, 3, 2, 5).astype(np.float32)
    logvar = rng.randn(4, 3, 2, 5).astype(np.float32)
    got = float(kld_loss(jnp.asarray(mu), jnp.asarray(logvar)))
    m = mu.reshape(4, -1)
    lv = logvar.reshape(4, -1)
    expected = np.mean(-0.5 * np.mean(1 + lv - m**2 - np.exp(lv), axis=1))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_kld_zero_for_standard_normal():
    mu = jnp.zeros((2, 10))
    logvar = jnp.zeros((2, 10))
    assert abs(float(kld_loss(mu, logvar))) < 1e-7


def test_kl_factor_schedule():
    # reference: factor *= 0.9 when (epoch+1) % 25 == 0, applied after epoch
    np.testing.assert_allclose(float(kl_factor_at_epoch(0)), 1.0)
    np.testing.assert_allclose(float(kl_factor_at_epoch(24)), 1.0)
    np.testing.assert_allclose(float(kl_factor_at_epoch(25)), 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(kl_factor_at_epoch(49)), 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(kl_factor_at_epoch(50)), 0.81, rtol=1e-6)


def test_p2pkld_composition():
    s = 2
    out, tgt = _setup(s)
    rng = np.random.RandomState(1)
    mu = jnp.asarray(rng.randn(2, 5, 4, 6).astype(np.float32))
    logvar = jnp.asarray(rng.randn(2, 5, 4, 6).astype(np.float32))
    factors = LossFactors.vae()
    kf = 0.81
    loss, m = p2pkld_loss(out, mu, logvar, tgt, s, factors, kf)
    np.testing.assert_allclose(
        float(loss), float(m["recon"]) + 1.0 * kf * float(m["kld"]), rtol=1e-6
    )


def test_loss_differentiable():
    s = 2
    out, tgt = _setup(s)

    def f(o):
        return p2p_loss(o, tgt, s, LossFactors.vae())[0]

    g = jax.grad(f)(out)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
