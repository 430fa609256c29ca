"""Point2Point + KLD losses, fused for the jitted train step.

Numerical contract (reference losses.py):

* ``p2p_loss`` (losses.py:47-82): reconstruct the pole vertices from the
  network's grid output exactly as ``grid_to_vertices`` does, then
  ``f_pos·MSE(v, target_pos) + f_nor·mean(1 − cos(normals, target_nor))
  + f_lap·MSE(lap, target_lap)``, where normals and Laplacian are computed
  *on the predicted vertices each step* (losses.py:53-57) and targets come
  precomputed from the dataset's ``(V, 9)`` rows (pos | normal | laplacian).
* ``kld_loss`` (losses.py:105): ``mean_B(−0.5·mean_dims(1 + logvar − mu²
  − exp(logvar)))`` — **mean over latent dims, not sum** (the reference's
  documented deviation from the standard sum form).
* ``P2PKLD = P2P + factor_kl·KLD`` with ``factor_kl`` starting at 1.0 and
  decaying ×factor_gamma every factor_step_size epochs (reference
  run.py:439,491-493; losses.py:116-118) — here a pure function of the epoch
  so it stays jit-friendly.

Loss factors per model (reference run.py:689-696): AE pos/nor/lap = 1/0/0;
VAE 0.6/0.2/0.2. Terms with factor 0 are skipped at trace time, so the AE
step never builds the normals/Laplacian graph.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from geniconet_tpu.ops.mesh_math import laplacian, vertex_normals
from geniconet_tpu.ops.vertices import grid_to_vertices

__all__ = ["LossFactors", "p2p_loss", "kld_loss", "p2pkld_loss", "kl_factor_at_epoch"]


@dataclass(frozen=True)
class LossFactors:
    pos: float = 1.0
    nor: float = 0.0
    lap: float = 0.0
    kl: float = 0.0  # multiplied by the epoch schedule at call time

    @staticmethod
    def ae() -> "LossFactors":
        return LossFactors(1.0, 0.0, 0.0, 0.0)

    @staticmethod
    def vae() -> "LossFactors":
        return LossFactors(0.6, 0.2, 0.2, 1.0)


def _wmean(per_sample: jnp.ndarray, weights, denom=None):
    """Weighted mean over the batch axis (weights=None -> plain mean).

    ``denom`` overrides the normalizer — under shard_map data parallelism
    the caller passes the GLOBAL weight sum (psum over shards) so each
    shard contributes local_weighted_sum / global_count and a plain psum of
    per-shard losses/gradients reproduces the global-batch value exactly."""
    if denom is not None:
        w = 1.0 if weights is None else weights.astype(jnp.float32)
        return jnp.sum(per_sample * w) / denom
    if weights is None:
        return jnp.mean(per_sample)
    w = weights.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def p2p_loss(
    output_grid: jnp.ndarray,
    target: jnp.ndarray,
    subdivisions: int,
    factors: LossFactors,
    weights: jnp.ndarray | None = None,
    wsum=None,
    allow_grid: bool = True,
):
    """P2P loss on a grid prediction vs a (B, V, 9) target.

    Args:
      output_grid: (B, 5·2^s, 2^(s+1), 3) network output.
      target: (B, V, 9) = [pos | normals | laplacian] per vertex.
      weights: optional (B,) sample weights (0 marks DP tail padding);
        reductions are per-sample means then a weighted batch mean, which
        equals the reference's global mean when all weights are 1.

    Returns:
      (loss, metrics dict with 'mse', 'cos', 'lap' component values).
    """
    import os

    v = grid_to_vertices(output_grid.astype(jnp.float32), subdivisions)  # (B, V, 3)
    t = target.astype(jnp.float32)
    t_pos = t[..., 0:3]

    l_pos = _wmean(jnp.mean((v - t_pos) ** 2, axis=(1, 2)), weights, wsum)
    loss = factors.pos * l_pos
    metrics = {"mse": l_pos}

    # normals/Laplacian route: the grid-stencil forms (default) compute the
    # SAME values as the vertex-table forms via static halo slices instead
    # of XLA gathers/scatters, which execute element-serially on TPU — a
    # round-4 trace put ~40% of the VAE step in these fusions.
    # GENICONET_GRID_LOSS=0 restores the vertex-table route (the two are
    # pinned equal in tests/test_round4.py).
    # allow_grid=False: the VAE split-step decoder program measurably
    # crosses the tunneled backend's program-size crash threshold with the
    # grid-stencil forms inlined (artifacts/vae36_sweep.json: split_v2
    # crash vs split_v2_tableloss 1101 meshes/s) — that caller pins the
    # table route regardless of the env.
    grid_route = (
        allow_grid
        and (factors.nor != 0.0 or factors.lap != 0.0)
        and os.environ.get("GENICONET_GRID_LOSS", "1") == "1"
    )
    if grid_route:
        from geniconet_tpu.geometry import ico

        h, w = ico.chart_shape(subdivisions)
        B = output_grid.shape[0]
        V = ico.num_vertices(subdivisions)
        xc = output_grid.astype(jnp.float32).reshape(B, 5, h, w, 3)

    if factors.nor != 0.0:
        from geniconet_tpu.ops.mesh_math import safe_norm

        t_nor = t[..., 3:6]
        if grid_route:
            from geniconet_tpu.ops.mesh_math import vertex_normals_grid

            ng, npl = vertex_normals_grid(xc, subdivisions)
            tg = t_nor[:, : V - 2].reshape(B, 5, h, w, 3)
            tp = t_nor[:, V - 2 :]
            cos_g = jnp.sum(ng * tg, axis=-1) / (
                safe_norm(ng, keepdims=False) * safe_norm(tg, keepdims=False)
            )
            cos_p = jnp.sum(npl * tp, axis=-1) / (
                safe_norm(npl, keepdims=False) * safe_norm(tp, keepdims=False)
            )
            per_sample = (
                jnp.sum(1.0 - cos_g, axis=(1, 2, 3))
                + jnp.sum(1.0 - cos_p, axis=1)
            ) / V
            l_nor = _wmean(per_sample, weights, wsum)
        else:
            n = vertex_normals(v, subdivisions)
            # torch CosineSimilarity(dim=2) semantics (eps-clamped norms),
            # with NaN-free gradients at degenerate normals
            denom = safe_norm(n, keepdims=False) * safe_norm(t_nor, keepdims=False)
            cos = jnp.sum(n * t_nor, axis=-1) / denom
            l_nor = _wmean(jnp.mean(1.0 - cos, axis=1), weights, wsum)
        loss = loss + factors.nor * l_nor
        metrics["cos"] = l_nor
    else:
        metrics["cos"] = jnp.zeros(())

    if factors.lap != 0.0:
        t_lap = t[..., 6:9]
        if grid_route:
            from geniconet_tpu.ops.mesh_math import laplacian_grid

            lg, lpl = laplacian_grid(xc, subdivisions)
            tg = t_lap[:, : V - 2].reshape(B, 5, h, w, 3)
            tp = t_lap[:, V - 2 :]
            per_sample = (
                jnp.sum((lg - tg) ** 2, axis=(1, 2, 3, 4))
                + jnp.sum((lpl - tp) ** 2, axis=(1, 2))
            ) / (V * 3.0)
            l_lap = _wmean(per_sample, weights, wsum)
        else:
            lap = laplacian(v, subdivisions)
            l_lap = _wmean(jnp.mean((lap - t_lap) ** 2, axis=(1, 2)), weights, wsum)
        loss = loss + factors.lap * l_lap
        metrics["lap"] = l_lap
    else:
        metrics["lap"] = jnp.zeros(())

    return loss, metrics


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray, weights=None, wsum=None) -> jnp.ndarray:
    """mean_B(−0.5·mean_dims(1 + logvar − mu² − exp(logvar))) (losses.py:105)."""
    mu = mu.astype(jnp.float32).reshape(mu.shape[0], -1)
    logvar = logvar.astype(jnp.float32).reshape(logvar.shape[0], -1)
    per_sample = -0.5 * jnp.mean(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    return _wmean(per_sample, weights, wsum)


def kl_factor_at_epoch(
    epoch, initial: float = 1.0, step_size: int = 25, gamma: float = 0.9
):
    """KL factor schedule as a pure function of epoch.

    The reference multiplies the factor by ``gamma`` at the end of every
    epoch where ``(epoch+1) % step_size == 0`` (run.py:491-493 calling
    losses.py:116-118 with epoch+1), i.e. during epoch ``e`` the factor is
    ``initial * gamma^(e // step_size)``.
    """
    e = jnp.asarray(epoch, jnp.float32)
    return initial * gamma ** jnp.floor(e / step_size)


def p2pkld_loss(
    output_grid: jnp.ndarray,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    target: jnp.ndarray,
    subdivisions: int,
    factors: LossFactors,
    kl_factor,
    weights=None,
    wsum=None,
    allow_grid: bool = True,
):
    """P2P + kl_factor·KLD (reference losses.py:137-142)."""
    recon, metrics = p2p_loss(output_grid, target, subdivisions, factors,
                              weights, wsum, allow_grid=allow_grid)
    kld = kld_loss(mu, logvar, weights, wsum)
    loss = recon + factors.kl * kl_factor * kld
    metrics = dict(metrics)
    metrics["recon"] = recon
    metrics["kld"] = kld
    return loss, metrics
