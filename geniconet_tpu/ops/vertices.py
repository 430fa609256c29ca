"""Grid <-> vertex-list conversion (pole reconstruction).

``grid_to_vertices`` is the behavioral contract of reference
``ico_utils.output2vertices`` (ico_utils.py:10-24) and of the pole
reconstruction inside the loss (losses.py:22-31,48-51): flatten the
``(5·2^s, 2^(s+1))`` grid row-major (which is exactly the storage order of
geometry/ico.py), then append the north pole (mean of the 5 chart-local
``(0, 0)`` cells = grid rows ``c·2^s``, col 0) and the south pole (mean of
chart-local ``(2^s-1, 2^(s+1)-1)`` cells = rows ``(c+1)·2^s - 1``, last col).
"""

from __future__ import annotations

import jax.numpy as jnp

from geniconet_tpu.geometry import ico

__all__ = ["grid_to_vertices", "vertices_to_grid", "pack_target_phases"]


def grid_to_vertices(x: jnp.ndarray, subdivisions: int) -> jnp.ndarray:
    """(B, 5h, w, C) grid -> (B, V, C) vertex signal with poles appended."""
    h, w = ico.chart_shape(subdivisions)
    B, H, W, C = x.shape
    if H != 5 * h or W != w:
        raise ValueError(f"expected (B,{5*h},{w},C), got {x.shape}")
    flat = x.reshape(B, 5 * h * w, C)
    xc = x.reshape(B, 5, h, w, C)
    north = jnp.mean(xc[:, :, 0, 0, :], axis=1, keepdims=True)          # (B,1,C)
    south = jnp.mean(xc[:, :, h - 1, w - 1, :], axis=1, keepdims=True)  # (B,1,C)
    return jnp.concatenate([flat, north, south], axis=1)


def pack_target_phases(target: jnp.ndarray, subdivisions: int):
    """(B, V, >=3) vertex targets -> lane-packed position phases for the
    fused head+MSE kernel: ((B, 5, h/2, w/2, 12) with phase p's xyz at lanes
    [3p:3p+3], (B, 6) = [north xyz | south xyz] pole targets).

    The 12-lane pack exists because a (..., 3) tensor in TPU tiled layout
    pads lanes 42x — the kernel reads one 12-lane tensor instead of four
    3-lane ones. Phase order matches ops/phase.py (p = 2*pr + pq)."""
    h, w = ico.chart_shape(subdivisions)
    B = target.shape[0]
    pos = target[..., :3].astype(jnp.float32)
    grid = pos[:, :-2].reshape(B, 5, h, w, 3)
    tpack = jnp.concatenate(
        [grid[:, :, p >> 1 :: 2, p & 1 :: 2, :] for p in range(4)], axis=-1
    )
    tpoles = pos[:, -2:].reshape(B, 6)
    return tpack, tpoles


def vertices_to_grid(v: jnp.ndarray, subdivisions: int) -> jnp.ndarray:
    """(B, V, C) vertex signal -> (B, 5h, w, C) grid (poles dropped).

    Inverse of `grid_to_vertices` up to the synthesized poles; mirrors the
    reference's npz decode (reference data.py:66-69: take rows :-2, reshape).
    """
    h, w = ico.chart_shape(subdivisions)
    B, V, C = v.shape
    if V != ico.num_vertices(subdivisions):
        raise ValueError(f"expected V={ico.num_vertices(subdivisions)}, got {V}")
    return v[:, :-2, :].reshape(B, 5 * h, w, C)
