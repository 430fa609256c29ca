"""Icosahedral upsampling s -> s+1 (bilinear on the subdivided mesh).

New vertices of the ``s+1`` grid are the edge midpoints of the ``s`` grid
(row edges, column edges, and the cell anti-diagonal ``(i+1,j)—(i,j+1)``);
old vertices carry their value through. Using the padded tensor ``P`` of the
``s`` grid (``P[a,b]`` = parameter point ``(a, b-1)``), the four parity
phases of the output's stored cells ``(R, Q)`` (parameter ``(R+1, Q)``) are::

    R odd,  Q even : old vertex            P[(R+1)/2, Q/2 + 1]           == x
    R even, Q even : row-edge midpoint     (P[R/2, Q/2+1] + P[R/2+1, Q/2+1]) / 2
    R odd,  Q odd  : col-edge midpoint     (P[(R+1)/2, (Q+1)/2] + P[(R+1)/2, (Q+1)/2+1]) / 2
    R even, Q odd  : anti-diag midpoint    (P[R/2+1, (Q+1)/2] + P[R/2, (Q+1)/2+1]) / 2

Behavioral contract of the reference's ``IcoUpsampleS2S(features,
subdivisions, corner_mode)`` (usage: reference models.py:13,45,53 — always
followed by an ``IcoConvS2S`` at ``subdivisions+1``). The reference
implementation is not vendored; bilinear midpoint interpolation is this
framework's documented choice (values on seams/poles come from the same halo
as the convolution, honoring ``corner_mode``).
"""

from __future__ import annotations

import jax.numpy as jnp

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops.pad import ico_pad

__all__ = ["ico_upsample_s2s"]


def ico_upsample_s2s(
    x: jnp.ndarray, subdivisions: int, corner_mode: str = "average"
) -> jnp.ndarray:
    """(B, 5, h, w, C) at subdivision s -> (B, 5, 2h, 2w, C) at s+1."""
    h, w = ico.chart_shape(subdivisions)
    B, n, xh, xw, C = x.shape
    if n != 5 or xh != h or xw != w:
        raise ValueError(f"expected (B,5,{h},{w},C), got {x.shape}")
    P = ico_pad(x, subdivisions, corner_mode)

    half = jnp.asarray(0.5, P.dtype)
    # phase (R odd, Q even): old vertices = x = P[1:h+1, 1:w+1]
    oo = P[:, :, 1 : h + 1, 1 : w + 1, :]
    # phase (R even, Q even): vertical-edge midpoints, i = R/2 in [0..h-1]
    ee = (P[:, :, 0:h, 1 : w + 1, :] + P[:, :, 1 : h + 1, 1 : w + 1, :]) * half
    # phase (R odd, Q odd): horizontal-edge midpoints
    oq = (P[:, :, 1 : h + 1, 1 : w + 1, :] + P[:, :, 1 : h + 1, 2 : w + 2, :]) * half
    # phase (R even, Q odd): anti-diagonal midpoints
    eq = (P[:, :, 1 : h + 1, 1 : w + 1, :] + P[:, :, 0:h, 2 : w + 2, :]) * half

    # interleave rows: even rows from (ee, eq), odd rows from (oo, oq)
    even_rows = jnp.stack([ee, eq], axis=4).reshape(B, 5, h, 2 * w, C)
    odd_rows = jnp.stack([oo, oq], axis=4).reshape(B, 5, h, 2 * w, C)
    out = jnp.stack([even_rows, odd_rows], axis=3).reshape(B, 5, 2 * h, 2 * w, C)
    return out
