"""Cross-chart halo padding for the 5-chart icosahedral grid.

This op materializes, for every chart, a 1-cell halo pulled from the
neighboring charts (and synthesized pole values), so that the hexagonal
7-tap convolution becomes a plain VALID 3×3 convolution with two masked
corner taps. The reference obtains the same capability through the
non-vendored ``icocnn`` package (reference models.py:4-6); the derivation
below is original (see geometry/ico.py for the chart parameterization).

Index derivation (chart ``c``, ``h = 2^s``, ``w = 2^(s+1)``; padded array
``P[a, b]`` holds parameter point ``(a, b-1)``, so stored cell ``(r, q)``
sits at ``P[r+1, q+1]``):

* top row ``a=0`` (param row 0 = seam owned by chart ``c+1``):
  ``b=0`` masked; ``b=1`` north pole; ``b∈[2..h+1]`` ← ``x[c+1, 0:h, 0]``
  (edge n→u_{c+1}); ``b∈[h+2..w+1]`` ← ``x[c+1, h-1, 1:h+1]``
  (edge u_{c+1}→l_{c+1}).
* left col ``b=0`` (param col −1, inside chart ``c−1``):
  ``a∈[1..h]`` ← ``x[c-1, 0, 0:h]``. Derived by matching the two
  across-seam hex neighbors of each first-column cell: stored ``(r, 0)``
  equals chart ``c−1`` param ``(0, r+1)`` whose off-seam neighbors are
  chart ``c−1`` param ``(1, r)`` and ``(1, r+1)``, which the stencil reads
  at taps ``(0,−1)`` and ``(+1,−1)``.
* bottom row ``a=h+1`` (param row 2^s+1, inside chart ``c−1``):
  ``b∈[0..h]`` ← ``x[c-1, 0, h-1:w]`` (across edge u_c→l_c, which equals
  chart ``c−1`` param row 0, j∈[2^s..2^(s+1)]); ``b∈[h+1..w]`` ←
  ``x[c-1, 0:h, w-1]`` (across edge l_c→s, which equals chart ``c−1``'s
  last column); ``b=w+1`` masked.
* right col ``b=w+1`` (param col 2^(s+1) = seam owned by chart ``c+1``):
  ``a=0`` already covered by the top row (vertex l_{c+1});
  ``a∈[1..h-1]`` ← ``x[c+1, h-1, h+1:w]`` (edge l_{c+1}→s);
  ``a=h`` south pole; ``a=h+1`` masked.

The 12 base-icosahedron vertices have degree 5, so one of the 6 neighbor
taps at those cells duplicates another (it still reads a *true* mesh
neighbor); with uniform weights the conv therefore acts as ``A + I + D``
where ``D`` has one extra unit entry at the 10 non-pole base vertices.
The pole cells are synthesized per ``corner_mode``:

* ``'average'`` — mean of the 5 chart-local ``(0,0)`` cells (north) /
  ``(h-1, w-1)`` cells (south), matching the pole reconstruction used by the
  reference's loss and grid→vertex conversion (reference losses.py:22-31,
  ico_utils.py:10-24);
* ``'zeros'`` — zeros.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from geniconet_tpu.geometry import ico

__all__ = ["ico_pad", "padded_index_map", "HEX_MASK_3X3", "hex_mask"]

# 3x3 stencil mask for the hex kernel: corners (di,dj)=(-1,-1) and (+1,+1)
# are not hex neighbors under the anti-diagonal cell split.
HEX_MASK_3X3 = np.ones((3, 3), dtype=np.float32)
HEX_MASK_3X3[0, 0] = 0.0
HEX_MASK_3X3[2, 2] = 0.0


def hex_mask(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(HEX_MASK_3X3, dtype=dtype)


def ico_pad(x: jnp.ndarray, subdivisions: int, corner_mode: str = "average") -> jnp.ndarray:
    """Build the per-chart haloed tensor.

    Args:
      x: ``(B, 5, h, w, C)`` chart-split grid tensor (NHWC layout inside
        charts; channels last for TPU lane alignment).
      subdivisions: grid subdivision level ``s`` (h = 2^s, w = 2^(s+1)).
      corner_mode: ``'average'`` or ``'zeros'`` pole synthesis.

    Returns:
      ``(B, 5, h+2, w+2, C)`` padded tensor.
    """
    h, w = ico.chart_shape(subdivisions)
    B, n_charts, xh, xw, C = x.shape
    if n_charts != 5 or xh != h or xw != w:
        raise ValueError(f"expected (B,5,{h},{w},C) grid, got {x.shape}")
    if corner_mode not in ("average", "zeros"):
        raise ValueError(f"unknown corner_mode {corner_mode!r}")

    up = jnp.roll(x, shift=-1, axis=1)  # chart c+1 seen from chart c
    dn = jnp.roll(x, shift=1, axis=1)   # chart c-1 seen from chart c

    if corner_mode == "average":
        pole_n = jnp.mean(x[:, :, 0, 0, :], axis=1)        # (B, C)
        pole_s = jnp.mean(x[:, :, h - 1, w - 1, :], axis=1)
    else:
        pole_n = jnp.zeros((B, C), x.dtype)
        pole_s = jnp.zeros((B, C), x.dtype)
    pole_n = jnp.broadcast_to(pole_n[:, None, None, None, :], (B, 5, 1, 1, C))
    pole_s = jnp.broadcast_to(pole_s[:, None, None, None, :], (B, 5, 1, 1, C))
    zero = jnp.zeros((B, 5, 1, 1, C), x.dtype)

    # top row (B, 5, 1, w+2, C): [masked, pole_n, up col0 rows 0..h-1, up row h-1 cols 1..h]
    top = jnp.concatenate(
        [
            zero,
            pole_n,
            jnp.swapaxes(up[:, :, 0:h, 0:1, :], 2, 3),   # (B,5,1,h,C)
            up[:, :, h - 1 : h, 1 : h + 1, :],           # (B,5,1,h,C)
        ],
        axis=3,
    )

    # bottom row (B, 5, 1, w+2, C): [dn row0 cols h-1..w-1, dn col w-1 rows 0..h-1, masked]
    bottom = jnp.concatenate(
        [
            dn[:, :, 0:1, h - 1 : w, :],                  # (B,5,1,h+1,C)
            jnp.swapaxes(dn[:, :, 0:h, w - 1 : w, :], 2, 3),  # (B,5,1,h,C)
            zero,
        ],
        axis=3,
    )

    # left col (B, 5, h, 1, C): dn row 0, cols 0..h-1
    left = jnp.swapaxes(dn[:, :, 0:1, 0:h, :], 2, 3)

    # right col (B, 5, h, 1, C): [up row h-1 cols h+1..w-1 (h-1 cells), pole_s]
    right = jnp.concatenate(
        [jnp.swapaxes(up[:, :, h - 1 : h, h + 1 : w, :], 2, 3), pole_s], axis=2
    )

    mid = jnp.concatenate([left, x, right], axis=3)  # (B, 5, h, w+2, C)
    return jnp.concatenate([top, mid, bottom], axis=2)  # (B, 5, h+2, w+2, C)


# ---------------------------------------------------------------------------
# Test oracle: symbolic index map of the padded tensor.
# ---------------------------------------------------------------------------

MASKED = -1
NORTH_SYNTH = -2
SOUTH_SYNTH = -3


@functools.lru_cache(maxsize=None)
def padded_index_map(subdivisions: int) -> np.ndarray:
    """(5, h+2, w+2) int64 map: which global vertex id each padded cell holds.

    Special values: MASKED (-1) for never-read corners, NORTH_SYNTH (-2) /
    SOUTH_SYNTH (-3) for the corner_mode-synthesized pole cells. Mirrors
    ``ico_pad`` exactly; used by tests to check the halo against the
    face-derived mesh adjacency without duplicating the slicing logic.
    """
    h, w = ico.chart_shape(subdivisions)

    def vid(c, r, q):
        return c * h * w + r * w + q

    out = np.full((5, h + 2, w + 2), MASKED, dtype=np.int64)
    for c in range(5):
        cu, cd = (c + 1) % 5, (c - 1) % 5
        for r in range(h):
            for q in range(w):
                out[c, r + 1, q + 1] = vid(c, r, q)
        # top row
        out[c, 0, 1] = NORTH_SYNTH
        for k in range(h):
            out[c, 0, 2 + k] = vid(cu, k, 0)
        for k in range(h):
            out[c, 0, h + 2 + k] = vid(cu, h - 1, 1 + k)
        # bottom row
        for k in range(h + 1):
            out[c, h + 1, k] = vid(cd, 0, h - 1 + k)
        for k in range(h):
            out[c, h + 1, h + 1 + k] = vid(cd, k, w - 1)
        out[c, h + 1, w + 1] = MASKED
        # left col
        for k in range(h):
            out[c, 1 + k, 0] = vid(cd, 0, k)
        # right col
        for k in range(h - 1):
            out[c, 1 + k, w + 1] = vid(cu, h - 1, h + 1 + k)
        out[c, h, w + 1] = SOUTH_SYNTH
    return out
