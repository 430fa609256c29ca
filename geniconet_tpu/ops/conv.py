"""Hexagonal icosahedral convolution (scalar-to-scalar) as an XLA conv.

``ico_conv_s2s`` applies a 7-tap hexagonal stencil over every grid vertex of
the 5-chart icosahedral tensor. After `ico_pad` materializes the cross-chart
halo, the stencil is exactly a VALID 3×3 convolution whose ``(-1,-1)`` and
``(+1,+1)`` corner taps are masked — XLA lowers this to an implicit-GEMM conv
that runs on the TPU MXU.

Stride-2 convs map subdivision ``s → s-1``. Derivation (geometry/ico.py):
the ``s-1`` grid's stored cell ``(r', q')`` is the ``s`` grid's parameter
point ``(2r'+2, 2q')``, i.e. padded cell ``P[2r'+2, 2q'+1]``. A VALID 3×3
stride-2 conv over ``P[1:, :]`` has output centers ``P[2r'+2, 2q'+1]`` —
so stride 2 is just a row-offset strided conv of the same padded tensor.

Behavioral contract of the reference's ``IcoConvS2S(in, out, stride, bias,
subdivisions, corner_mode)`` (usage: reference models.py:25-34, 104-126;
the implementation lives in the non-vendored ``icocnn`` sibling repo).

Weight layout: parameters are stored as the 7 *active* taps
``(7, C_in, C_out)`` in row-major stencil order
``[(-1,0), (-1,+1), (0,-1), (0,0), (0,+1), (+1,-1), (+1,0)]``
and scattered into the 3×3 kernel at trace time — no dead weights, and the
mapping is documented so checkpoints are portable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops.pad import ico_pad

__all__ = [
    "HEX_TAP_OFFSETS",
    "taps_to_kernel",
    "kernel_to_taps",
    "ico_conv_s2s",
    "ico_conv_s2s_padded",
    "split_charts",
    "merge_charts",
]

# Active stencil offsets (di, dj) in row-major 3x3 order, corners
# (-1,-1) and (+1,+1) excluded. Index = position in the (7, Cin, Cout) param.
HEX_TAP_OFFSETS: tuple[tuple[int, int], ...] = (
    (-1, 0),
    (-1, 1),
    (0, -1),
    (0, 0),
    (0, 1),
    (1, -1),
    (1, 0),
)

_TAP_ROWS = np.array([d[0] + 1 for d in HEX_TAP_OFFSETS])
_TAP_COLS = np.array([d[1] + 1 for d in HEX_TAP_OFFSETS])
_TAP_FLAT = _TAP_ROWS * 3 + _TAP_COLS  # positions in the flattened 3x3 kernel


def taps_to_kernel(taps: jnp.ndarray) -> jnp.ndarray:
    """(7, Cin, Cout) tap params -> (3, 3, Cin, Cout) HWIO kernel (zeros at corners)."""
    seven, cin, cout = taps.shape
    assert seven == 7, taps.shape
    full = jnp.zeros((9, cin, cout), taps.dtype)
    # unique_indices lets the scatter be linear-transposed (fused-conv bwd)
    full = full.at[jnp.asarray(_TAP_FLAT)].set(taps, unique_indices=True)
    return full.reshape(3, 3, cin, cout)


def kernel_to_taps(kernel: np.ndarray) -> np.ndarray:
    """(3, 3, Cin, Cout) -> (7, Cin, Cout): inverse of `taps_to_kernel`."""
    return kernel.reshape(9, *kernel.shape[2:])[_TAP_FLAT]


def split_charts(x: jnp.ndarray, subdivisions: int) -> jnp.ndarray:
    """Public grid (B, 5h, w, C) -> chart-split (B, 5, h, w, C)."""
    h, w = ico.chart_shape(subdivisions)
    B, H, W, C = x.shape
    if H != 5 * h or W != w:
        raise ValueError(f"expected (B,{5*h},{w},C), got {x.shape}")
    return x.reshape(B, 5, h, w, C)


def merge_charts(x: jnp.ndarray) -> jnp.ndarray:
    """Chart-split (B, 5, h, w, C) -> public grid (B, 5h, w, C)."""
    B, n, h, w, C = x.shape
    return x.reshape(B, n * h, w, C)


def ico_conv_s2s_padded(
    padded: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
) -> jnp.ndarray:
    """Apply the masked 3×3 conv to an already-padded (B, 5, h+2, w+2, C) tensor.

    Output dtype == input dtype. The TPU MXU accumulates bf16 operands in
    fp32 internally; asking XLA for an fp32 output via
    ``preferred_element_type`` would break the conv's transpose rule under
    AD (mixed-dtype cotangents), so per-conv rounding to the compute dtype
    is the standard mixed-precision contract here.
    """
    B, n, hp, wp, cin = padded.shape
    if stride == 2:
        padded = padded[:, :, 1:, :, :]
        hp -= 1
    elif stride != 1:
        raise ValueError(f"stride must be 1 or 2, got {stride}")
    flat = padded.reshape(B * n, hp, wp, cin)
    out = jax.lax.conv_general_dilated(
        flat,
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    _, ho, wo, cout = out.shape
    return out.reshape(B, n, ho, wo, cout)


def ico_conv_s2s(
    x: jnp.ndarray,
    taps: jnp.ndarray,
    bias: jnp.ndarray | None,
    subdivisions: int,
    stride: int = 1,
    corner_mode: str = "average",
) -> jnp.ndarray:
    """Hex conv over the chart-split grid tensor.

    Args:
      x: (B, 5, h, w, C_in) at subdivision `subdivisions`.
      taps: (7, C_in, C_out) hex tap weights (see HEX_TAP_OFFSETS).
      bias: optional (C_out,).
      stride: 1 (same subdivision) or 2 (s -> s-1).

    Returns:
      (B, 5, h', w', C_out) with h' = h/stride, w' = w/stride.
    """
    kernel = taps_to_kernel(taps)
    padded = ico_pad(x, subdivisions, corner_mode)
    out = ico_conv_s2s_padded(padded, kernel, stride)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
