"""Phase-domain (parity-decomposed) form of the icosahedral grid and hex conv.

Why: TPU Mosaic cannot cheaply interleave/deinterleave the sublane (row)
dimension, which makes two things expensive in kernel form — the upsample's
4-phase interleave and stride-2's parity-split windows. Both disappear when
the grid is carried as its four parity *phase* tensors:

    phase (pr, pq) of a level-s grid U (chart shape H=2^s, W=2^(s+1)):
        phi[pr,pq][i, j] = U[2i + pr, 2j + pq],  shape (H/2, W/2)

(H/2, W/2) equals ``chart_shape(s-1)``.  Phase (1, 0) — odd rows, even
columns — is exactly the level-(s-1) grid (level-(s-1) parameter points map
to level-s parameters by doubling), which anchors the halo derivation below.

Key identities (all derived from ops/pad.py's ico_pad spec and the hex tap
set; verified cell-by-cell against ``padded_index_map`` in
tests/test_phase.py):

1. A stride-1 hex conv's output phase (pr', pq') reads input phase
   ((pr'+di)%2, (pq'+dj)%2) at phase-coordinate offset
   ((pr'+di)//2, (pq'+dj)//2) for each tap (di, dj). Row offsets are
   {-1, 0} into odd-row phases and {0, +1} into even-row phases (columns
   likewise), so each phase needs a 1-cell halo on exactly TWO sides:

       ee=(0,0): bottom + right      eq=(0,1): bottom + left
       oo=(1,0): top + right         oq=(1,1): top + left

2. The two halo corners that would require the excluded hex taps
   ((-1,-1) and (+1,+1)) are exactly the two cells ``ico_pad`` masks —
   the 7-tap stencil provably never reads an undefined phase-halo cell.

3. A stride-2 hex conv (s -> s-1) is output phase (1, 0) of the same
   table: its centers are padded cells P[2r'+2, 2q'+1] = U[2r'+1, 2q'],
   the odd-row/even-col positions. So one tap table serves both strides,
   and the stride-2 output is ALREADY in standard level-(s-1) layout — no
   parity reshapes anywhere.

4. Upsample s -> s+1 emits the four phases of the s+1 grid directly from
   the padded s tensor (ops/upsample.py's midpoint formulas), so
   upsample+conv fuses with no interleave; the s+1 poles equal the s poles
   (mean_c ee[c,0,0] = (pole + mean_c x[c,0,0])/2 = pole).

Halo sources (chart c; c+ / c- are charts c±1 mod 5; 'swap' transposes the
placed strip; h, w = phase shape):

    ee bottom:  j in [0..h-1] <- ee[c-, 0, h+j];  j in [h..w-1] <- eq[c-, j-h, w-1]
    ee right:   i in [0..h-1] <- oq[c+, h-1, h+i];        corner (h,w) masked
    eq left:    i in [0..h-1] <- ee[c-, 0, i]
    eq bottom:  j in [-1..h-1] <- eq[c-, 0, h+j];  j in [h..w-1] <- oq[c-, j-h, w-1]
    oo top:     j=0 <- north pole;  j in [1..h] <- oo[c+, j-1, 0];
                j in [h+1..w] <- oo[c+, h-1, j-h]
    oo right:   i in [0..h-2] <- oo[c+, h-1, h+1+i];  i = h-1 <- south pole
    oq top:     j=-1 masked;  j in [0..h-1] <- ee[c+, j, 0];
                j in [h..w-1] <- oq[c+, h-1, j-h]
    oq left:    i in [0..h-1] <- eq[c-, 0, i]

with north pole = mean_c ee[c,0,0] and south pole = mean_c oq[c,h-1,w-1]
under corner_mode='average' (zeros otherwise) — the same cells ico_pad
averages, expressed in phase coordinates.

This module is the XLA implementation (and the correctness reference for
the Pallas kernels in ops/pallas/phase_kernel.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops.conv import HEX_TAP_OFFSETS

__all__ = [
    "PHASE_NAMES",
    "phase_split",
    "phase_merge",
    "phase_pad",
    "phase_conv",
    "conv_im2col",
    "phase_upsample",
    "tap_table",
]

# phase index p = 2*pr + pq
PHASE_NAMES = ("ee", "eq", "oo", "oq")
_EE, _EQ, _OO, _OQ = 0, 1, 2, 3


def tap_table(out_phase: int):
    """For output phase p' and each hex tap t: (input phase p, row/col slice
    starts (rs, cs) into the (h+1, w+1) padded phase array).

    Padded-array index [a, b] holds phase coordinate (a - pr, b - pq), so a
    tap reading offset (oi, oj) of phase (pr, pq) starts at
    rs = oi + pr, cs = oj + pq — always 0 or 1.
    """
    pr_, pq_ = out_phase >> 1, out_phase & 1
    out = []
    for di, dj in HEX_TAP_OFFSETS:
        pr, pq = (pr_ + di) % 2, (pq_ + dj) % 2
        oi, oj = (pr_ + di) // 2, (pq_ + dj) // 2
        out.append((2 * pr + pq, oi + pr, oj + pq))
    return tuple(out)


def phase_split(x: jnp.ndarray):
    """(B, 5, H, W, C) level-s grid -> 4 phase tensors (B, 5, H/2, W/2, C)."""
    return tuple(
        x[:, :, p >> 1 :: 2, p & 1 :: 2, :] for p in range(4)
    )


def phase_merge(phases) -> jnp.ndarray:
    """Inverse of phase_split (the interleave; XLA-side only)."""
    ee, eq, oo, oq = phases
    B, n, h, w, C = ee.shape
    even_rows = jnp.stack([ee, eq], axis=4).reshape(B, n, h, 2 * w, C)
    odd_rows = jnp.stack([oo, oq], axis=4).reshape(B, n, h, 2 * w, C)
    return jnp.stack([even_rows, odd_rows], axis=3).reshape(B, n, 2 * h, 2 * w, C)


def _poles(phases, corner_mode: str):
    ee, eq, oo, oq = phases
    B, n, h, w, C = ee.shape
    if corner_mode == "average":
        pn = jnp.mean(ee[:, :, 0, 0, :], axis=1)
        ps = jnp.mean(oq[:, :, h - 1, w - 1, :], axis=1)
    else:
        pn = jnp.zeros((B, C), ee.dtype)
        ps = jnp.zeros((B, C), ee.dtype)
    pn = jnp.broadcast_to(pn[:, None, None, None, :], (B, n, 1, 1, C))
    ps = jnp.broadcast_to(ps[:, None, None, None, :], (B, n, 1, 1, C))
    return pn, ps


def phase_pad(phases, corner_mode: str = "average"):
    """Phase tensors (each (B, 5, h, w, C)) -> padded (B, 5, h+1, w+1, C).

    Array index [a, b] of padded phase (pr, pq) = phase coordinate
    (a - pr, b - pq): odd-row phases carry their halo at row 0 (top), even
    at row h (bottom); odd-col phases at col 0 (left), even at col w
    (right). Masked cells (never read by the 7 hex taps) hold zeros.
    """
    ee, eq, oo, oq = phases
    B, n, h, w, C = ee.shape
    if w != 2 * h:
        raise ValueError(f"phase tensors must be (B,5,h,2h,C), got {ee.shape}")

    def up(t):  # chart c+1 seen from chart c
        return jnp.roll(t, shift=-1, axis=1)

    def dn(t):  # chart c-1 seen from chart c
        return jnp.roll(t, shift=1, axis=1)

    swap = lambda t: jnp.swapaxes(t, 2, 3)
    pole_n, pole_s = _poles(phases, corner_mode)
    zc = jnp.zeros((B, n, 1, 1, C), ee.dtype)

    # ee: interior rows [0..h-1] cols [0..w-1]; bottom row h, right col w.
    ee_right = swap(up(oq)[:, :, h - 1 : h, h:w, :])          # (B,5,h,1,C)
    ee_bot = jnp.concatenate(
        [dn(ee)[:, :, 0:1, h:w, :], swap(dn(eq)[:, :, 0:h, w - 1 : w, :]), zc],
        axis=3,
    )                                                          # (B,5,1,w+1,C)
    ee_p = jnp.concatenate(
        [jnp.concatenate([ee, ee_right], axis=3), ee_bot], axis=2
    )

    # eq: left col at array col 0, bottom row at array row h.
    eq_left = swap(dn(ee)[:, :, 0:1, 0:h, :])                  # (B,5,h,1,C)
    eq_bot = jnp.concatenate(
        [dn(eq)[:, :, 0:1, h - 1 : w, :], swap(dn(oq)[:, :, 0:h, w - 1 : w, :])],
        axis=3,
    )                                                          # (B,5,1,w+1,C)
    eq_p = jnp.concatenate(
        [jnp.concatenate([eq_left, eq], axis=3), eq_bot], axis=2
    )

    # oo: top row at array row 0, right col at array col w.
    oo_top = jnp.concatenate(
        [pole_n, swap(up(oo)[:, :, 0:h, 0:1, :]), up(oo)[:, :, h - 1 : h, 1 : h + 1, :]],
        axis=3,
    )                                                          # (B,5,1,w+1,C)
    oo_right = jnp.concatenate(
        [swap(up(oo)[:, :, h - 1 : h, h + 1 : w, :]), pole_s], axis=2
    )                                                          # (B,5,h,1,C)
    oo_p = jnp.concatenate(
        [oo_top, jnp.concatenate([oo, oo_right], axis=3)], axis=2
    )

    # oq: top row at array row 0, left col at array col 0.
    oq_top = jnp.concatenate(
        [zc, swap(up(ee)[:, :, 0:h, 0:1, :]), up(oq)[:, :, h - 1 : h, 0:h, :]],
        axis=3,
    )                                                          # (B,5,1,w+1,C)
    oq_p = jnp.concatenate(
        [oq_top, jnp.concatenate([swap(dn(eq)[:, :, 0:1, 0:h, :]), oq], axis=3)],
        axis=2,
    )

    return ee_p, eq_p, oo_p, oq_p


def phase_conv(
    phases,
    taps: jnp.ndarray,
    bias: jnp.ndarray | None,
    corner_mode: str = "average",
    out_phases=(0, 1, 2, 3),
):
    """Hex conv in phase form (XLA reference path).

    Args:
      phases: 4 tensors (B, 5, h, w, C_in) — the phase decomposition of a
        level-s grid (h = 2^(s-1), w = 2^s).
      taps: (7, C_in, C_out).
      out_phases: which output phases to compute. (0,1,2,3) = the full
        stride-1 conv at level s (merge with `phase_merge`); (2,) = the
        stride-2 conv s -> s-1, already in standard layout.

    Returns: tuple of (B, 5, h, w, C_out), one per requested output phase.
    """
    padded = phase_pad(phases, corner_mode)
    h, w = phases[0].shape[2], phases[0].shape[3]
    outs = []
    for p_out in out_phases:
        acc = None
        for t, (p_in, rs, cs) in enumerate(tap_table(p_out)):
            sl = padded[p_in][:, :, rs : rs + h, cs : cs + w, :]
            term = jnp.einsum("bnhwc,cd->bnhwd", sl, taps[t])
            acc = term if acc is None else acc + term
        if bias is not None:
            acc = acc + bias.astype(acc.dtype)
        outs.append(acc)
    return tuple(outs)


def conv_im2col(phases, corner_mode: str = "average") -> jnp.ndarray:
    """Pre-gathered im2col operand of the stride-1 hex conv in phase form:
    4 phase tensors (B, 5, h, w, C) -> ONE (4, B, 5, h, w, 7·C) table whose
    out-phase-p lanes [t·C, (t+1)·C) hold tap t's input slice (the
    `tap_table` window into `phase_pad`).

    Built ONCE per dataset at table-preparation time for the encoder front
    (the input is data, so its halo never changes during training): the
    conv then degenerates to a single (rows, 7C) x (7C, C_out) matmul —
    fused_col_conv — and its weight gradient to one xcolᵀ·g matmul. The
    round-4 trace showed the general phase kernels spending ~1.2 ms/step
    rebuilding exactly this operand from 3-lane tensors in-kernel (VPU
    lane-shuffles at 3/128 utilization), twice (forward + dtaps).

    The conv itself is ``xcol[p] · concat_t(taps[t]) + bias`` — verified
    against `phase_conv`/`ico_conv_s2s` in tests/test_colconv.py. Phase p's
    center-tap lanes (t=3) are phase p itself, so the phase tensors are
    recoverable (the XLA-fallback route when the fused kernel is off).
    """
    padded = phase_pad(phases, corner_mode)
    h, w = phases[0].shape[2], phases[0].shape[3]
    cols = []
    for p in range(4):
        sls = [
            padded[p_in][:, :, rs : rs + h, cs : cs + w, :]
            for (p_in, rs, cs) in tap_table(p)
        ]
        cols.append(jnp.concatenate(sls, axis=-1))
    return jnp.stack(cols, axis=0)


def phase_upsample(x_padded: jnp.ndarray):
    """Padded level-s tensor P (B, 5, h+2, w+2, C) -> the four phases of the
    upsampled level-(s+1) grid, each (B, 5, h, w, C) (ops/upsample.py's
    midpoint formulas, without the interleave)."""
    B, n, hp, wp, C = x_padded.shape
    h, w = hp - 2, wp - 2
    P = x_padded
    half = jnp.asarray(0.5, P.dtype)
    oo = P[:, :, 1 : h + 1, 1 : w + 1, :]
    ee = (P[:, :, 0:h, 1 : w + 1, :] + P[:, :, 1 : h + 1, 1 : w + 1, :]) * half
    oq = (P[:, :, 1 : h + 1, 1 : w + 1, :] + P[:, :, 1 : h + 1, 2 : w + 2, :]) * half
    eq = (P[:, :, 1 : h + 1, 1 : w + 1, :] + P[:, :, 0:h, 2 : w + 2, :]) * half
    return ee, eq, oo, oq
