"""Fused Pallas kernels for the phase-domain hex conv (ops/phase.py).

Three ops, each with fully-fused custom-VJP backward kernels:

* ``fused_dual_s2_conv``   — both stride-2 convs of a DownBlock in one
  kernel: 4 phase tensors in (XLA-side parity slices of x), two standard
  level-(s-1) tensors out. Retires the round-1 Mosaic pathology (the
  parity-split windows) by never parity-reshaping inside the kernel.
* ``fused_up_dual_conv``   — an UpBlock's upsample + both first convs in
  one kernel: standard level-s tensor in, 2×4 phase tensors of level s+1
  out. The 4×-sized upsampled tensor never exists in HBM, the halo pad is
  built once in VMEM, and both convs share the padded phases.
* ``fused_phase_conv_s1``  — stride-1 conv consuming/producing phase
  tensors (an UpBlock's second conv), so an UpBlock interleaves exactly
  once, at its output, in XLA.

All matmuls stack the output phases along the row (M) dimension, so each
tap is ONE MXU matmul regardless of how many output phases are computed.
Accumulation is fp32. The backward kernels mirror the structure:
``_phase_pad_transpose`` is the exact adjoint of the halo table in
ops/phase.py, and the upsample adjoint scatters the four phase cotangents
back into the padded level-s tensor before reusing the plain conv's
``_pad_transpose``.

Two fusion features close the BatchNorm boundary costs (the round-2 trace
showed ~2 ms/step of BN statistics converts + ~2.5 ms of BN-apply/ReLU
fusions + layout copies at every kernel/XLA seam):

* ``with_stats=True`` — the forward kernel additionally emits ``(2, C_out)``
  fp32 ``[sum, sumsq]`` of each tap set's (downcast) output, accumulated
  across the batch grid, so BatchNorm moments never re-read the activation
  from HBM. The VJP composes the stats cotangents in XLA:
  ``g_eff = g + gs[0] + 2·y·gs[1]``.
* ``act=(mul, add)`` — a per-channel affine + ReLU **prologue**
  (``x' = relu(x·mul + add)``, i.e. a BatchNorm apply) runs inside the
  kernel before the halo pad, so the activated tensor never exists in HBM.
  The dx kernel applies the exact adjoint in-kernel (``mask·mul`` gate) and
  accumulates ``d_mul/d_add`` across the grid.

Correctness: every op is tested against the XLA phase composition (values
and grads) in tests/test_phase_kernel.py, which itself is pinned to the
standard-grid ops in tests/test_phase.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geniconet_tpu.ops.pallas.conv_kernel import (
    _act_apply,
    _build_padded,
    _geff_one,
    _interpret,
    _pad_transpose,
)
from geniconet_tpu.ops.phase import tap_table


def _exp_env(name: str, default: str = "") -> str:
    """Env read for CLOSED experimental kernel families, quarantined behind
    the GENICONET_EXPERIMENTAL umbrella (round-5, VERDICT r4 #6).

    Every family routed through here was measured conclusively negative or
    crashing on hardware (artifacts/env_sweep.json: merged backwards and
    phase-chain INTERNAL-crash the tunneled v5e; K2/im2col-scratch crash;
    merged blocks 2092-2175 vs 2196 default; col-front 640; pallas-fold
    2149; stacked GEFF folds 2127). The code and interpret-mode tests are
    kept for attribution/re-probing on future toolchains, but the knobs are
    inert — returning the default — unless GENICONET_EXPERIMENTAL=1 is also
    set, so the shipping surface is the default path plus live knobs only."""
    import os

    if os.environ.get("GENICONET_EXPERIMENTAL", "0") != "1":
        return default
    return os.environ.get(name, default)

__all__ = [
    "fused_dual_s2_conv",
    "fused_up_dual_conv",
    "fused_phase_conv_s1",
    "fused_pair_head",
    "fused_pair_head_mse",
    "phase_vmem_ok",
]

_TABLE = tuple(tap_table(p) for p in range(4))
_ALL = (0, 1, 2, 3)
_VMEM_LIMIT = 100 * 1024 * 1024


def phase_vmem_ok(h: int, w: int, cin: int, cout: int, n_sets: int = 1) -> bool:
    """Whether one sample's phase-kernel working set fits scoped VMEM.

    Dominated by the dx backward: 4 padded fp32 accumulators, the per-tap
    contributions, and the pad-transpose temporaries — roughly 18 buffers
    of 5·h·w·C fp32 (mirroring conv_kernel.fused_vmem_ok's calibration).
    """
    c = max(cin, cout * n_sets)
    est = 18 * 5 * h * w * c * 4
    return est < 90 * 1024 * 1024


def _k_budget_mb() -> int:
    """Per-program VMEM budget for _choose_k (MB). Round-3 hardware data:
    a standalone k sweep at the decoder's widest pcs1 (36,5,16,32,64)
    favored k=3, but the WHOLE-MODEL bench regressed 2079 -> 2051 meshes/s
    with a 28MB budget (bigger blocks pipeline worse between kernels), so
    the default stays 10MB. GENICONET_K_BUDGET_MB overrides for hardware
    bisection; k>=6 at that shape fails Mosaic's 100MB scoped-VMEM check."""
    import os

    return int(os.environ.get("GENICONET_K_BUDGET_MB", "10"))


def _choose_k(B, per_sample_bytes, rows_per_sample):
    """Samples per grid program: target >=8k matmul rows, bounded by a
    VMEM budget and divisibility of B."""
    k_rows = max(1, 8192 // max(rows_per_sample, 1))
    k_mem = max(1, (_k_budget_mb() * 1024 * 1024) // max(per_sample_bytes, 1))
    k_cap = min(k_rows, k_mem, B)
    for k in range(k_cap, 0, -1):
        if B % k == 0:
            return k
    return 1


def _roll_chart(A, shift, k):
    """A[c] -> A[(c+shift) mod 5] within each sample's 5-chart group."""
    A5 = A.reshape(k, 5, *A.shape[1:])
    rolled = jnp.concatenate([A5[:, shift:], A5[:, :shift]], axis=1)
    return rolled.reshape(A.shape)


def _place(val, r0, c0, H, W):
    """Embed val (n, vh, vw, C) into a zero (n, H, W, C) at (r0, c0)."""
    vh, vw = val.shape[1], val.shape[2]
    return jnp.pad(val, ((0, 0), (r0, H - r0 - vh), (c0, W - c0 - vw), (0, 0)))


def _phase_pad_k(phases, k, h, w, corner_mode):
    """In-kernel phase halo pad: 4×(n, h, w, C) -> 4×(n, h+1, w+1, C).

    Mirrors ops/phase.py `phase_pad` exactly (see its halo-source table);
    chart rolls are per-sample-group concats, pole means are unrolled."""
    ee, eq, oo, oq = phases
    n, C = ee.shape[0], ee.shape[-1]
    dtype = ee.dtype
    up = lambda t: _roll_chart(t, 1, k)  # up(t)[c] = t[c+1]
    dn = lambda t: _roll_chart(t, 4, k)  # dn(t)[c] = t[c-1]
    swap = lambda t: jnp.swapaxes(t, 1, 2)

    if corner_mode == "average":
        fifth = jnp.asarray(0.2, jnp.float32)
        ee5 = ee.reshape(k, 5, h, w, C)
        oq5 = oq.reshape(k, 5, h, w, C)
        pn = sum(ee5[:, c, 0:1, 0:1, :].astype(jnp.float32) for c in range(5)) * fifth
        ps = sum(
            oq5[:, c, h - 1 : h, w - 1 : w, :].astype(jnp.float32) for c in range(5)
        ) * fifth
        pole_n = jnp.broadcast_to(pn[:, None].astype(dtype), (k, 5, 1, 1, C)).reshape(
            n, 1, 1, C
        )
        pole_s = jnp.broadcast_to(ps[:, None].astype(dtype), (k, 5, 1, 1, C)).reshape(
            n, 1, 1, C
        )
    else:
        pole_n = jnp.zeros((n, 1, 1, C), dtype)
        pole_s = jnp.zeros((n, 1, 1, C), dtype)
    zc = jnp.zeros((n, 1, 1, C), dtype)

    ee_right = swap(up(oq)[:, h - 1 : h, h:w, :])
    ee_bot = jnp.concatenate(
        [dn(ee)[:, 0:1, h:w, :], swap(dn(eq)[:, 0:h, w - 1 : w, :]), zc], axis=2
    )
    ee_p = jnp.concatenate(
        [jnp.concatenate([ee, ee_right], axis=2), ee_bot], axis=1
    )

    eq_left = swap(dn(ee)[:, 0:1, 0:h, :])
    eq_bot = jnp.concatenate(
        [dn(eq)[:, 0:1, h - 1 : w, :], swap(dn(oq)[:, 0:h, w - 1 : w, :])], axis=2
    )
    eq_p = jnp.concatenate(
        [jnp.concatenate([eq_left, eq], axis=2), eq_bot], axis=1
    )

    oo_top = jnp.concatenate(
        [pole_n, swap(up(oo)[:, 0:h, 0:1, :]), up(oo)[:, h - 1 : h, 1 : h + 1, :]],
        axis=2,
    )
    oo_right = jnp.concatenate(
        [swap(up(oo)[:, h - 1 : h, h + 1 : w, :]), pole_s], axis=1
    )
    oo_p = jnp.concatenate(
        [oo_top, jnp.concatenate([oo, oo_right], axis=2)], axis=1
    )

    oq_top = jnp.concatenate(
        [zc, swap(up(ee)[:, 0:h, 0:1, :]), up(oq)[:, h - 1 : h, 0:h, :]], axis=2
    )
    oq_p = jnp.concatenate(
        [oq_top, jnp.concatenate([swap(dn(eq)[:, 0:1, 0:h, :]), oq], axis=2)],
        axis=1,
    )
    return ee_p, eq_p, oo_p, oq_p


def _phase_pad_transpose(dpad, k, h, w, corner_mode):
    """Exact adjoint of `_phase_pad_k`: accumulate halo-cell cotangents of
    the 4 padded phases (n, h+1, w+1, C) back into (n, h, w, C) sources."""
    d_eep, d_eqp, d_oop, d_oqp = dpad
    n, C = d_eep.shape[0], d_eep.shape[-1]
    up_t = lambda t: _roll_chart(t, 4, k)  # adjoint of up
    dn_t = lambda t: _roll_chart(t, 1, k)  # adjoint of dn
    swap = lambda t: jnp.swapaxes(t, 1, 2)
    place = lambda v, r0, c0: _place(v, r0, c0, h, w)

    d_ee = d_eep[:, 0:h, 0:w, :]
    d_eq = d_eqp[:, 0:h, 1 : w + 1, :]
    d_oo = d_oop[:, 1 : h + 1, 0:w, :]
    d_oq = d_oqp[:, 1 : h + 1, 1 : w + 1, :]

    # ee halos: right col <- up(oq)[h-1, h:w]; bottom <- dn(ee)[0, h:w] ++ dn(eq)[:, w-1]
    d_oq += up_t(place(swap(d_eep[:, 0:h, w : w + 1, :]), h - 1, h))
    d_ee += dn_t(place(d_eep[:, h : h + 1, 0:h, :], 0, h))
    d_eq += dn_t(place(swap(d_eep[:, h : h + 1, h:w, :]), 0, w - 1))
    # eq halos: left col <- dn(ee)[0, 0:h]; bottom <- dn(eq)[0, h-1:w] ++ dn(oq)[:, w-1]
    d_ee += dn_t(place(swap(d_eqp[:, 0:h, 0:1, :]), 0, 0))
    d_eq += dn_t(place(d_eqp[:, h : h + 1, 0 : h + 1, :], 0, h - 1))
    d_oq += dn_t(place(swap(d_eqp[:, h : h + 1, h + 1 : w + 1, :]), 0, w - 1))
    # oo halos: top <- [pole_n, up(oo)[0:h, 0], up(oo)[h-1, 1:h+1]];
    #           right <- [up(oo)[h-1, h+1:w], pole_s]
    d_oo += up_t(place(swap(d_oop[:, 0:1, 1 : h + 1, :]), 0, 0))
    d_oo += up_t(place(d_oop[:, 0:1, h + 1 : w + 1, :], h - 1, 1))
    d_oo += up_t(place(swap(d_oop[:, 1:h, w : w + 1, :]), h - 1, h + 1))
    # oq halos: top <- [masked, up(ee)[0:h, 0], up(oq)[h-1, 0:h]]; left <- dn(eq)[0, 0:h]
    d_ee += up_t(place(swap(d_oqp[:, 0:1, 1 : h + 1, :]), 0, 0))
    d_oq += up_t(place(d_oqp[:, 0:1, h + 1 : w + 1, :], h - 1, 0))
    d_eq += dn_t(place(swap(d_oqp[:, 1 : h + 1, 0:1, :]), 0, 0))

    if corner_mode == "average":
        fifth = jnp.asarray(0.2, jnp.float32)
        d_oop5 = d_oop.reshape(k, 5, h + 1, w + 1, C)
        dpn = sum(d_oop5[:, c, 0:1, 0:1, :] for c in range(5)) * fifth
        dps = sum(d_oop5[:, c, h : h + 1, w : w + 1, :] for c in range(5)) * fifth
        dpn = jnp.broadcast_to(dpn[:, None], (k, 5, 1, 1, C)).reshape(n, 1, 1, C)
        dps = jnp.broadcast_to(dps[:, None], (k, 5, 1, 1, C)).reshape(n, 1, 1, C)
        d_ee += place(dpn, 0, 0)
        d_oq += place(dps, h - 1, w - 1)
    return d_ee, d_eq, d_oo, d_oq


def _upsample_phases(P, h, w):
    """Padded level-s tensor (n, h+2, w+2, C) -> the four level-(s+1)
    phases (n, h, w, C) (midpoint formulas from ops/upsample.py)."""
    half = jnp.asarray(0.5, P.dtype)
    oo = P[:, 1 : h + 1, 1 : w + 1, :]
    ee = (P[:, 0:h, 1 : w + 1, :] + oo) * half
    oq = (oo + P[:, 1 : h + 1, 2 : w + 2, :]) * half
    eq = (oo + P[:, 0:h, 2 : w + 2, :]) * half
    return ee, eq, oo, oq


def _upsample_transpose(dphases, h, w):
    """Adjoint of `_upsample_phases`: 4×(n, h, w, C) fp32 cotangents ->
    padded-tensor cotangent dP (n, h+2, w+2, C) fp32."""
    d_ee, d_eq, d_oo, d_oq = dphases
    half = jnp.asarray(0.5, jnp.float32)
    place = lambda v, r0, c0: _place(v, r0, c0, h + 2, w + 2)
    dP = place(d_oo + half * (d_ee + d_oq + d_eq), 1, 1)
    dP += place(half * d_ee, 0, 1)
    dP += place(half * d_oq, 1, 2)
    dP += place(half * d_eq, 0, 2)
    return dP


def _stats_partial(arrs):
    """[sum, sumsq] (2, C) fp32 over every position of the given (already
    downcast) arrays — the BatchNorm moment sufficient statistics."""
    axes0 = tuple(range(arrs[0].ndim - 1))
    s = sum(jnp.sum(a.astype(jnp.float32), axis=axes0) for a in arrs)
    ss = sum(jnp.sum(jnp.square(a.astype(jnp.float32)), axis=axes0) for a in arrs)
    return jnp.stack([s, ss])


def _cat_taps(w_refs):
    """Pack every set's taps along the lane (C_out) dimension, so a
    dual-conv kernel runs ONE matmul per tap with N = ΣC_out — at the
    decoder's widest block this turns two N=64 matmuls into one N=128,
    filling the MXU lanes."""
    if len(w_refs) == 1:
        return w_refs[0][...]
    return jnp.concatenate([w[...] for w in w_refs], axis=2)


def _im2col_cin(cin: int) -> bool:
    """Whether to pack the 7 taps along the contraction (K) dimension into
    one matmul instead of 7 accumulated ones. A K=cin matmul wastes the MXU
    when cin is tiny (the encoder input conv has cin=3), and the packed
    7·cin still fits one 128-lane tile — measured ~3x on the cin=3 layer.
    Large cin keeps the 7-matmul form (the lane concat costs more than the
    larger K saves, see conv_kernel.py's im2col note).
    GENICONET_IM2COL_MAX overrides the 7·cin threshold for hardware
    sweeps (e.g. 512 turns the C=64 decoder convs into K=448 matmuls)."""
    import os

    return 7 * cin <= int(os.environ.get("GENICONET_IM2COL_MAX", "128"))


def _k2_pack(cin: int) -> bool:
    """Pairwise K-packing for narrow-channel convs: two tap slices lane-
    concatenated into one K=2·cin matmul. At C=64 (the widest decoder
    block's conv01, 25% MXU at K=64/N=64) this doubles the contraction
    depth where the full 7-way im2col fails to compile (Mosaic concat
    error, round-3 negative). Off by default; GENICONET_K2_MAX=128
    enables it for cin <= 64. The pack bounces pair operands through a
    scoped VMEM scratch (_lane_pack2) — the earlier pad+add form tripped
    Mosaic layout back-propagation on hardware (see _lane_pack2);
    scripts/probe_k2_micro.py measures the K=128 ceiling standalone."""
    import os

    return 2 * cin <= int(_exp_env("GENICONET_K2_MAX", "0"))


def _lane_packN(parts):
    """Lane-concat of equal-width 2-D operands via a scoped VMEM scratch
    bounce. Mosaic rejects lane concats whose operands carry offset
    layouts (the halo-column slices feeding tap_stacked); the pad+add
    form compiled but back-propagated the packed operand's lane-offset
    layout through the tap slices into the shared halo-column concat
    ("result/input offset mismatch on non-concat dimension", round-4
    hardware), and optimization_barrier does not lower inside Pallas TPU
    kernels. Storing the slices into a scoped scratch ref pins an
    offset-0 layout on the packed operand — the relayout happens at the
    store, not in the producers (the _unpack_phases precedent)."""
    c = parts[0].shape[-1]

    def body(s_ref):
        for i, p in enumerate(parts):
            s_ref[:, i * c : (i + 1) * c] = p
        return s_ref[...]

    return pl.run_scoped(
        body,
        pltpu.VMEM((parts[0].shape[0], len(parts) * c), parts[0].dtype),
    )


def _lane_pack2(a, b):
    """[a | b] along lanes (see _lane_packN)."""
    return _lane_packN([a, b])


def _im2col_scratch(cin: int) -> bool:
    """Whether the 7-tap im2col stack should bounce through VMEM scratch
    (_lane_packN) instead of a plain lane concat. The plain concat is
    what ships at cin=3 (K=21, compiles fine); at cin=64 it is a Mosaic
    internal error (round-3 negative) — the scratch bounce is the same
    fix as _lane_pack2's, at 7·cin lanes of scratch instead of 2·cin.
    Off by default (GENICONET_IM2COL_SCRATCH=1 enables; pair with
    GENICONET_IM2COL_MAX=512 to route the C=64 sites here)."""
    import os

    return cin >= 8 and _exp_env("GENICONET_IM2COL_SCRATCH", "0") == "1"


def _contract(padded, w_refs, b_refs, out_phases, h, w, k, out_dtype):
    """Shared forward contraction: output phases stack along rows (M) and
    tap sets pack along lanes (N), so each tap is one MXU matmul. Returns
    a list (per set) of lists (per out phase) of (k, 5, h, w, cout)."""
    n = k * 5
    rows = n * h * w
    cin = padded[0].shape[-1]
    n_out = len(out_phases)
    couts = [w_ref.shape[-1] for w_ref in w_refs]
    w_cat = _cat_taps(w_refs)

    def tap_stacked(t):
        sls = [
            padded[_TABLE[p][t][0]][
                :, _TABLE[p][t][1] : _TABLE[p][t][1] + h,
                _TABLE[p][t][2] : _TABLE[p][t][2] + w, :
            ]
            for p in out_phases
        ]
        return jnp.concatenate(sls, axis=0).reshape(n_out * rows, cin)

    if _im2col_cin(cin):
        # K-packed form: one (rows, 7·cin) x (7·cin, ΣC_out) matmul.
        # (Sublane concat of tap slices — Mosaic cannot shape-cast the
        # (7, cin, cout) taps vector directly.)
        if _im2col_scratch(cin):
            stacked = _lane_packN([tap_stacked(t) for t in range(7)])
        else:
            stacked = jnp.concatenate([tap_stacked(t) for t in range(7)],
                                      axis=1)
        w2 = jnp.concatenate([w_cat[t] for t in range(7)], axis=0)
        acc = jnp.dot(stacked, w2, preferred_element_type=jnp.float32)
    elif _k2_pack(cin):
        # pairwise K-packing: 3 matmuls at K=2·cin + 1 at K=cin
        acc = jnp.zeros((n_out * rows, sum(couts)), jnp.float32)
        for t0 in range(0, 6, 2):
            a2 = _lane_pack2(tap_stacked(t0), tap_stacked(t0 + 1))
            w2 = jnp.concatenate([w_cat[t0], w_cat[t0 + 1]], axis=0)
            acc += jnp.dot(a2, w2, preferred_element_type=jnp.float32)
        acc += jnp.dot(tap_stacked(6), w_cat[6],
                       preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((n_out * rows, sum(couts)), jnp.float32)
        for t in range(7):
            acc += jnp.dot(tap_stacked(t), w_cat[t],
                           preferred_element_type=jnp.float32)
    results, off = [], 0
    for b_ref, cout in zip(b_refs, couts):
        a = acc[:, off : off + cout] + b_ref[0].astype(jnp.float32)
        off += cout
        results.append(
            [
                a[i * rows : (i + 1) * rows]
                .reshape(k, 5, h, w, cout)
                .astype(out_dtype)
                for i in range(n_out)
            ]
        )
    return results


def _dpad_accumulate(g_groups, w_refs, out_phases, h, w, k, cin):
    """Backward shared step: accumulate tap contributions of all sets into
    the 4 padded-phase cotangent buffers (n, h+1, w+1, cin) fp32."""
    n = k * 5
    rows = n * h * w
    n_out = len(out_phases)
    # matmul operands stay in the activation dtype — the MXU multiplies
    # bf16 natively and accumulates f32 via preferred_element_type; an
    # explicit f32 upcast here forced multi-pass fp32 matmuls (round-3
    # trace: backward kernels at ~40% of the bf16 roofline)
    g_stacks = []
    for g_refs in g_groups:
        cout = g_refs[0].shape[-1]
        g_stacks.append(
            jnp.concatenate([g[...] for g in g_refs], axis=0)
            .reshape(n_out * rows, cout)
        )
    # pack sets along the contraction dim: Σ_sets g_s·W_sᵀ == g_cat·w_catᵀ
    g_cat = g_stacks[0] if len(g_stacks) == 1 else jnp.concatenate(g_stacks, axis=1)
    w_cat = _cat_taps(w_refs)
    dpad = [jnp.zeros((n, h + 1, w + 1, cin), jnp.float32) for _ in range(4)]
    if _im2col_cin(cin):
        # one (rows, ΣC_out) x (ΣC_out, 7·cin) matmul, then 7 lane slices
        w2 = jnp.concatenate([w_cat[t] for t in range(7)], axis=0)
        contrib7 = jax.lax.dot_general(
            g_cat, w2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        per_tap = [contrib7[:, t * cin : (t + 1) * cin] for t in range(7)]
    else:
        per_tap = None
    if per_tap is None and _k2_pack(cin):
        # pairwise N-packing: one (rows, ΣC_out) x (ΣC_out, 2·cin) matmul
        # per tap pair, lane-split after
        per_tap = []
        for t0 in range(0, 6, 2):
            w2 = jnp.concatenate([w_cat[t0], w_cat[t0 + 1]], axis=0)
            c2 = jax.lax.dot_general(
                g_cat, w2,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            per_tap += [c2[:, :cin], c2[:, cin : 2 * cin]]
        per_tap.append(jax.lax.dot_general(
            g_cat, w_cat[6],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    for t in range(7):
        contrib = per_tap[t] if per_tap is not None else jax.lax.dot_general(
            g_cat, w_cat[t],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for i, p in enumerate(out_phases):
            p_in, rs, cs = _TABLE[p][t]
            c_p = contrib[i * rows : (i + 1) * rows].reshape(n, h, w, cin)
            dpad[p_in] += _place(c_p, rs, cs, h + 1, w + 1)
    return dpad


def _dtaps_accumulate(padded, g_groups, o_refs, out_phases, h, w, k, is_first):
    """Backward shared step: per-set dL/dtaps[t] += stacked_sliceᵀ · g."""
    n = k * 5
    rows = n * h * w
    cin = padded[0].shape[-1]
    n_out = len(out_phases)
    for o_ref in o_refs:
        @pl.when(is_first)
        def _(o_ref=o_ref):
            o_ref[...] = jnp.zeros_like(o_ref)

    # operands stay in the activation dtype (f32 accumulation comes from
    # preferred_element_type — see _dpad_accumulate)
    g_stacks = [
        jnp.concatenate([g[...] for g in g_refs], axis=0)
        .reshape(n_out * rows, g_refs[0].shape[-1])
        for g_refs in g_groups
    ]
    # pack sets along lanes: one (cin, Σcout) matmul per tap, split after
    g_cat = g_stacks[0] if len(g_stacks) == 1 else jnp.concatenate(g_stacks, axis=1)
    couts = [g[0].shape[-1] for g in g_groups]

    def tap_stacked(t):
        sls = [
            padded[_TABLE[p][t][0]][
                :, _TABLE[p][t][1] : _TABLE[p][t][1] + h,
                _TABLE[p][t][2] : _TABLE[p][t][2] + w, :
            ]
            for p in out_phases
        ]
        return jnp.concatenate(sls, axis=0).reshape(n_out * rows, cin)

    if _im2col_cin(cin):
        # one (7·cin, rows) x (rows, Σcout) matmul covering all taps
        stacked7 = (_lane_packN([tap_stacked(t) for t in range(7)])
                    if _im2col_scratch(cin) else
                    jnp.concatenate([tap_stacked(t) for t in range(7)],
                                    axis=1))
        dt_all = jax.lax.dot_general(
            stacked7, g_cat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for t in range(7):
            dt_cat = dt_all[t * cin : (t + 1) * cin]
            off = 0
            for o_ref, cout in zip(o_refs, couts):
                o_ref[t] += dt_cat[:, off : off + cout]
                off += cout
        return
    if _k2_pack(cin):
        # pairwise M-packing: (rows, 2·cin)ᵀ x (rows, Σcout) per tap pair,
        # sublane-split after
        def put(t, dt_cat):
            off = 0
            for o_ref, cout in zip(o_refs, couts):
                o_ref[t] += dt_cat[:, off : off + cout]
                off += cout

        for t0 in range(0, 6, 2):
            s2 = _lane_pack2(tap_stacked(t0), tap_stacked(t0 + 1))
            dt2 = jax.lax.dot_general(
                s2, g_cat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            put(t0, dt2[:cin])
            put(t0 + 1, dt2[cin : 2 * cin])
        put(6, jax.lax.dot_general(
            tap_stacked(6), g_cat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        return
    for t in range(7):
        dt_cat = jax.lax.dot_general(
            tap_stacked(t), g_cat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        off = 0
        for o_ref, cout in zip(o_refs, couts):
            o_ref[t] += dt_cat[:, off : off + cout]
            off += cout


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _unpack_phases(refs, packed, h, w, k):
    """Input parse shared by the phase fwd/dtaps kernels: 4 phase refs, or
    ONE lane-packed (k, 5, h, w, 4·cin) ref sliced into 4 phases. Each
    packed phase is lane-ROLLED to offset 0 before the [0:cin] slice — a
    direct slice at lane offset i·cin carries a nonzero-offset layout that
    Mosaic's downstream halo concat rejects ('result/input offset mismatch
    on non-concat dimension')."""
    if packed:
        cin4 = refs[0].shape[-1]
        cin = cin4 // 4
        xp = refs[0][...].reshape(k * 5, h, w, cin4)
        dtype = xp.dtype
        # Lane-extraction dance: a direct [i*cin:(i+1)*cin] slice carries a
        # lane-offset layout that the downstream halo concat rejects, and
        # Mosaic folds a roll+[0:cin] back into the same offset slice — so
        # rotate in f32 (the lane rotate is 32-bit only) and bounce each
        # phase through a VMEM scratch ref, which pins an offset-0 layout.
        scratch = refs[-3:]
        xp32 = xp.astype(jnp.float32)
        out = [xp[..., :cin]]
        for i in range(1, 4):
            scratch[i - 1][...] = (
                pltpu.roll(xp32, cin4 - i * cin, axis=3)[..., :cin]
                .astype(dtype))
            out.append(scratch[i - 1][...])
        return tuple(out), 1
    cin = refs[0].shape[-1]
    return tuple(r[...].reshape(k * 5, h, w, cin) for r in refs[:4]), 4


def _pc_fwd_kernel(*refs, h, w, k, corner_mode, out_phases, n_sets, out_dtype,
                   has_act, with_stats, packed=False):
    """Phase-input conv forward: refs = 4 phases (or ONE lane-packed
    (…, 4·cin) array when packed — a 3-channel phase stored separately
    wastes 125/128 lanes in every HBM/VMEM transfer; the encoder front
    packs its 4 input phases into 12 lanes and slices here), [act mul,
    add], n_sets×(taps, bias), then n_sets×len(out_phases) outputs and
    [n_sets (2, C_out) stats accumulators]."""
    phases, idx = _unpack_phases(refs, packed, h, w, k)
    if has_act:
        mul, add = refs[idx][0], refs[idx + 1][0]
        phases = tuple(_act_apply(p, mul, add) for p in phases)
        idx += 2
    w_refs = [refs[idx + 2 * i] for i in range(n_sets)]
    b_refs = [refs[idx + 1 + 2 * i] for i in range(n_sets)]
    outs = refs[idx + 2 * n_sets : idx + 2 * n_sets + n_sets * len(out_phases)]
    a = idx + 2 * n_sets + n_sets * len(out_phases)
    stat_outs = refs[a : a + n_sets]  # bounded: packed-mode scratch follows
    padded = _phase_pad_k(phases, k, h, w, corner_mode)
    results = _contract(padded, w_refs, b_refs, out_phases, h, w, k, out_dtype)
    i = 0
    for si, per_set in enumerate(results):
        for arr in per_set:
            outs[i][...] = arr
            i += 1
        if with_stats:
            part = _stats_partial(per_set)

            @pl.when(pl.program_id(0) == 0)
            def _(si=si):
                stat_outs[si][...] = jnp.zeros_like(stat_outs[si])

            stat_outs[si][...] += part


def _pc_dx_kernel(*refs, h, w, k, corner_mode, out_phases, n_sets, out_dtype,
                  has_act, with_stats):
    """Phase-input conv dx: refs = n_sets groups of len(out_phases) g refs,
    [n_sets groups of y refs, n_sets gs(2,C) refs], n_sets taps, [4 raw
    phases, act mul, add], then 4 dphase outputs, [n_sets gsum (1, C_out)
    accumulators], and [d_mul, d_add (1, C_in) accumulators].

    With with_stats, the raw upstream cotangents g are folded with the
    BatchNorm stats cotangents IN-KERNEL (`_geff_fold`) and the per-set
    Σg_eff bias gradient is emitted as an accumulator — removing the
    XLA-side `_stats_geff` pass + bias-grad reduction (round-3 trace:
    ~1.5 ms/step across the model). With act, the returned dphases are
    w.r.t. the RAW input: dL/dx = dL/dx' · mul · 1{x·mul+add > 0}."""
    n_out = len(out_phases)
    g_refs_flat = refs[: n_sets * n_out]
    idx = n_sets * n_out
    if with_stats:
        y_refs_flat = refs[idx : idx + n_sets * n_out]
        gs_refs = refs[idx + n_sets * n_out : idx + n_sets * n_out + n_sets]
        idx += n_sets * n_out + n_sets
    w_refs = refs[idx : idx + n_sets]
    idx += n_sets
    cin = w_refs[0].shape[1]
    if has_act:
        raw = tuple(r[...].reshape(k * 5, h, w, cin) for r in refs[idx : idx + 4])
        mul, add = refs[idx + 4][0], refs[idx + 5][0]
        idx += 6
    outs = refs[idx : idx + 4]
    idx += 4
    first = pl.program_id(0) == 0
    g_groups = []
    for si in range(n_sets):
        g_set = g_refs_flat[si * n_out : (si + 1) * n_out]
        if with_stats:
            g_set = _geff_fold(
                g_set, y_refs_flat[si * n_out : (si + 1) * n_out],
                gs_refs[si], out_dtype,
            )
        g_groups.append(g_set)
    if with_stats:
        gsum_refs = refs[idx : idx + n_sets]
        idx += n_sets
        for si, g_set in enumerate(g_groups):
            part = sum(
                jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3))
                for g in g_set
            ).reshape(1, -1)

            @pl.when(first)
            def _(si=si):
                gsum_refs[si][...] = jnp.zeros_like(gsum_refs[si])

            gsum_refs[si][...] += part
    dpad = _dpad_accumulate(g_groups, w_refs, out_phases, h, w, k, cin)
    dphases = _phase_pad_transpose(dpad, k, h, w, corner_mode)  # = dL/dx' fp32
    if not has_act:
        for o_ref, d in zip(outs, dphases):
            o_ref[...] = d.reshape(k, 5, h, w, cin).astype(out_dtype)
        return
    dmul_ref, dadd_ref = refs[idx], refs[idx + 1]

    @pl.when(first)
    def _():
        dmul_ref[...] = jnp.zeros_like(dmul_ref)
        dadd_ref[...] = jnp.zeros_like(dadd_ref)

    dmul_part = jnp.zeros((cin,), jnp.float32)
    dadd_part = jnp.zeros((cin,), jnp.float32)
    for o_ref, d, x in zip(outs, dphases, raw):
        x32 = x.astype(jnp.float32)
        mask = (x32 * mul + add > 0.0).astype(jnp.float32)
        dm = d * mask
        o_ref[...] = (dm * mul).reshape(k, 5, h, w, cin).astype(out_dtype)
        dmul_part += jnp.sum(dm * x32, axis=(0, 1, 2))
        dadd_part += jnp.sum(dm, axis=(0, 1, 2))
    dmul_ref[...] += dmul_part.reshape(1, cin)
    dadd_ref[...] += dadd_part.reshape(1, cin)


def _pc_dtaps_kernel(*refs, h, w, k, corner_mode, out_phases, n_sets, has_act,
                     with_stats=False, emit_gsum=False, packed=False):
    """Phase-input conv dtaps: refs = 4 phases, [act mul, add], n_sets groups
    of g refs, [n_sets groups of y refs + n_sets gs refs], then n_sets
    (7, cin, cout) accumulator outputs [+ n_sets (1, cout) gsum accumulators
    when emit_gsum — the bias grad for convs that skip the dx kernel]."""
    n_out = len(out_phases)
    phases, idx = _unpack_phases(refs, packed, h, w, k)
    cin = phases[0].shape[-1]
    if has_act:
        mul, add = refs[idx][0], refs[idx + 1][0]
        phases = tuple(_act_apply(p, mul, add) for p in phases)
        idx += 2
    g_groups = [
        refs[idx + i * n_out : idx + (i + 1) * n_out] for i in range(n_sets)
    ]
    idx += n_sets * n_out
    first = pl.program_id(0) == 0
    if with_stats:
        y_refs_flat = refs[idx : idx + n_sets * n_out]
        gs_refs = refs[idx + n_sets * n_out : idx + n_sets * n_out + n_sets]
        idx += n_sets * n_out + n_sets
        g_groups = [
            _geff_fold(
                g_set, y_refs_flat[si * n_out : (si + 1) * n_out],
                gs_refs[si], g_set[0].dtype,
            )
            for si, g_set in enumerate(g_groups)
        ]
    outs = refs[idx : idx + n_sets]
    if emit_gsum:
        gsum_refs = refs[idx + n_sets : idx + 2 * n_sets]
        for si, g_set in enumerate(g_groups):
            part = sum(
                jnp.sum(g[...].astype(jnp.float32), axis=(0, 1, 2, 3))
                for g in g_set
            ).reshape(1, -1)

            @pl.when(first)
            def _(si=si):
                gsum_refs[si][...] = jnp.zeros_like(gsum_refs[si])

            gsum_refs[si][...] += part
    padded = _phase_pad_k(phases, k, h, w, corner_mode)
    _dtaps_accumulate(padded, g_groups, outs, out_phases, h, w, k, first)


def _geff_fold(g_refs, y_refs, gs_ref, dtype):
    """In-VMEM stats-cotangent fold over a phase group (`_geff_one` per
    phase; bit-matching the XLA-side fold in `_stats_geff`)."""
    if gs_ref is None:
        return [g[...] for g in g_refs]
    gs0 = gs_ref[0].astype(jnp.float32)
    gs1 = gs_ref[1].astype(jnp.float32)
    return [
        _geff_one(g[...], y[...], gs0, gs1, dtype)
        for g, y in zip(g_refs, y_refs)
    ]


def _pc_bwd_kernel(*refs, h, w, k, corner_mode, out_phases, n_sets, out_dtype,
                   has_act, with_stats):
    """Merged phase-conv backward: ONE kernel computes dphases (dx), dtaps,
    per-set Σg_eff (for dbias), and d_mul/d_add — sharing the g read, the
    stats-cotangent fold, and the padded-phase construction that the
    separate dx/dtaps kernels each paid for.

    refs (inputs): 4 raw phases, [mul, add], n_sets×n_out g, [n_sets×n_out
    y, n_sets gs(2,C)], n_sets taps;
    (outputs): 4 dphases, n_sets dtaps (7,cin,cout), n_sets gsum (1,cout),
    [dmul (1,cin), dadd (1,cin)]."""
    n_out = len(out_phases)
    cin = refs[0].shape[-1]
    raw = tuple(r[...].reshape(k * 5, h, w, cin) for r in refs[:4])
    idx = 4
    if has_act:
        mul, add = refs[4][0], refs[5][0]
        idx = 6
    g_refs_flat = refs[idx : idx + n_sets * n_out]
    idx += n_sets * n_out
    if with_stats:
        y_refs_flat = refs[idx : idx + n_sets * n_out]
        gs_refs = refs[idx + n_sets * n_out : idx + n_sets * n_out + n_sets]
        idx += n_sets * n_out + n_sets
    w_refs = refs[idx : idx + n_sets]
    idx += n_sets
    outs = refs[idx : idx + 4]
    dt_refs = refs[idx + 4 : idx + 4 + n_sets]
    gsum_refs = refs[idx + 4 + n_sets : idx + 4 + 2 * n_sets]
    first = pl.program_id(0) == 0

    # fold stats cotangents once; reshape to the kernel-internal layout
    g_groups = []
    for si in range(n_sets):
        g_set = g_refs_flat[si * n_out : (si + 1) * n_out]
        if with_stats:
            g_set = _geff_fold(
                g_set, y_refs_flat[si * n_out : (si + 1) * n_out],
                gs_refs[si], out_dtype,
            )
        else:
            g_set = [g[...] for g in g_set]
        g_set = [g.reshape(k * 5, h, w, g.shape[-1]) for g in g_set]
        g_groups.append(g_set)

    # per-set Σ g_eff for the bias gradient
    for si, g_set in enumerate(g_groups):
        part = sum(
            jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)) for g in g_set
        ).reshape(1, -1)

        @pl.when(first)
        def _(si=si):
            gsum_refs[si][...] = jnp.zeros_like(gsum_refs[si])

        gsum_refs[si][...] += part

    # dx path
    dpad = _dpad_accumulate(g_groups, w_refs, out_phases, h, w, k, cin)
    dphases = _phase_pad_transpose(dpad, k, h, w, corner_mode)
    if has_act:
        dmul_ref, dadd_ref = refs[idx + 4 + 2 * n_sets], refs[idx + 5 + 2 * n_sets]

        @pl.when(first)
        def _():
            dmul_ref[...] = jnp.zeros_like(dmul_ref)
            dadd_ref[...] = jnp.zeros_like(dadd_ref)

        dmul_part = jnp.zeros((cin,), jnp.float32)
        dadd_part = jnp.zeros((cin,), jnp.float32)
        acted = []
        for o_ref, d, x in zip(outs, dphases, raw):
            x32 = x.astype(jnp.float32)
            pre = x32 * mul + add
            mask = (pre > 0.0).astype(jnp.float32)
            dm = d * mask
            o_ref[...] = (dm * mul).reshape(k, 5, h, w, cin).astype(out_dtype)
            dmul_part += jnp.sum(dm * x32, axis=(0, 1, 2))
            dadd_part += jnp.sum(dm, axis=(0, 1, 2))
            acted.append(jnp.maximum(pre, 0.0).astype(out_dtype))
        dmul_ref[...] += dmul_part.reshape(1, cin)
        dadd_ref[...] += dadd_part.reshape(1, cin)
        phases_act = tuple(acted)
    else:
        for o_ref, d in zip(outs, dphases):
            o_ref[...] = d.reshape(k, 5, h, w, cin).astype(out_dtype)
        phases_act = raw

    # dtaps path shares the (activated) padded phases
    padded = _phase_pad_k(phases_act, k, h, w, corner_mode)
    _dtaps_accumulate(padded, g_groups, dt_refs, out_phases, h, w, k, first)


def _phase_conv_bwd(raw_phases, g_groups, y_groups, gs_list, tap_sets,
                    corner_mode, out_phases, act, with_stats, out_dtype):
    """pallas_call plumbing for `_pc_bwd_kernel`. Returns
    (dphases, dtaps per set, gsum per set, dmul, dadd)."""
    B = raw_phases[0].shape[0]
    h, w = raw_phases[0].shape[2], raw_phases[0].shape[3]
    cin = raw_phases[0].shape[-1]
    n_sets = len(tap_sets)
    n_out = len(out_phases)
    couts = [t.shape[-1] for t, _ in tap_sets]
    per_sample = 5 * h * w * (14 * cin + 6 * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    kernel = functools.partial(
        _pc_bwd_kernel, h=h, w=w, k=k, corner_mode=corner_mode,
        out_phases=out_phases, n_sets=n_sets, out_dtype=out_dtype,
        has_act=act is not None, with_stats=with_stats,
    )
    in_specs = [_block((k, 5, h, w, cin))] * 4
    args = list(raw_phases)
    if act is not None:
        in_specs += [_block((1, cin))] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    for g_group, cout in zip(g_groups, couts):
        in_specs += [_block((k, 5, h, w, cout))] * n_out
        args += list(g_group)
    if with_stats:
        for y_group, cout in zip(y_groups, couts):
            in_specs += [_block((k, 5, h, w, cout))] * n_out
            args += list(y_group)
        for gs, cout in zip(gs_list, couts):
            in_specs.append(_acc_spec((2, cout)))
            args.append(gs)
    for taps, _ in tap_sets:
        in_specs.append(_full())
        args.append(taps)
    out_shape = [jax.ShapeDtypeStruct((B, 5, h, w, cin), out_dtype)] * 4
    out_specs = [_block((k, 5, h, w, cin))] * 4
    for cout in couts:
        out_shape.append(jax.ShapeDtypeStruct((7, cin, cout), jnp.float32))
        out_specs.append(_acc_spec((7, cin, cout)))
    for cout in couts:
        out_shape.append(jax.ShapeDtypeStruct((1, cout), jnp.float32))
        out_specs.append(_acc_spec((1, cout)))
    if act is not None:
        out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 2
        out_specs += [_acc_spec((1, cin))] * 2
    flops = 2 * B * 5 * h * w * n_out * 7 * cin * sum(couts) * 2
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * 4 * 4),
    )(*args)
    dphases = tuple(outs[:4])
    dtaps = list(outs[4 : 4 + n_sets])
    gsums = [o.reshape(-1) for o in outs[4 + n_sets : 4 + 2 * n_sets]]
    if act is not None:
        dmul = outs[4 + 2 * n_sets].reshape(cin)
        dadd = outs[5 + 2 * n_sets].reshape(cin)
    else:
        dmul = dadd = None
    return dphases, dtaps, gsums, dmul, dadd


def _kernel_geff_enabled(family: str = "", allow: bool = True) -> bool:
    """Route the BatchNorm stats-cotangent fold + Σg_eff bias-grad reduction
    through the (separate) dx/dtaps backward kernels instead of an XLA
    elementwise pass + reduction per conv (~1.5 ms/step across the model in
    the round-3 trace). Families: 'pcs1' (phase stride-1), 'ds2' (dual
    stride-2), 'upd' (upsample+dual), 'std' (standard-layout conv).

    GENICONET_KERNEL_GEFF: '0' (off), '1'/'all' (every family), or a comma
    list of families — for hardware bisection of backend crashes (the
    whole-model all-family fold program hit the same first-execution
    INTERNAL as the merged backward on the tunneled v5e; interpret-mode
    numerics are pinned by tests either way).

    ``allow=False`` marks a restricted pallas_blocks program (e.g. the
    VAE-bs36 crash workaround): one extra fused feature measurably pushes
    such a program back over the backend's crash threshold, so folds stay
    OFF there even under an explicit env value (advisor round-3 — the env
    used to silently re-enable them). Bisecting folds *inside* a restricted
    program is still possible with a leading '!' ('!all', '!pcs1_front'),
    which is an explicit opt-in to the crash risk."""
    import os

    # GEFF is the one quarantined knob whose DEFAULT is ON (the shipped
    # pcs1_front+upd folds), so the plain opt-OUT ('0') must stay live
    # without the umbrella — only non-default fold SETS are experimental
    # (round-5 review: _exp_env alone made '=0' silently inert)
    v = os.environ.get("GENICONET_KERNEL_GEFF", "")
    if v not in ("", "0"):
        v = _exp_env("GENICONET_KERNEL_GEFF", "")
    if v.startswith("!"):
        v = v[1:]
    elif not allow:
        return False
    if v == "":
        # built-in default, hardware-validated round 3 (AE bs36: 2081 ->
        # 2184 meshes/s, stable): fold at the encoder front and in the
        # UpBlock backwards.
        return family in ("pcs1_front", "upd")
    if v == "0":
        return False
    if v in ("1", "all"):
        return True
    return family in {f.strip() for f in v.split(",")}


def _merged_bwd_enabled(family: str = "") -> bool:
    """The merged backward kernels are interpret-verified but crashed the
    tunneled v5e on first hardware execution (INTERNAL at step 1); they stay
    opt-in via GENICONET_MERGED_BWD until root-caused on real Mosaic.

    Value: '0' (off, default), '1'/'all' (every family), or a comma list of
    kernel families to enable — 'pcs1' (phase stride-1), 'ds2' (dual
    stride-2), 'upd' (upsample+dual), 'std' (standard-layout conv) — for
    hardware bisection (scripts/probe_merged_bwd.py)."""
    import os

    v = _exp_env("GENICONET_MERGED_BWD", "0")
    if v in ("0", ""):
        return False
    if v in ("1", "all"):
        return True
    return family in {f.strip() for f in v.split(",")}


def _bwd_vmem_ok(h, w, cin, couts, n_out, B, family):
    """Merged-backward working set gate, evaluated at the k the plumbing
    will actually choose (advisor round-2: a k>1 chosen by the 10MB/sample
    budget multiplies the whole footprint): ~14 fp32 planes of C_in (padded
    dpad buffers, pad-transpose temporaries, dphase outputs) plus
    per-output-phase g/y/slice blocks in ΣC_out (~3 planes each), per
    sample, times k."""
    if not _merged_bwd_enabled(family):
        return False
    per_sample = 5 * h * w * 4 * (14 * cin + 3 * n_out * sum(couts))
    k = _choose_k(B, per_sample, 5 * h * w)
    return k * per_sample < 90 * 1024 * 1024


def _up_fwd_kernel(*refs, h, w, k, corner_mode, n_sets, out_dtype, with_stats):
    """Upsample + conv forward: refs = x (std level-s layout),
    n_sets×(taps, bias), then n_sets×4 phase outputs and [n_sets (2, C_out)
    stats accumulators]."""
    x_ref = refs[0]
    w_refs = [refs[1 + 2 * i] for i in range(n_sets)]
    b_refs = [refs[2 + 2 * i] for i in range(n_sets)]
    outs = refs[1 + 2 * n_sets : 1 + 2 * n_sets + 4 * n_sets]
    stat_outs = refs[1 + 2 * n_sets + 4 * n_sets :]
    P = jnp.concatenate(
        [_build_padded(x_ref[i], h, w, corner_mode) for i in range(k)], axis=0
    )
    phases = _upsample_phases(P, h, w)
    padded = _phase_pad_k(phases, k, h, w, corner_mode)
    results = _contract(padded, w_refs, b_refs, _ALL, h, w, k, out_dtype)
    i = 0
    for si, per_set in enumerate(results):
        for arr in per_set:
            outs[i][...] = arr
            i += 1
        if with_stats:
            part = _stats_partial(per_set)

            @pl.when(pl.program_id(0) == 0)
            def _(si=si):
                stat_outs[si][...] = jnp.zeros_like(stat_outs[si])

            stat_outs[si][...] += part


def _up_bwd_kernel(*refs, h, w, k, corner_mode, n_sets, out_dtype, with_stats):
    """Merged upsample+conv backward: dx + dtaps + per-set Σg_eff in ONE
    kernel, sharing the g read, the stats fold, and the padded upsampled
    phases. refs (inputs): x, n_sets×4 g, [n_sets×4 y, n_sets gs], n_sets
    taps; (outputs): dx, n_sets dtaps, n_sets gsum."""
    x_ref = refs[0]
    idx = 1
    g_refs_flat = refs[idx : idx + n_sets * 4]
    idx += n_sets * 4
    if with_stats:
        y_refs_flat = refs[idx : idx + n_sets * 4]
        gs_refs = refs[idx + n_sets * 4 : idx + n_sets * 4 + n_sets]
        idx += n_sets * 4 + n_sets
    w_refs = refs[idx : idx + n_sets]
    idx += n_sets
    o_ref = refs[idx]
    dt_refs = refs[idx + 1 : idx + 1 + n_sets]
    gsum_refs = refs[idx + 1 + n_sets : idx + 1 + 2 * n_sets]
    first = pl.program_id(0) == 0
    cin = w_refs[0].shape[1]

    g_groups = []
    for si in range(n_sets):
        g_set = g_refs_flat[si * 4 : (si + 1) * 4]
        if with_stats:
            g_set = _geff_fold(
                g_set, y_refs_flat[si * 4 : (si + 1) * 4], gs_refs[si], out_dtype
            )
        else:
            g_set = [g[...] for g in g_set]
        g_set = [g.reshape(k * 5, h, w, g.shape[-1]) for g in g_set]
        g_groups.append(g_set)

    for si, g_set in enumerate(g_groups):
        part = sum(
            jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)) for g in g_set
        ).reshape(1, -1)

        @pl.when(first)
        def _(si=si):
            gsum_refs[si][...] = jnp.zeros_like(gsum_refs[si])

        gsum_refs[si][...] += part

    dpad = _dpad_accumulate(g_groups, w_refs, _ALL, h, w, k, cin)
    dphases = _phase_pad_transpose(dpad, k, h, w, corner_mode)
    dP = _upsample_transpose(dphases, h, w)
    dx = _pad_transpose(dP, h=h, w=w, corner_mode=corner_mode, k=k)
    o_ref[...] = dx.reshape(k, 5, h, w, cin).astype(out_dtype)

    P = jnp.concatenate(
        [_build_padded(x_ref[i], h, w, corner_mode) for i in range(k)], axis=0
    )
    phases = _upsample_phases(P, h, w)
    padded = _phase_pad_k(phases, k, h, w, corner_mode)
    _dtaps_accumulate(padded, g_groups, dt_refs, _ALL, h, w, k, first)


def _up_fold_groups(refs, idx, n_sets, with_stats, out_dtype):
    """Shared input parse for the up dx/dtaps kernels: n_sets×4 g refs
    [+ n_sets×4 y refs + n_sets gs refs with the in-kernel stats fold].
    Returns (g_groups, next_idx)."""
    g_flat = refs[idx : idx + n_sets * 4]
    idx += n_sets * 4
    if not with_stats:
        return [g_flat[i * 4 : (i + 1) * 4] for i in range(n_sets)], idx
    y_flat = refs[idx : idx + n_sets * 4]
    gs_refs = refs[idx + n_sets * 4 : idx + n_sets * 4 + n_sets]
    idx += n_sets * 4 + n_sets
    groups = [
        _geff_fold(
            g_flat[i * 4 : (i + 1) * 4], y_flat[i * 4 : (i + 1) * 4],
            gs_refs[i], out_dtype,
        )
        for i in range(n_sets)
    ]
    return groups, idx


def _up_dx_kernel(*refs, h, w, k, corner_mode, n_sets, out_dtype,
                  with_stats=False, emit_gsum=None):
    """Upsample + conv dx: refs = n_sets×4 g refs [+ y/gs refs], n_sets
    taps, then 1 dx output (std level-s layout) [+ n_sets gsum
    accumulators when emit_gsum]. emit_gsum defaults to with_stats; with
    the in-kernel fold OFF the incoming g is already the XLA-folded g_eff,
    so Σg is still the exact bias gradient — emitting it here replaces a
    whole-cotangent convert+reduce XLA fusion per conv (round-3 trace:
    ~70-110 us each, 14 sites)."""
    if emit_gsum is None:
        emit_gsum = with_stats
    g_groups, idx = _up_fold_groups(refs, 0, n_sets, with_stats, out_dtype)
    w_refs = refs[idx : idx + n_sets]
    o_ref = refs[idx + n_sets]
    cin = w_refs[0].shape[1]
    if emit_gsum:
        gsum_refs = refs[idx + n_sets + 1 : idx + 2 * n_sets + 1]
        first = pl.program_id(0) == 0
        for si, g_set in enumerate(g_groups):
            part = sum(
                jnp.sum(g[...].astype(jnp.float32), axis=(0, 1, 2, 3))
                for g in g_set
            ).reshape(1, -1)

            @pl.when(first)
            def _(si=si):
                gsum_refs[si][...] = jnp.zeros_like(gsum_refs[si])

            gsum_refs[si][...] += part
    dpad = _dpad_accumulate(g_groups, w_refs, _ALL, h, w, k, cin)
    dphases = _phase_pad_transpose(dpad, k, h, w, corner_mode)
    dP = _upsample_transpose(dphases, h, w)
    dx = _pad_transpose(dP, h=h, w=w, corner_mode=corner_mode, k=k)
    o_ref[...] = dx.reshape(k, 5, h, w, cin).astype(out_dtype)


def _up_dtaps_kernel(*refs, h, w, k, corner_mode, n_sets, with_stats=False,
                     out_dtype=None):
    """Upsample + conv dtaps: refs = x, n_sets×4 g refs [+ y/gs refs],
    n_sets outputs."""
    x_ref = refs[0]
    g_groups, idx = _up_fold_groups(refs, 1, n_sets, with_stats, out_dtype)
    outs = refs[idx:]
    P = jnp.concatenate(
        [_build_padded(x_ref[i], h, w, corner_mode) for i in range(k)], axis=0
    )
    phases = _upsample_phases(P, h, w)
    padded = _phase_pad_k(phases, k, h, w, corner_mode)
    _dtaps_accumulate(
        padded, g_groups, outs, _ALL, h, w, k, pl.program_id(0) == 0
    )


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _block(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, lambda b, nd=nd: (b,) + (0,) * (nd - 1), memory_space=pltpu.VMEM
    )


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _params(flops, bytes_accessed):
    return dict(
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )


def _norm_bias(bias, cout, dtype):
    if bias is None:
        return jnp.zeros((1, cout), dtype)
    return bias.reshape(1, cout).astype(dtype)


def _acc_spec(shape):
    """Grid-accumulated output block (same block every program)."""
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)


def _phase_conv_fwd(phases, tap_sets, corner_mode, out_phases, act=None,
                    with_stats=False):
    """tap_sets: list of (taps, bias). act: optional (mul, add) fp32 (C_in,)
    BN-apply+ReLU prologue. Returns (per-set tuples of out phases,
    per-set (2, C_out) stats or None)."""
    B = phases[0].shape[0]
    h, w = phases[0].shape[2], phases[0].shape[3]
    cin = tap_sets[0][0].shape[1]
    packed = len(phases) == 1 and phases[0].shape[-1] == 4 * cin
    dtype = phases[0].dtype
    n_sets = len(tap_sets)
    couts = [t.shape[-1] for t, _ in tap_sets]
    per_sample = 5 * h * w * (8 * cin + 4 * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    kernel = functools.partial(
        _pc_fwd_kernel, h=h, w=w, k=k, corner_mode=corner_mode,
        out_phases=out_phases, n_sets=n_sets, out_dtype=dtype,
        has_act=act is not None, with_stats=with_stats, packed=packed,
    )
    if packed:
        in_specs = [_block((k, 5, h, w, 4 * cin))]
        scratch = [pltpu.VMEM((k * 5, h, w, cin), dtype)] * 3
    else:
        in_specs = [_block((k, 5, h, w, cin))] * 4
        scratch = []
    args = list(phases)
    if act is not None:
        in_specs += [_block((1, cin))] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    for taps, bias in tap_sets:
        in_specs += [_full(), _block((1, taps.shape[-1]))]
        args += [taps, _norm_bias(bias, taps.shape[-1], taps.dtype)]
    out_shape, out_specs = [], []
    for cout in couts:
        for _ in out_phases:
            out_shape.append(jax.ShapeDtypeStruct((B, 5, h, w, cout), dtype))
            out_specs.append(_block((k, 5, h, w, cout)))
    if with_stats:
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((2, cout), jnp.float32))
            out_specs.append(_acc_spec((2, cout)))
    flops = 2 * B * 5 * h * w * len(out_phases) * 7 * cin * sum(couts)
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        **_params(flops, B * 5 * h * w * cin * dtype.itemsize * 4),
    )(*args)
    n_out = len(out_phases)
    sets = [tuple(outs[i * n_out : (i + 1) * n_out]) for i in range(n_sets)]
    stats = list(outs[n_sets * n_out :]) if with_stats else [None] * n_sets
    return sets, stats


def _phase_conv_dx(g_groups, tap_sets, corner_mode, out_phases, cin, dtype,
                   act=None, raw_phases=None, y_groups=None, gs_list=None):
    """With act, also needs the RAW input phases and returns
    (dphases, d_mul, d_add, gsums); otherwise (dphases, None, None, gsums).
    With y_groups/gs_list, the stats-cotangent fold runs in-kernel and the
    per-set Σg_eff bias gradients come back as `gsums` (else None)."""
    B = g_groups[0][0].shape[0]
    h, w = g_groups[0][0].shape[2], g_groups[0][0].shape[3]
    n_sets = len(tap_sets)
    with_stats = y_groups is not None
    couts = [t.shape[-1] for t, _ in tap_sets]
    per_sample = 5 * h * w * (
        12 * cin + (8 if with_stats else 4) * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    kernel = functools.partial(
        _pc_dx_kernel, h=h, w=w, k=k, corner_mode=corner_mode,
        out_phases=out_phases, n_sets=n_sets, out_dtype=dtype,
        has_act=act is not None, with_stats=with_stats,
    )
    in_specs, args = [], []
    for g_group, cout in zip(g_groups, couts):
        in_specs += [_block((k, 5, h, w, cout))] * len(out_phases)
        args += list(g_group)
    if with_stats:
        for y_group, cout in zip(y_groups, couts):
            in_specs += [_block((k, 5, h, w, cout))] * len(out_phases)
            args += list(y_group)
        for gs, cout in zip(gs_list, couts):
            in_specs.append(_acc_spec((2, cout)))
            args.append(gs)
    for taps, _ in tap_sets:
        in_specs.append(_full())
        args.append(taps)
    if act is not None:
        in_specs += [_block((k, 5, h, w, cin))] * 4
        args += list(raw_phases)
        in_specs += [_block((1, cin))] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    out_shape = [jax.ShapeDtypeStruct((B, 5, h, w, cin), dtype)] * 4
    out_specs = [_block((k, 5, h, w, cin))] * 4
    if with_stats:
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((1, cout), jnp.float32))
            out_specs.append(_acc_spec((1, cout)))
    if act is not None:
        out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 2
        out_specs += [_acc_spec((1, cin))] * 2
    flops = 2 * B * 5 * h * w * len(out_phases) * 7 * cin * sum(couts)
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * dtype.itemsize * 4),
    )(*args)
    idx = 4
    gsums = None
    if with_stats:
        gsums = [o.reshape(-1) for o in outs[idx : idx + n_sets]]
        idx += n_sets
    if act is not None:
        return (tuple(outs[:4]), outs[idx].reshape(cin),
                outs[idx + 1].reshape(cin), gsums)
    return tuple(outs[:4]), None, None, gsums


def _phase_conv_dtaps(phases, g_groups, tap_shapes, corner_mode, out_phases,
                      act=None, y_groups=None, gs_list=None, emit_gsum=False):
    """With y_groups/gs_list the stats-cotangent fold runs in-kernel; with
    emit_gsum the per-set Σg_eff bias gradients come back as a second result
    (for convs that skip the dx kernel, e.g. the encoder front)."""
    B = phases[0].shape[0]
    h, w = phases[0].shape[2], phases[0].shape[3]
    cin = tap_shapes[0][1]
    packed = len(phases) == 1 and phases[0].shape[-1] == 4 * cin
    n_sets = len(g_groups)
    with_stats = y_groups is not None
    couts = [s[-1] for s in tap_shapes]
    per_sample = 5 * h * w * (
        8 * cin + (8 if with_stats else 4) * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    kernel = functools.partial(
        _pc_dtaps_kernel, h=h, w=w, k=k, corner_mode=corner_mode,
        out_phases=out_phases, n_sets=n_sets, has_act=act is not None,
        with_stats=with_stats, emit_gsum=emit_gsum, packed=packed,
    )
    if packed:
        in_specs = [_block((k, 5, h, w, 4 * cin))]
        scratch = [pltpu.VMEM((k * 5, h, w, cin), phases[0].dtype)] * 3
    else:
        in_specs = [_block((k, 5, h, w, cin))] * 4
        scratch = []
    args = list(phases)
    if act is not None:
        in_specs += [_block((1, cin))] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    for g_group, cout in zip(g_groups, couts):
        in_specs += [_block((k, 5, h, w, cout))] * len(out_phases)
        args += list(g_group)
    if with_stats:
        for y_group, cout in zip(y_groups, couts):
            in_specs += [_block((k, 5, h, w, cout))] * len(out_phases)
            args += list(y_group)
        for gs, cout in zip(gs_list, couts):
            in_specs.append(_acc_spec((2, cout)))
            args.append(gs)
    out_shape = [jax.ShapeDtypeStruct((7, cin, c), jnp.float32) for c in couts]
    out_specs = [
        pl.BlockSpec((7, cin, c), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
        for c in couts
    ]
    if emit_gsum:
        for c in couts:
            out_shape.append(jax.ShapeDtypeStruct((1, c), jnp.float32))
            out_specs.append(_acc_spec((1, c)))
    flops = 2 * B * 5 * h * w * len(out_phases) * 7 * cin * sum(couts)
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        **_params(flops, B * 5 * h * w * cin * 4),
    )(*args)
    if emit_gsum:
        return (tuple(outs[: len(couts)]),
                [o.reshape(-1) for o in outs[len(couts) :]])
    return tuple(outs)


# --------------------------- shared vjp helpers ----------------------------


def _fold_geff_kernel(*refs, n):
    gs_ref = refs[2 * n]
    gs0 = gs_ref[0].astype(jnp.float32)
    gs1 = gs_ref[1].astype(jnp.float32)
    for i in range(n):
        g = refs[i][...]
        refs[2 * n + 1 + i][...] = _geff_one(g, refs[n + i][...], gs0, gs1,
                                             g.dtype)


def _stats_geff(g_group, y_group, g_st):
    """Stats-cotangent fold over a phase group (`_geff_one` per phase),
    g_eff = g + gs0 + 2·gs1·y. Runs as ONE tiny Pallas elementwise kernel:
    XLA's kLoop fusion of the same expression ran at ~18% of HBM bandwidth
    (~0.4 ms per wide site, 4 sites in the round-3 trace); the kernel form
    is bit-identical (same f32 ops) and ~3x faster standalone — but the
    whole-model bench REGRESSED with it (2079 -> 2057 meshes/s): the XLA
    fusions overlap with adjacent kernel DMA, while extra custom-call
    launches serialize. Default OFF; GENICONET_PALLAS_FOLD=1 enables for
    hardware experiments. Zero-cotangent stats cost nothing after DCE
    (the fold never runs then)."""
    import os

    if g_st is None:
        return tuple(g_group)
    if _exp_env("GENICONET_PALLAS_FOLD", "0") != "1":
        gs0 = g_st[0].astype(jnp.float32)
        gs1 = g_st[1].astype(jnp.float32)
        return tuple(
            _geff_one(g, y, gs0, gs1, g.dtype) for g, y in zip(g_group, y_group)
        )
    n = len(g_group)
    g0 = g_group[0]
    B, C = g0.shape[0], g0.shape[-1]
    inner = g0.shape[1:]
    per_sample = int(np.prod(inner)) * 4 * (3 * n)
    k = _choose_k(B, per_sample, int(np.prod(inner[:-1])))
    bspec = _block((k,) + tuple(inner))
    outs = pl.pallas_call(
        functools.partial(_fold_geff_kernel, n=n),
        grid=(B // k,),
        in_specs=[bspec] * (2 * n) + [_acc_spec((2, C))],
        out_specs=[bspec] * n,
        out_shape=[jax.ShapeDtypeStruct(g.shape, g.dtype) for g in g_group],
        **_params(0, B * int(np.prod(inner)) * g0.dtype.itemsize * 3 * n),
    )(*g_group, *y_group, jnp.asarray(g_st))
    return tuple(outs)


def _mk_act(act_mul, act_add):
    return None if act_mul is None else (act_mul, act_add)


# --------------------------- fused_phase_conv_s1 ---------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _pcs1(phases, taps, bias, act_mul, act_add, corner_mode, with_stats,
          needs_dx, fold_ok=True, fold_site=""):
    (out,), (st,) = _phase_conv_fwd(
        phases, [(taps, bias)], corner_mode, _ALL,
        act=_mk_act(act_mul, act_add), with_stats=with_stats,
    )
    return out, st


def _pcs1_fwd(phases, taps, bias, act_mul, act_add, corner_mode, with_stats,
              needs_dx, fold_ok=True, fold_site=""):
    out, st = _pcs1(phases, taps, bias, act_mul, act_add, corner_mode,
                    with_stats, needs_dx, fold_ok, fold_site)
    res = (phases, taps, bias, act_mul, act_add,
           out if with_stats else None)
    return (out, st), res


def _pcs1_bwd(corner_mode, with_stats, needs_dx, fold_ok, fold_site, res, g):
    phases, taps, bias, act_mul, act_add, out = res
    g_out, g_st = g
    act = _mk_act(act_mul, act_add)
    h, w = phases[0].shape[2], phases[0].shape[3]
    packed = len(phases) == 1 and phases[0].shape[-1] == 4 * taps.shape[1]
    if packed and needs_dx:
        raise NotImplementedError(
            "packed-phase input is for data-fed convs (needs_dx=False)")
    if needs_dx and _bwd_vmem_ok(h, w, phases[0].shape[-1], [taps.shape[-1]],
                                 4, phases[0].shape[0], "pcs1"):
        dphases, (dtaps,), (gsum,), dmul, dadd = _phase_conv_bwd(
            phases, [g_out], [out] if with_stats else None,
            [g_st] if with_stats else None, [(taps, bias)], corner_mode,
            _ALL, act, with_stats, phases[0].dtype,
        )
        db = None if bias is None else gsum.astype(bias.dtype)
        return dphases, dtaps.astype(taps.dtype), db, dmul, dadd
    # the encoder front (needs_dx=False) is its own fold family: its fused
    # set was never implicated in the bs36 program-threshold crash (the
    # family-wide 'pcs1' fold was), and folding here removes one ~0.4 ms
    # whole-cotangent XLA pass per step. Stride-1 convs in named blocks
    # carry a per-site family (e.g. 'pcs1_up2') for finer hardware gating.
    if not needs_dx:
        fam = "pcs1_front"
    elif fold_site:
        fam = f"pcs1_{fold_site}"
    else:
        fam = "pcs1"
    fold = with_stats and _kernel_geff_enabled(fam, fold_ok)
    yk = dict(y_groups=[out], gs_list=[g_st]) if fold else {}
    if not fold:
        g_out = _stats_geff(g_out, out, g_st if with_stats else None)
    gsums = None
    if needs_dx:
        dphases, dmul, dadd, gsums = _phase_conv_dx(
            [g_out], [(taps, bias)], corner_mode, _ALL,
            phases[0].shape[-1], phases[0].dtype, act=act, raw_phases=phases,
            **yk,
        )
    else:
        # the input is data (encoder front): skip the whole dx kernel —
        # XLA cannot DCE an unused pallas custom-call on its own
        dphases = tuple(jnp.zeros_like(p) for p in phases)
        dmul = dadd = (None if act is None else jnp.zeros_like(act[0]))
    # bias grad rides the dtaps kernel as a Σg accumulator (post-fold g IS
    # g_eff), unless the dx kernel's fold already produced it
    want_gsum = bias is not None and gsums is None
    r = _phase_conv_dtaps(
        phases, [g_out], [taps.shape], corner_mode, _ALL, act=act,
        emit_gsum=want_gsum, **yk,
    )
    if want_gsum:
        (dtaps,), gsums = r
    else:
        (dtaps,) = r
    db = None if bias is None else gsums[0].astype(bias.dtype)
    return dphases, dtaps.astype(taps.dtype), db, dmul, dadd


_pcs1.defvjp(_pcs1_fwd, _pcs1_bwd)


def fused_phase_conv_s1(phases, taps, bias, corner_mode="average", act=None,
                        with_stats=False, needs_dx=True, fold_ok=True,
                        fold_site=""):
    """Stride-1 hex conv in phase form: 4 phases in -> 4 phases out.

    `phases` may also be a 1-tuple of ONE lane-packed (B, 5, h, w, 4·cin)
    array (phase p at lanes [p·cin, (p+1)·cin)) — for tiny-cin data convs
    (the encoder front, cin=3) four separate phase tensors waste 125/128
    lanes of every HBM transfer; requires needs_dx=False.

    act: optional (mul, add) fp32 (C_in,) — in-kernel BN-apply+ReLU prologue.
    with_stats: also return (2, C_out) fp32 [sum, sumsq] of the output.
    needs_dx=False skips the input-cotangent kernel entirely (for convs whose
    input is data, e.g. the encoder front)."""
    mul, add = (act if act is not None else (None, None))
    if (len(phases) == 1 and phases[0].shape[-1] == 4 * taps.shape[1]
            and needs_dx):
        raise ValueError(
            "lane-packed phase input requires needs_dx=False (it is for "
            "data-fed convs like the encoder front)")
    out, st = _pcs1(tuple(phases), taps, bias, mul, add, corner_mode,
                    with_stats, needs_dx, fold_ok, fold_site)
    return (out, st) if with_stats else out


# ---------------------------- fused_dual_s2_conv ---------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ds2(phases, taps_a, bias_a, taps_b, bias_b, act_mul, act_add,
         corner_mode, with_stats, fold_ok=True):
    ((ya,), (yb,)), (sa, sb) = _phase_conv_fwd(
        phases, [(taps_a, bias_a), (taps_b, bias_b)], corner_mode, (2,),
        act=_mk_act(act_mul, act_add), with_stats=with_stats,
    )
    return ya, yb, sa, sb


def _ds2_fwd(phases, taps_a, bias_a, taps_b, bias_b, act_mul, act_add,
             corner_mode, with_stats, fold_ok=True):
    ya, yb, sa, sb = _ds2(phases, taps_a, bias_a, taps_b, bias_b,
                          act_mul, act_add, corner_mode, with_stats, fold_ok)
    res = (phases, taps_a, bias_a, taps_b, bias_b, act_mul, act_add,
           (ya, yb) if with_stats else None)
    return (ya, yb, sa, sb), res


def _ds2_bwd(corner_mode, with_stats, fold_ok, res, g):
    phases, taps_a, bias_a, taps_b, bias_b, act_mul, act_add, ys = res
    ga, gb, gsa, gsb = g
    act = _mk_act(act_mul, act_add)
    h, w = phases[0].shape[2], phases[0].shape[3]
    couts = [taps_a.shape[-1], taps_b.shape[-1]]
    if _bwd_vmem_ok(h, w, phases[0].shape[-1], couts, 1, phases[0].shape[0], "ds2"):
        dphases, (dta, dtb), (gsa_, gsb_), dmul, dadd = _phase_conv_bwd(
            phases, [(ga,), (gb,)],
            [(ys[0],), (ys[1],)] if with_stats else None,
            [gsa, gsb] if with_stats else None,
            [(taps_a, bias_a), (taps_b, bias_b)], corner_mode, (2,),
            act, with_stats, phases[0].dtype,
        )
        dba = None if bias_a is None else gsa_.astype(bias_a.dtype)
        dbb = None if bias_b is None else gsb_.astype(bias_b.dtype)
        return (dphases, dta.astype(taps_a.dtype), dba,
                dtb.astype(taps_b.dtype), dbb, dmul, dadd)
    fold = with_stats and _kernel_geff_enabled("ds2", fold_ok)
    yk = (dict(y_groups=[(ys[0],), (ys[1],)], gs_list=[gsa, gsb])
          if fold else {})
    if with_stats and not fold:
        (ga,) = _stats_geff((ga,), (ys[0],), gsa)
        (gb,) = _stats_geff((gb,), (ys[1],), gsb)
    dphases, dmul, dadd, gsums = _phase_conv_dx(
        [(ga,), (gb,)], [(taps_a, bias_a), (taps_b, bias_b)], corner_mode, (2,),
        phases[0].shape[-1], phases[0].dtype, act=act, raw_phases=phases,
        **yk,
    )
    # bias grads ride the dtaps kernel as Σg accumulators (post-fold g IS
    # g_eff) unless the dx kernel's fold already produced them
    want_gsum = gsums is None and (bias_a is not None or bias_b is not None)
    r = _phase_conv_dtaps(
        phases, [(ga,), (gb,)], [taps_a.shape, taps_b.shape], corner_mode, (2,),
        act=act, emit_gsum=want_gsum, **yk,
    )
    if want_gsum:
        (dta, dtb), gsums = r
    else:
        dta, dtb = r
    dba = None if bias_a is None else gsums[0].astype(bias_a.dtype)
    dbb = None if bias_b is None else gsums[1].astype(bias_b.dtype)
    return (dphases, dta.astype(taps_a.dtype), dba, dtb.astype(taps_b.dtype),
            dbb, dmul, dadd)


_ds2.defvjp(_ds2_fwd, _ds2_bwd)


def fused_dual_s2_conv(phases, taps_a, bias_a, taps_b, bias_b,
                       corner_mode="average", act=None, with_stats=False,
                       fold_ok=True):
    """Both stride-2 convs of a DownBlock in one kernel.

    phases: the 4 parity phases of the level-s input (XLA-side slices).
    Returns (y_a, y_b), each a standard level-(s-1) tensor — the stride-2
    conv is output phase (1,0) of the phase conv, so no parity reshapes.
    act: optional in-kernel BN-apply+ReLU prologue on the input phases.
    with_stats: additionally return (2, C) [sum, sumsq] per output."""
    mul, add = (act if act is not None else (None, None))
    ya, yb, sa, sb = _ds2(tuple(phases), taps_a, bias_a, taps_b, bias_b,
                          mul, add, corner_mode, with_stats, fold_ok)
    return (ya, yb, sa, sb) if with_stats else (ya, yb)


# ------------------------- fused_dual_s2_conv_split -------------------------
#
# The phase-chain twin of fused_dual_s2_conv (GENICONET_PHASE_CHAIN): both
# stride-2 outputs are emitted AS the 4 parity phases of the level-(s-1)
# grid (an in-VMEM reshape split), so the block's second conv consumes them
# through fused_phase_conv_s1 and the residual join runs per-phase — no
# spatial tensor, phase_split gather, or relayout copy between encoder
# blocks (round-4 trace: ~0.45 ms/step across down0-down2). The backward
# kernels re-interleave the phase cotangents at entry and DELEGATE to the
# generic _pc_dx_kernel/_pc_dtaps_kernel bodies (values flow through the
# shared helpers unchanged), so the conv math has one definition.


def _split4(arr, k, hp, wp):
    """(k, 5, 2hp, 2wp, C) -> the 4 parity phases (k, 5, hp, wp, C); the
    in-VMEM twin of ops/phase.phase_split (inverse of _interleave4)."""
    C = arr.shape[-1]
    r = arr.reshape(k, 5, hp, 2, wp, 2, C)
    return tuple(r[:, :, :, p >> 1, :, p & 1, :] for p in range(4))


def _ds2s_fwd_kernel(*refs, h, w, k, corner_mode, n_sets, out_dtype, has_act,
                     with_stats):
    phases, idx = _unpack_phases(refs, False, h, w, k)
    if has_act:
        mul, add = refs[idx][0], refs[idx + 1][0]
        phases = tuple(_act_apply(p, mul, add) for p in phases)
        idx += 2
    w_refs = [refs[idx + 2 * i] for i in range(n_sets)]
    b_refs = [refs[idx + 1 + 2 * i] for i in range(n_sets)]
    outs = refs[idx + 2 * n_sets : idx + 2 * n_sets + 4 * n_sets]
    stat_outs = refs[idx + 2 * n_sets + 4 * n_sets :]
    padded = _phase_pad_k(phases, k, h, w, corner_mode)
    results = _contract(padded, w_refs, b_refs, (2,), h, w, k, out_dtype)
    i = 0
    for si, per_set in enumerate(results):
        (arr,) = per_set
        for ph in _split4(arr, k, h // 2, w // 2):
            outs[i][...] = ph
            i += 1
        if with_stats:
            part = _stats_partial(per_set)

            @pl.when(pl.program_id(0) == 0)
            def _(si=si):
                stat_outs[si][...] = jnp.zeros_like(stat_outs[si])

            stat_outs[si][...] += part


def _ds2s_dx_kernel(*refs, h, w, k, corner_mode, n_sets, out_dtype, has_act,
                    with_stats):
    """Interleave the per-set phase cotangents (and the saved phase outputs
    under the in-kernel fold) back into the coarse grid, then delegate to
    _pc_dx_kernel — the g/y positions carry VALUES, which every shared
    helper consumes identically to refs."""
    hp, wp = h // 2, w // 2
    m = 4 * n_sets
    g_vals = [
        _interleave4([r[...] for r in refs[si * 4 : (si + 1) * 4]], k, hp, wp)
        for si in range(n_sets)
    ]
    rest = list(refs[m:])
    if with_stats:
        y_vals = [
            _interleave4([r[...] for r in rest[si * 4 : (si + 1) * 4]],
                         k, hp, wp)
            for si in range(n_sets)
        ]
        rest = rest[m:]
        new = g_vals + y_vals + rest
    else:
        new = g_vals + rest
    _pc_dx_kernel(*new, h=h, w=w, k=k, corner_mode=corner_mode,
                  out_phases=(2,), n_sets=n_sets, out_dtype=out_dtype,
                  has_act=has_act, with_stats=with_stats)


def _ds2s_dtaps_kernel(*refs, h, w, k, corner_mode, n_sets, has_act,
                       with_stats=False, emit_gsum=False):
    hp, wp = h // 2, w // 2
    pre = 4 + (2 if has_act else 0)
    m = 4 * n_sets
    g_vals = [
        _interleave4(
            [r[...] for r in refs[pre + si * 4 : pre + (si + 1) * 4]],
            k, hp, wp)
        for si in range(n_sets)
    ]
    rest = list(refs[pre + m :])
    if with_stats:
        y_vals = [
            _interleave4([r[...] for r in rest[si * 4 : (si + 1) * 4]],
                         k, hp, wp)
            for si in range(n_sets)
        ]
        rest = rest[m:]
        new = list(refs[:pre]) + g_vals + y_vals + rest
    else:
        new = list(refs[:pre]) + g_vals + rest
    _pc_dtaps_kernel(*new, h=h, w=w, k=k, corner_mode=corner_mode,
                     out_phases=(2,), n_sets=n_sets, has_act=has_act,
                     with_stats=with_stats, emit_gsum=emit_gsum,
                     packed=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ds2s(phases, taps_a, bias_a, taps_b, bias_b, act_mul, act_add,
          corner_mode, with_stats, fold_ok=True):
    B = phases[0].shape[0]
    h, w = phases[0].shape[2], phases[0].shape[3]
    cin = taps_a.shape[1]
    dtype = phases[0].dtype
    tap_sets = [(taps_a, bias_a), (taps_b, bias_b)]
    couts = [t.shape[-1] for t, _ in tap_sets]
    act = _mk_act(act_mul, act_add)
    per_sample = 5 * h * w * (8 * cin + 5 * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    kernel = functools.partial(
        _ds2s_fwd_kernel, h=h, w=w, k=k, corner_mode=corner_mode,
        n_sets=2, out_dtype=dtype, has_act=act is not None,
        with_stats=with_stats,
    )
    in_specs = [_block((k, 5, h, w, cin))] * 4
    args = list(phases)
    if act is not None:
        in_specs += [_block((1, cin))] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    for taps, bias in tap_sets:
        in_specs += [_full(), _block((1, taps.shape[-1]))]
        args += [taps, _norm_bias(bias, taps.shape[-1], taps.dtype)]
    hp, wp = h // 2, w // 2
    out_shape, out_specs = [], []
    for cout in couts:
        for _ in range(4):
            out_shape.append(
                jax.ShapeDtypeStruct((B, 5, hp, wp, cout), dtype))
            out_specs.append(_block((k, 5, hp, wp, cout)))
    if with_stats:
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((2, cout), jnp.float32))
            out_specs.append(_acc_spec((2, cout)))
    flops = 2 * B * 5 * h * w * 7 * cin * sum(couts)
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * dtype.itemsize * 4),
    )(*args)
    ya, yb = tuple(outs[0:4]), tuple(outs[4:8])
    sa, sb = (outs[8], outs[9]) if with_stats else (None, None)
    return ya, yb, sa, sb


def _ds2s_fwd(phases, taps_a, bias_a, taps_b, bias_b, act_mul, act_add,
              corner_mode, with_stats, fold_ok=True):
    ya, yb, sa, sb = _ds2s(phases, taps_a, bias_a, taps_b, bias_b,
                           act_mul, act_add, corner_mode, with_stats, fold_ok)
    res = (phases, taps_a, bias_a, taps_b, bias_b, act_mul, act_add,
           (ya, yb) if with_stats else None)
    return (ya, yb, sa, sb), res


def _ds2s_bwd(corner_mode, with_stats, fold_ok, res, g):
    phases, taps_a, bias_a, taps_b, bias_b, act_mul, act_add, ys = res
    ga, gb, gsa, gsb = g
    act = _mk_act(act_mul, act_add)
    B = phases[0].shape[0]
    h, w = phases[0].shape[2], phases[0].shape[3]
    hp, wp = h // 2, w // 2
    cin = phases[0].shape[-1]
    dtype = phases[0].dtype
    tap_sets = [(taps_a, bias_a), (taps_b, bias_b)]
    couts = [taps_a.shape[-1], taps_b.shape[-1]]
    fold = with_stats and _kernel_geff_enabled("ds2", fold_ok)
    if with_stats and not fold:
        ga = _stats_geff(ga, ys[0], gsa)
        gb = _stats_geff(gb, ys[1], gsb)

    def gy_specs_args(specs, args):
        for g_group, cout in zip((ga, gb), couts):
            specs += [_block((k, 5, hp, wp, cout))] * 4
            args += list(g_group)
        if fold:
            for y_group, cout in zip(ys, couts):
                specs += [_block((k, 5, hp, wp, cout))] * 4
                args += list(y_group)
            for gs, cout in zip((gsa, gsb), couts):
                specs.append(_acc_spec((2, cout)))
                args.append(gs)
        return specs, args

    # dx kernel
    per_sample = 5 * h * w * (12 * cin + (8 if fold else 4) * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    dx_kernel = functools.partial(
        _ds2s_dx_kernel, h=h, w=w, k=k, corner_mode=corner_mode, n_sets=2,
        out_dtype=dtype, has_act=act is not None, with_stats=fold,
    )
    in_specs, args = gy_specs_args([], [])
    in_specs += [_full(), _full()]
    args += [taps_a, taps_b]
    if act is not None:
        in_specs += [_block((k, 5, h, w, cin))] * 4
        args += list(phases)
        in_specs += [_block((1, cin))] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    out_shape = [jax.ShapeDtypeStruct((B, 5, h, w, cin), dtype)] * 4
    out_specs = [_block((k, 5, h, w, cin))] * 4
    if fold:
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((1, cout), jnp.float32))
            out_specs.append(_acc_spec((1, cout)))
    if act is not None:
        out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 2
        out_specs += [_acc_spec((1, cin))] * 2
    flops = 2 * B * 5 * h * w * 7 * cin * sum(couts)
    outs = pl.pallas_call(
        dx_kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * dtype.itemsize * 4),
    )(*args)
    dphases = tuple(outs[:4])
    idx = 4
    gsums = None
    if fold:
        gsums = [o.reshape(-1) for o in outs[idx : idx + 2]]
        idx += 2
    dmul = dadd = None
    if act is not None:
        dmul = outs[idx].reshape(cin)
        dadd = outs[idx + 1].reshape(cin)

    # dtaps kernel
    want_gsum = gsums is None and (bias_a is not None or bias_b is not None)
    dt_kernel = functools.partial(
        _ds2s_dtaps_kernel, h=h, w=w, k=k, corner_mode=corner_mode, n_sets=2,
        has_act=act is not None, with_stats=fold, emit_gsum=want_gsum,
    )
    in_specs = [_block((k, 5, h, w, cin))] * 4
    args = list(phases)
    if act is not None:
        in_specs += [_block((1, cin))] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    in_specs, args = gy_specs_args(in_specs, args)
    out_shape = [jax.ShapeDtypeStruct((7, cin, c), jnp.float32) for c in couts]
    out_specs = [
        pl.BlockSpec((7, cin, c), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
        for c in couts
    ]
    if want_gsum:
        for c in couts:
            out_shape.append(jax.ShapeDtypeStruct((1, c), jnp.float32))
            out_specs.append(_acc_spec((1, c)))
    outs = pl.pallas_call(
        dt_kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * 4),
    )(*args)
    dta, dtb = outs[0], outs[1]
    if want_gsum:
        gsums = [o.reshape(-1) for o in outs[2:4]]
    dba = None if bias_a is None else gsums[0].astype(bias_a.dtype)
    dbb = None if bias_b is None else gsums[1].astype(bias_b.dtype)
    return (dphases, dta.astype(taps_a.dtype), dba, dtb.astype(taps_b.dtype),
            dbb, dmul, dadd)


_ds2s.defvjp(_ds2s_fwd, _ds2s_bwd)


def fused_dual_s2_conv_split(phases, taps_a, bias_a, taps_b, bias_b,
                             corner_mode="average", act=None,
                             with_stats=False, fold_ok=True):
    """Both stride-2 convs of a DownBlock, outputs emitted as the 4 parity
    phases of the level-(s-1) grid (phase-chain form — see section comment).
    Returns (ya_phases, yb_phases) 4-tuples [+ (2, C) stats per set]."""
    mul, add = (act if act is not None else (None, None))
    ya, yb, sa, sb = _ds2s(tuple(phases), taps_a, bias_a, taps_b, bias_b,
                           mul, add, corner_mode, with_stats, fold_ok)
    return (ya, yb, sa, sb) if with_stats else (ya, yb)


# ---------------------------- fused_up_dual_conv ---------------------------


def _up_conv_fwd_impl(x, tap_sets, corner_mode, with_stats=False):
    B = x.shape[0]
    h, w = x.shape[2], x.shape[3]
    cin = x.shape[-1]
    dtype = x.dtype
    n_sets = len(tap_sets)
    couts = [t.shape[-1] for t, _ in tap_sets]
    per_sample = 5 * h * w * (14 * cin + 4 * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    kernel = functools.partial(
        _up_fwd_kernel, h=h, w=w, k=k, corner_mode=corner_mode,
        n_sets=n_sets, out_dtype=dtype, with_stats=with_stats,
    )
    in_specs = [_block((k, 5, h, w, cin))]
    args = [x]
    for taps, bias in tap_sets:
        in_specs += [_full(), _block((1, taps.shape[-1]))]
        args += [taps, _norm_bias(bias, taps.shape[-1], taps.dtype)]
    out_shape, out_specs = [], []
    for cout in couts:
        for _ in range(4):
            out_shape.append(jax.ShapeDtypeStruct((B, 5, h, w, cout), dtype))
            out_specs.append(_block((k, 5, h, w, cout)))
    if with_stats:
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((2, cout), jnp.float32))
            out_specs.append(_acc_spec((2, cout)))
    flops = 2 * B * 5 * h * w * 4 * 7 * cin * sum(couts)
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * dtype.itemsize * 5),
    )(*args)
    sets = [tuple(outs[i * 4 : (i + 1) * 4]) for i in range(n_sets)]
    stats = list(outs[n_sets * 4 :]) if with_stats else [None] * n_sets
    return sets, stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _upd(x, taps_a, bias_a, taps_b, bias_b, corner_mode, with_stats,
         fold_ok=True):
    (ya, yb), (sa, sb) = _up_conv_fwd_impl(
        x, [(taps_a, bias_a), (taps_b, bias_b)], corner_mode, with_stats
    )
    return ya, yb, sa, sb


def _upd_fwd(x, taps_a, bias_a, taps_b, bias_b, corner_mode, with_stats,
             fold_ok=True):
    ya, yb, sa, sb = _upd(x, taps_a, bias_a, taps_b, bias_b, corner_mode,
                          with_stats, fold_ok)
    res = (x, taps_a, bias_a, taps_b, bias_b,
           (ya, yb) if with_stats else None)
    return (ya, yb, sa, sb), res


def _upd_bwd(corner_mode, with_stats, fold_ok, res, g):
    x, taps_a, bias_a, taps_b, bias_b, ys = res
    ga, gb, gsa, gsb = g
    B = x.shape[0]
    h, w = x.shape[2], x.shape[3]
    cin = x.shape[-1]
    dtype = x.dtype
    couts = [taps_a.shape[-1], taps_b.shape[-1]]
    if _bwd_vmem_ok(h, w, cin, couts, 4, B, "upd"):
        per_sample = 5 * h * w * (16 * cin + 6 * sum(couts)) * 4
        k = _choose_k(B, per_sample, 5 * h * w)
        kernel = functools.partial(
            _up_bwd_kernel, h=h, w=w, k=k, corner_mode=corner_mode, n_sets=2,
            out_dtype=dtype, with_stats=with_stats,
        )
        in_specs = [_block((k, 5, h, w, cin))]
        args = [x]
        in_specs += [_block((k, 5, h, w, couts[0]))] * 4
        in_specs += [_block((k, 5, h, w, couts[1]))] * 4
        args += list(ga) + list(gb)
        if with_stats:
            in_specs += [_block((k, 5, h, w, couts[0]))] * 4
            in_specs += [_block((k, 5, h, w, couts[1]))] * 4
            args += list(ys[0]) + list(ys[1])
            for gs, cout in zip((gsa, gsb), couts):
                in_specs.append(_acc_spec((2, cout)))
                args.append(gs)
        in_specs += [_full(), _full()]
        args += [taps_a, taps_b]
        out_shape = [jax.ShapeDtypeStruct((B, 5, h, w, cin), dtype)]
        out_specs = [_block((k, 5, h, w, cin))]
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((7, cin, cout), jnp.float32))
            out_specs.append(_acc_spec((7, cin, cout)))
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((1, cout), jnp.float32))
            out_specs.append(_acc_spec((1, cout)))
        flops = 2 * B * 5 * h * w * 4 * 7 * cin * sum(couts) * 2
        outs = pl.pallas_call(
            kernel,
            grid=(B // k,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            **_params(flops, B * 5 * h * w * cin * 4 * 5),
        )(*args)
        dx, dta, dtb, gsa_, gsb_ = outs
        dba = None if bias_a is None else gsa_.reshape(-1).astype(bias_a.dtype)
        dbb = None if bias_b is None else gsb_.reshape(-1).astype(bias_b.dtype)
        return (dx, dta.astype(taps_a.dtype), dba, dtb.astype(taps_b.dtype),
                dbb)
    fold = with_stats and _kernel_geff_enabled("upd", fold_ok)
    if with_stats and not fold:
        ga = _stats_geff(ga, ys[0], gsa)
        gb = _stats_geff(gb, ys[1], gsb)
    # bias grads ride the dx kernel as Σg accumulators whether or not the
    # stats fold is in-kernel (post-_stats_geff g IS g_eff) — no XLA
    # whole-cotangent reduction per conv
    need_b = bias_a is not None or bias_b is not None
    per_sample = 5 * h * w * (
        16 * cin + (8 if fold else 4) * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)

    def fold_args(specs, args):
        if fold:
            specs += [_block((k, 5, h, w, couts[0]))] * 4
            specs += [_block((k, 5, h, w, couts[1]))] * 4
            args += list(ys[0]) + list(ys[1])
            for gs, cout in zip((gsa, gsb), couts):
                specs.append(_acc_spec((2, cout)))
                args.append(gs)
        return specs, args

    # dx: one kernel — conv transpose for both sets, phase-pad transpose,
    # upsample transpose, pad transpose [+ in-kernel stats fold + Σg_eff].
    dx_kernel = functools.partial(
        _up_dx_kernel, h=h, w=w, k=k, corner_mode=corner_mode, n_sets=2,
        out_dtype=dtype, with_stats=fold, emit_gsum=need_b,
    )
    in_specs, args = fold_args(
        [_block((k, 5, h, w, couts[0]))] * 4
        + [_block((k, 5, h, w, couts[1]))] * 4,
        list(ga) + list(gb),
    )
    in_specs += [_full(), _full()]
    args += [taps_a, taps_b]
    out_shape = [jax.ShapeDtypeStruct((B, 5, h, w, cin), dtype)]
    out_specs = [_block((k, 5, h, w, cin))]
    if need_b:
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((1, cout), jnp.float32))
            out_specs.append(_acc_spec((1, cout)))
    flops = 2 * B * 5 * h * w * 4 * 7 * cin * sum(couts)
    outs = pl.pallas_call(
        dx_kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * dtype.itemsize * 5),
    )(*args)
    dx = outs[0]
    gsums = [o.reshape(-1) for o in outs[1:]] if need_b else None

    # dtaps: one kernel for both sets, accumulated across the batch grid.
    dt_kernel = functools.partial(
        _up_dtaps_kernel, h=h, w=w, k=k, corner_mode=corner_mode, n_sets=2,
        with_stats=fold, out_dtype=dtype,
    )
    in_specs, args = fold_args(
        [_block((k, 5, h, w, cin))]
        + [_block((k, 5, h, w, couts[0]))] * 4
        + [_block((k, 5, h, w, couts[1]))] * 4,
        [x] + list(ga) + list(gb),
    )
    out_shape = [jax.ShapeDtypeStruct((7, cin, c), jnp.float32) for c in couts]
    out_specs = [
        pl.BlockSpec((7, cin, c), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
        for c in couts
    ]
    dta, dtb = pl.pallas_call(
        dt_kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * 4),
    )(*args)

    dba = None if bias_a is None else gsums[0].astype(bias_a.dtype)
    dbb = None if bias_b is None else gsums[1].astype(bias_b.dtype)
    return dx, dta.astype(taps_a.dtype), dba, dtb.astype(taps_b.dtype), dbb


_upd.defvjp(_upd_fwd, _upd_bwd)


def fused_up_dual_conv(x, taps_a, bias_a, taps_b, bias_b,
                       corner_mode="average", with_stats=False,
                       fold_ok=True):
    """An UpBlock's upsample + both first convs, fused.

    x: standard level-s tensor (B, 5, h, w, C_in). Returns two 4-tuples of
    level-(s+1) phase tensors (B, 5, h, w, C_out) — one per tap set (plus a
    (2, C_out) [sum, sumsq] per set when with_stats). The upsampled tensor
    never reaches HBM; interleave the outputs with ops.phase.phase_merge
    after the block's remaining elementwise work.
    """
    ya, yb, sa, sb = _upd(x, taps_a, bias_a, taps_b, bias_b, corner_mode,
                          with_stats, fold_ok)
    return (ya, yb, sa, sb) if with_stats else (ya, yb)


# --------------------------- fused_up_dual_conv_pair -------------------------
#
# The phase-chain variant (GENICONET_PHASE_CHAIN): the previous UpBlock's
# residual tail never runs in XLA. Instead of a spatial level-s input, the
# kernel takes the previous block's RAW phase pairs (b0 from its second
# conv, y10 from its residual branch) plus the four pending BatchNorm
# affines, and computes the tail
#     x_p = relu(b0_p·mul1 + add1 + y10_p·mul2 + add2)      (per phase)
# followed by the interleave IN VMEM before the usual upsample + dual conv.
# This removes, per UpBlock boundary, the XLA join fusion, the phase_merge
# interleave, and the joined tensor's HBM round trip (round-4 trace:
# ~0.35 ms/step at the up1->up2 boundary alone). The join math and its
# backward are copied from the proven fused_pair_head prologue
# (_phead_fwd_kernel/_phead_bwd_kernel); the interleave is the exact
# inverse of the `_pick` parity split the stride-2 kernels already compile.


def _pair_join(a_ref_val, b_ref_val, mul1, add1, mul2, add2, cdtype):
    a32 = a_ref_val.astype(jnp.float32)
    b32 = b_ref_val.astype(jnp.float32)
    return jnp.maximum(a32 * mul1 + add1 + b32 * mul2 + add2, 0.0).astype(cdtype)


def _interleave4(phases, k, hp, wp):
    """4 level-s phases (k, 5, hp, wp, C) -> spatial (k, 5, 2hp, 2wp, C);
    the in-VMEM twin of ops/phase.phase_merge."""
    ee, eq, oo, oq = phases
    C = ee.shape[-1]
    even = jnp.stack([ee, eq], axis=4).reshape(k, 5, hp, 2 * wp, C)
    odd = jnp.stack([oo, oq], axis=4).reshape(k, 5, hp, 2 * wp, C)
    return jnp.stack([even, odd], axis=3).reshape(k, 5, 2 * hp, 2 * wp, C)


def _pair_build_x(refs0, k, hp, wp, cdtype):
    """Shared input parse for the pair kernels: 8 phase refs + 4 affine
    refs -> (joined phases list, interleaved spatial x)."""
    b0 = refs0[0:4]
    y10 = refs0[4:8]
    mul1, add1 = refs0[8][0], refs0[9][0]
    mul2, add2 = refs0[10][0], refs0[11][0]
    xp = [
        _pair_join(a[...], b[...], mul1, add1, mul2, add2, cdtype)
        for a, b in zip(b0, y10)
    ]
    return xp, _interleave4(xp, k, hp, wp)


def _up_pair_fwd_kernel(*refs, h, w, k, corner_mode, n_sets, out_dtype,
                        with_stats):
    """refs = b0(4), y10(4), mul1, add1, mul2, add2, n_sets×(taps, bias),
    then n_sets×4 phase outputs [+ n_sets stats accumulators]. h, w are the
    SPATIAL level-s dims (2·phase dims), as in _up_fwd_kernel."""
    _, x = _pair_build_x(refs[:12], k, h // 2, w // 2, out_dtype)
    idx = 12
    w_refs = [refs[idx + 2 * i] for i in range(n_sets)]
    b_refs = [refs[idx + 1 + 2 * i] for i in range(n_sets)]
    outs = refs[idx + 2 * n_sets : idx + 2 * n_sets + 4 * n_sets]
    stat_outs = refs[idx + 2 * n_sets + 4 * n_sets :]
    P = jnp.concatenate(
        [_build_padded(x[i], h, w, corner_mode) for i in range(k)], axis=0
    )
    phases = _upsample_phases(P, h, w)
    padded = _phase_pad_k(phases, k, h, w, corner_mode)
    results = _contract(padded, w_refs, b_refs, _ALL, h, w, k, out_dtype)
    i = 0
    for si, per_set in enumerate(results):
        for arr in per_set:
            outs[i][...] = arr
            i += 1
        if with_stats:
            part = _stats_partial(per_set)

            @pl.when(pl.program_id(0) == 0)
            def _(si=si):
                stat_outs[si][...] = jnp.zeros_like(stat_outs[si])

            stat_outs[si][...] += part


def _up_pair_dx_kernel(*refs, h, w, k, corner_mode, n_sets, out_dtype,
                       with_stats=False, emit_gsum=False):
    """The pair twin of _up_dx_kernel: after the conv/upsample/pad
    transposes produce the spatial dx, de-interleave it and push it through
    the residual tail's adjoint — emitting the 8 phase cotangents (db0_p =
    dpre·mul1, dy10_p = dpre·mul2, dpre = dx_p·relu-mask) plus the four
    affine-grad accumulators, exactly _phead_bwd_kernel's math."""
    g_groups, idx = _up_fold_groups(refs, 0, n_sets, with_stats, out_dtype)
    b0 = refs[idx : idx + 4]
    y10 = refs[idx + 4 : idx + 8]
    mul1, add1 = refs[idx + 8][0], refs[idx + 9][0]
    mul2, add2 = refs[idx + 10][0], refs[idx + 11][0]
    idx += 12
    w_refs = refs[idx : idx + n_sets]
    idx += n_sets
    db0 = refs[idx : idx + 4]
    dy10 = refs[idx + 4 : idx + 8]
    dm1_ref, da1_ref, dm2_ref, da2_ref = refs[idx + 8 : idx + 12]
    idx += 12
    gsum_refs = refs[idx:]
    cin = w_refs[0].shape[1]
    first = pl.program_id(0) == 0
    if emit_gsum:
        for si, g_set in enumerate(g_groups):
            part = sum(
                jnp.sum(g[...].astype(jnp.float32), axis=(0, 1, 2, 3))
                for g in g_set
            ).reshape(1, -1)

            @pl.when(first)
            def _(si=si):
                gsum_refs[si][...] = jnp.zeros_like(gsum_refs[si])

            gsum_refs[si][...] += part
    dpad = _dpad_accumulate(g_groups, w_refs, _ALL, h, w, k, cin)
    dphases = _phase_pad_transpose(dpad, k, h, w, corner_mode)
    dP = _upsample_transpose(dphases, h, w)
    dx = _pad_transpose(dP, h=h, w=w, corner_mode=corner_mode, k=k)
    dx = dx.reshape(k, 5, h, w, cin)  # fp32

    @pl.when(first)
    def _():
        dm1_ref[...] = jnp.zeros_like(dm1_ref)
        da1_ref[...] = jnp.zeros_like(da1_ref)
        dm2_ref[...] = jnp.zeros_like(dm2_ref)
        da2_ref[...] = jnp.zeros_like(da2_ref)

    # the tail adjoint runs on the FULL spatial grid (zero-offset layouts —
    # Mosaic rejects multi_reductions over parity-sliced operands), and the
    # phase cotangents de-interleave only at the final stores
    hp, wp = h // 2, w // 2
    a_sp = _interleave4([r[...].astype(jnp.float32) for r in b0], k, hp, wp)
    b_sp = _interleave4([r[...].astype(jnp.float32) for r in y10], k, hp, wp)
    pre = a_sp * mul1 + add1 + b_sp * mul2 + add2
    dpre = dx * (pre > 0.0).astype(jnp.float32)
    dm1_ref[...] += jnp.sum(dpre * a_sp, axis=(0, 1, 2, 3)).reshape(1, cin)
    da_sum = jnp.sum(dpre, axis=(0, 1, 2, 3)).reshape(1, cin)
    da1_ref[...] += da_sum
    dm2_ref[...] += jnp.sum(dpre * b_sp, axis=(0, 1, 2, 3)).reshape(1, cin)
    da2_ref[...] += da_sum  # Σdpre is shared by both affines
    dar = (dpre * mul1).astype(out_dtype).reshape(k, 5, hp, 2, wp, 2, cin)
    dbr = (dpre * mul2).astype(out_dtype).reshape(k, 5, hp, 2, wp, 2, cin)
    for p in range(4):
        db0[p][...] = dar[:, :, :, p >> 1, :, p & 1, :]
        dy10[p][...] = dbr[:, :, :, p >> 1, :, p & 1, :]


def _up_pair_dtaps_kernel(*refs, h, w, k, corner_mode, n_sets, out_dtype,
                          with_stats=False):
    """The pair twin of _up_dtaps_kernel: the joined input is rebuilt
    in-VMEM from the saved (b0, y10, affines) residuals."""
    _, x = _pair_build_x(refs[:12], k, h // 2, w // 2, out_dtype)
    g_groups, idx = _up_fold_groups(refs, 12, n_sets, with_stats, out_dtype)
    outs = refs[idx:]
    P = jnp.concatenate(
        [_build_padded(x[i], h, w, corner_mode) for i in range(k)], axis=0
    )
    phases = _upsample_phases(P, h, w)
    padded = _phase_pad_k(phases, k, h, w, corner_mode)
    _dtaps_accumulate(
        padded, g_groups, outs, _ALL, h, w, k, pl.program_id(0) == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _updp(b0, y10, mul1, add1, mul2, add2, taps_a, bias_a, taps_b, bias_b,
          corner_mode, with_stats, fold_ok=True):
    hp, wp = b0[0].shape[2], b0[0].shape[3]
    h, w = 2 * hp, 2 * wp
    B, cin = b0[0].shape[0], b0[0].shape[-1]
    dtype = b0[0].dtype
    tap_sets = [(taps_a, bias_a), (taps_b, bias_b)]
    couts = [t.shape[-1] for t, _ in tap_sets]
    # vs _up_conv_fwd_impl: +3·cin for the 8 phase inputs replacing x plus
    # the joined spatial temporary
    per_sample = 5 * h * w * (17 * cin + 4 * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    kernel = functools.partial(
        _up_pair_fwd_kernel, h=h, w=w, k=k, corner_mode=corner_mode,
        n_sets=2, out_dtype=dtype, with_stats=with_stats,
    )
    in_specs = [_block((k, 5, hp, wp, cin))] * 8 + [_block((1, cin))] * 4
    args = (list(b0) + list(y10)
            + [v.reshape(1, cin).astype(jnp.float32)
               for v in (mul1, add1, mul2, add2)])
    for taps, bias in tap_sets:
        in_specs += [_full(), _block((1, taps.shape[-1]))]
        args += [taps, _norm_bias(bias, taps.shape[-1], taps.dtype)]
    out_shape, out_specs = [], []
    for cout in couts:
        for _ in range(4):
            out_shape.append(jax.ShapeDtypeStruct((B, 5, h, w, cout), dtype))
            out_specs.append(_block((k, 5, h, w, cout)))
    if with_stats:
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((2, cout), jnp.float32))
            out_specs.append(_acc_spec((2, cout)))
    flops = 2 * B * 5 * h * w * 4 * 7 * cin * sum(couts)
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * dtype.itemsize * 5),
    )(*args)
    ya, yb = tuple(outs[0:4]), tuple(outs[4:8])
    sa, sb = (outs[8], outs[9]) if with_stats else (None, None)
    return ya, yb, sa, sb


def _updp_fwd(b0, y10, mul1, add1, mul2, add2, taps_a, bias_a, taps_b,
              bias_b, corner_mode, with_stats, fold_ok=True):
    ya, yb, sa, sb = _updp(b0, y10, mul1, add1, mul2, add2, taps_a, bias_a,
                           taps_b, bias_b, corner_mode, with_stats, fold_ok)
    res = (b0, y10, mul1, add1, mul2, add2, taps_a, bias_a, taps_b, bias_b,
           (ya, yb) if with_stats else None)
    return (ya, yb, sa, sb), res


def _updp_bwd(corner_mode, with_stats, fold_ok, res, g):
    (b0, y10, mul1, add1, mul2, add2, taps_a, bias_a, taps_b, bias_b,
     ys) = res
    ga, gb, gsa, gsb = g
    hp, wp = b0[0].shape[2], b0[0].shape[3]
    h, w = 2 * hp, 2 * wp
    B, cin = b0[0].shape[0], b0[0].shape[-1]
    dtype = b0[0].dtype
    couts = [taps_a.shape[-1], taps_b.shape[-1]]
    fold = with_stats and _kernel_geff_enabled("upd", fold_ok)
    if with_stats and not fold:
        ga = _stats_geff(ga, ys[0], gsa)
        gb = _stats_geff(gb, ys[1], gsb)
    need_b = bias_a is not None or bias_b is not None
    per_sample = 5 * h * w * (
        19 * cin + (8 if fold else 4) * sum(couts)) * 4
    k = _choose_k(B, per_sample, 5 * h * w)

    def fold_args(specs, args):
        if fold:
            specs += [_block((k, 5, h, w, couts[0]))] * 4
            specs += [_block((k, 5, h, w, couts[1]))] * 4
            args += list(ys[0]) + list(ys[1])
            for gs, cout in zip((gsa, gsb), couts):
                specs.append(_acc_spec((2, cout)))
                args.append(gs)
        return specs, args

    pair_args = (list(b0) + list(y10)
                 + [v.reshape(1, cin).astype(jnp.float32)
                    for v in (mul1, add1, mul2, add2)])
    pair_specs = [_block((k, 5, hp, wp, cin))] * 8 + [_block((1, cin))] * 4

    # dx kernel: conv/upsample/pad transposes + the residual-tail adjoint
    dx_kernel = functools.partial(
        _up_pair_dx_kernel, h=h, w=w, k=k, corner_mode=corner_mode, n_sets=2,
        out_dtype=dtype, with_stats=fold, emit_gsum=need_b,
    )
    in_specs, args = fold_args(
        [_block((k, 5, h, w, couts[0]))] * 4
        + [_block((k, 5, h, w, couts[1]))] * 4,
        list(ga) + list(gb),
    )
    in_specs += pair_specs
    args += pair_args
    in_specs += [_full(), _full()]
    args += [taps_a, taps_b]
    out_shape = [jax.ShapeDtypeStruct((B, 5, hp, wp, cin), dtype)] * 8
    out_specs = [_block((k, 5, hp, wp, cin))] * 8
    out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 4
    out_specs += [_acc_spec((1, cin))] * 4
    if need_b:
        for cout in couts:
            out_shape.append(jax.ShapeDtypeStruct((1, cout), jnp.float32))
            out_specs.append(_acc_spec((1, cout)))
    flops = 2 * B * 5 * h * w * 4 * 7 * cin * sum(couts)
    outs = pl.pallas_call(
        dx_kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * dtype.itemsize * 5),
    )(*args)
    db0, dy10 = tuple(outs[0:4]), tuple(outs[4:8])
    dm1 = outs[8].reshape(cin)
    da1 = outs[9].reshape(cin)
    dm2 = outs[10].reshape(cin)
    da2 = outs[11].reshape(cin)
    gsums = [o.reshape(-1) for o in outs[12:]] if need_b else None

    # dtaps kernel: rebuilds the joined input from the pair residuals
    dt_kernel = functools.partial(
        _up_pair_dtaps_kernel, h=h, w=w, k=k, corner_mode=corner_mode,
        n_sets=2, with_stats=fold, out_dtype=dtype,
    )
    in_specs, args = fold_args(
        [_block((k, 5, h, w, couts[0]))] * 4
        + [_block((k, 5, h, w, couts[1]))] * 4,
        list(ga) + list(gb),
    )
    in_specs = pair_specs + in_specs
    args = pair_args + args
    out_shape = [jax.ShapeDtypeStruct((7, cin, c), jnp.float32) for c in couts]
    out_specs = [
        pl.BlockSpec((7, cin, c), lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
        for c in couts
    ]
    dta, dtb = pl.pallas_call(
        dt_kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * 4),
    )(*args)

    dba = None if bias_a is None else gsums[0].astype(bias_a.dtype)
    dbb = None if bias_b is None else gsums[1].astype(bias_b.dtype)
    return (db0, dy10, dm1, da1, dm2, da2,
            dta.astype(taps_a.dtype), dba, dtb.astype(taps_b.dtype), dbb)


_updp.defvjp(_updp_fwd, _updp_bwd)


def fused_up_dual_conv_pair(b0, y10, affines, taps_a, bias_a, taps_b, bias_b,
                            corner_mode="average", with_stats=False,
                            fold_ok=True):
    """Phase-chain UpBlock front: previous block's residual tail + upsample
    + both first convs, fused. b0, y10: 4-tuples of level-s phase tensors
    (B, 5, hp, wp, C); affines: (mul1, add1, mul2, add2) fp32 (C,) — the
    previous block's pending bn01/bn10 applies. Returns the same structure
    as fused_up_dual_conv. The joined level-s tensor never exists in HBM."""
    mul1, add1, mul2, add2 = affines
    ya, yb, sa, sb = _updp(tuple(b0), tuple(y10), mul1, add1, mul2, add2,
                           taps_a, bias_a, taps_b, bias_b, corner_mode,
                           with_stats, fold_ok)
    return (ya, yb, sa, sb) if with_stats else (ya, yb)


def phase_chain_enabled(part: str = "dec") -> bool:
    """GENICONET_PHASE_CHAIN: '1' chains both halves, 'dec' only the
    decoder UpBlocks (pair-input upd), 'enc' only the encoder DownBlocks
    (phase-split ds2). Hardware verdict (env_sweep round-4j): the combined
    chain ran 1714 vs 2203 control — the in-VMEM parity reshuffles cost
    more than the XLA boundary glue they replace on this toolchain — so
    the default is OFF; the granular values exist to attribute the
    regression per half."""
    import os

    v = _exp_env("GENICONET_PHASE_CHAIN", "0")
    return v == "1" or v == part


# ------------------------------ fused_up_block ------------------------------
#
# A WHOLE UpBlock forward in ONE two-pass pallas_call (ROADMAP round-5
# item 1: inter-kernel serialization at BatchNorm block boundaries). The
# block's two kernels (upsample+dual-conv, then BN-apply+conv) are forced
# apart by BatchNorm: conv01's prologue needs bn00's affine, which needs
# conv00's GLOBAL batch moments. TPU grids are sequential and accumulator
# blocks persist across programs, so one kernel with grid = 2·(B/k) can run
# pass A (programs 0..G-1: upsample + both convs + stats accumulation) and
# pass B (programs G..2G-1: compute the bn00 affine IN-KERNEL from the
# accumulated (2, C) moments + gamma/beta, then conv01 with the
# BN-apply+ReLU prologue) — halving the block's kernel launches and
# removing the XLA affine glue + layout copies between them.
#
# y00 (conv00's output, conv01's input, and a backward residual) must cross
# the pass boundary through HBM (VMEM holds only k samples). It is emitted
# as a memory_space=ANY output written by explicit DMA in pass A and read
# back by explicit DMA in pass B — manual semaphores, so the A→B ordering
# is defined behavior, not a bet on Mosaic's pipelining depth.
#
# The BACKWARD is exactly today's program: the custom VJP recomposes
# `_pcs1_bwd` (conv01) and `_upd_bwd` (upsample+dual-conv) on the merged
# kernel's residuals, with the bn00 affine chain (d_gamma, d_beta, and the
# moments cotangent) as (C,)-sized XLA math between them. Under shard_map
# data parallelism the affine needs a cross-replica pmean between the
# passes, which cannot ride inside one kernel — callers gate the merged
# path off when axis_name is set (layers.UpBlock).


def _up_block_kernel(*refs, h, w, k, G, corner_mode, out_dtype, c0, c0p, eps,
                     count):
    (x_ref, t00_ref, b00_ref, t10_ref, b10_ref, t01_ref, b01_ref,
     gam_ref, bet_ref) = refs[:9]
    y10_refs = refs[9:13]
    b0_refs = refs[13:17]
    y00_any = refs[17:21]
    s00_ref, s10_ref, s01_ref = refs[21], refs[22], refs[23]
    mul_ref, add_ref = refs[24], refs[25]
    stage = refs[26:30]
    sems = refs[30]
    p = pl.program_id(0)

    @pl.when(p < G)
    def _pass_a():
        P = jnp.concatenate(
            [_build_padded(x_ref[i], h, w, corner_mode) for i in range(k)],
            axis=0,
        )
        phases = _upsample_phases(P, h, w)
        padded = _phase_pad_k(phases, k, h, w, corner_mode)
        ya, yb = _contract(
            padded, [t00_ref, t10_ref], [b00_ref, b10_ref], _ALL, h, w, k,
            out_dtype,
        )
        # the cross-pass HBM buffer is lane-padded to c0p (a 128 multiple):
        # Mosaic rejects sliced DMAs on HBM memrefs whose lane dim is below
        # the (8,128) tile, which is exactly up2's c0=64 — write into the
        # low lanes of the padded stage and DMA full tiles
        for i in range(4):
            if c0p == c0:
                stage[i][...] = ya[i]
            else:
                stage[i][:, :, :, :, 0:c0] = ya[i]
        cps = [
            pltpu.make_async_copy(
                stage[i], y00_any[i].at[pl.ds(p * k, k)], sems.at[i]
            )
            for i in range(4)
        ]
        for c in cps:
            c.start()
        for i in range(4):
            y10_refs[i][...] = yb[i]

        @pl.when(p == 0)
        def _():
            s00_ref[...] = jnp.zeros_like(s00_ref)
            s10_ref[...] = jnp.zeros_like(s10_ref)

        s00_ref[...] += _stats_partial(ya)
        s10_ref[...] += _stats_partial(yb)
        for c in cps:
            c.wait()

    @pl.when(p >= G)
    def _pass_b():
        # bn00 affine from the pass-A moments — _StatsBN's exact formula
        # (nn/layers.py:193-209, single-replica branch)
        s = s00_ref[0]
        mean = s / count
        var = jnp.maximum(0.0, s00_ref[1] / count - mean * mean)
        mul = jax.lax.rsqrt(var + eps) * gam_ref[0]
        add = bet_ref[0] - mean * mul

        @pl.when(p == G)
        def _():
            mul_ref[...] = mul.reshape(1, -1)
            add_ref[...] = add.reshape(1, -1)

        cps = [
            pltpu.make_async_copy(
                y00_any[i].at[pl.ds((p - G) * k, k)], stage[i], sems.at[i]
            )
            for i in range(4)
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        phases = tuple(
            _act_apply(
                stage[i][:, :, :, :, 0:c0].reshape(k * 5, h, w, c0), mul, add
            )
            for i in range(4)
        )
        padded = _phase_pad_k(phases, k, h, w, corner_mode)
        (b0s,) = _contract(
            padded, [t01_ref], [b01_ref], _ALL, h, w, k, out_dtype
        )
        for i in range(4):
            b0_refs[i][...] = b0s[i]

        @pl.when(p == G)
        def _():
            s01_ref[...] = jnp.zeros_like(s01_ref)

        s01_ref[...] += _stats_partial(b0s)


def _up_block_fwd_impl(x, t00, b00, t10, b10, t01, b01, gamma, beta,
                       corner_mode, eps):
    B = x.shape[0]
    h, w = x.shape[2], x.shape[3]
    cin = x.shape[-1]
    dtype = x.dtype
    c0, c1, c2 = t00.shape[-1], t10.shape[-1], t01.shape[-1]
    c0p = -(-c0 // 128) * 128  # lane-tile-aligned cross-pass buffer (up2: 64->128)
    count = 4.0 * B * 5 * h * w
    per_sample = 5 * h * w * (
        14 * cin + 4 * (c0 + c1) + 14 * c0 + 4 * (c0p - c0) + 4 * c2) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    G = B // k
    kernel = functools.partial(
        _up_block_kernel, h=h, w=w, k=k, G=G, corner_mode=corner_mode,
        out_dtype=dtype, c0=c0, c0p=c0p, eps=eps, count=count,
    )
    a_idx = lambda p, nd: (jnp.minimum(p, G - 1),) + (0,) * (nd - 1)
    b_idx = lambda p, nd: (jnp.maximum(p - G, 0),) + (0,) * (nd - 1)
    in_specs = [
        pl.BlockSpec((k, 5, h, w, cin), lambda p: a_idx(p, 5),
                     memory_space=pltpu.VMEM),
        _full(), _block((1, c0)), _full(), _block((1, c1)),
        _full(), _block((1, c2)),
        _block((1, c0)), _block((1, c0)),
    ]
    args = [
        x, t00, _norm_bias(b00, c0, t00.dtype), t10,
        _norm_bias(b10, c1, t10.dtype), t01, _norm_bias(b01, c2, t01.dtype),
        gamma.reshape(1, c0).astype(jnp.float32),
        beta.reshape(1, c0).astype(jnp.float32),
    ]
    out_shape = (
        [jax.ShapeDtypeStruct((B, 5, h, w, c1), dtype)] * 4    # y10
        + [jax.ShapeDtypeStruct((B, 5, h, w, c2), dtype)] * 4  # b0
        + [jax.ShapeDtypeStruct((B, 5, h, w, c0p), dtype)] * 4  # y00 (ANY)
        + [jax.ShapeDtypeStruct((2, c0), jnp.float32),
           jax.ShapeDtypeStruct((2, c1), jnp.float32),
           jax.ShapeDtypeStruct((2, c2), jnp.float32)]
        + [jax.ShapeDtypeStruct((1, c0), jnp.float32)] * 2     # mul00, add00
    )
    out_specs = (
        [pl.BlockSpec((k, 5, h, w, c1), lambda p: a_idx(p, 5),
                      memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((k, 5, h, w, c2), lambda p: b_idx(p, 5),
                        memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [_acc_spec((2, c0)), _acc_spec((2, c1)), _acc_spec((2, c2))]
        + [_acc_spec((1, c0))] * 2
    )
    flops = 2 * B * 5 * h * w * 4 * 7 * cin * (c0 + c1) \
        + 2 * B * 5 * h * w * 4 * 7 * c0 * c2
    outs = pl.pallas_call(
        kernel,
        grid=(2 * G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((k, 5, h, w, c0p), dtype)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
        **_params(flops, B * 5 * h * w * (cin + 3 * c0) * dtype.itemsize * 4),
    )(*args)
    y10 = tuple(outs[0:4])
    b0 = tuple(outs[4:8])
    y00 = tuple(
        o if c0p == c0 else o[..., :c0] for o in outs[8:12]
    )
    s00, s10, s01 = outs[12], outs[13], outs[14]
    mul00, add00 = outs[15].reshape(-1), outs[16].reshape(-1)
    return b0, y10, y00, s00, s01, s10, mul00, add00


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _upblk(x, t00, b00, t10, b10, t01, b01, gamma, beta,
           corner_mode, fold_ok, fold_site, eps):
    b0, y10, _, s00, s01, s10, _, _ = _up_block_fwd_impl(
        x, t00, b00, t10, b10, t01, b01, gamma, beta, corner_mode, eps)
    return b0, y10, s00, s01, s10


def _upblk_fwd(x, t00, b00, t10, b10, t01, b01, gamma, beta,
               corner_mode, fold_ok, fold_site, eps):
    b0, y10, y00, s00, s01, s10, mul00, add00 = _up_block_fwd_impl(
        x, t00, b00, t10, b10, t01, b01, gamma, beta, corner_mode, eps)
    res = (x, t00, b00, t10, b10, t01, b01, gamma, beta,
           y00, y10, b0, s00, mul00, add00)
    return (b0, y10, s00, s01, s10), res


def _upblk_bwd(corner_mode, fold_ok, fold_site, eps, res, g):
    (x, t00, b00, t10, b10, t01, b01, gamma, beta,
     y00, y10, b0, s00, mul00, add00) = res
    g_b0, g_y10, g_s00, g_s01, g_s10 = g
    # conv01 backward — today's pcs1 program, bit for bit
    d_y00, dt01, db01, dmul, dadd = _pcs1_bwd(
        corner_mode, True, True, fold_ok, fold_site,
        (y00, t01, b01, mul00, add00, b0), (g_b0, g_s01),
    )
    # bn00 affine chain: (C,)-sized XLA math (the _StatsBN formula)
    B, h, w = x.shape[0], x.shape[2], x.shape[3]
    count = 4.0 * B * 5 * h * w

    def _affine(s, gam, bet):
        mean = s[0] / count
        var = jnp.maximum(0.0, s[1] / count - mean * mean)
        mul = jax.lax.rsqrt(var + eps) * gam
        return mul, bet - mean * mul

    _, aff_vjp = jax.vjp(_affine, s00, gamma, beta)
    d_s00_aff, d_gamma, d_beta = aff_vjp(
        (dmul.reshape(-1).astype(jnp.float32),
         dadd.reshape(-1).astype(jnp.float32))
    )
    gs00 = d_s00_aff + g_s00
    # upsample + dual-conv backward — today's upd program, bit for bit
    dx, dt00, db00, dt10, db10 = _upd_bwd(
        corner_mode, True, fold_ok,
        (x, t00, b00, t10, b10, (y00, y10)),
        (d_y00, g_y10, gs00, g_s10),
    )
    return (dx, dt00, db00, dt10, db10, dt01, db01,
            d_gamma.astype(gamma.dtype), d_beta.astype(beta.dtype))


_upblk.defvjp(_upblk_fwd, _upblk_bwd)


def merged_block_enabled(site: str) -> bool:
    """GENICONET_MERGED_BLOCK routing for the two-pass block kernels:
    '' / '0' off (default until hardware-validated), '1' / 'all'
    everywhere, or a comma list of block names ('up0,up1')."""
    import os

    v = _exp_env("GENICONET_MERGED_BLOCK", "0")
    if v in ("", "0"):
        return False
    if v in ("1", "all"):
        return True
    return site in {t.strip() for t in v.split(",")}


def fused_up_block(x, t00, b00, t10, b10, t01, b01, gamma, beta,
                   corner_mode="average", fold_ok=True, fold_site="",
                   eps=1e-5):
    """A whole UpBlock forward (train mode) in ONE two-pass kernel.

    x: standard level-s tensor (B, 5, h, w, C_in); taps/biases of the
    block's three convs; gamma/beta = bn00's fp32 scale/bias (the affine is
    computed in-kernel from the pass-A batch moments — single-replica
    statistics only; gate off under a data-parallel axis_name).

    Returns (b0 4-phase tuple, y10 4-phase tuple, s00, s01, s10) — the same
    contract as fused_up_dual_conv + bn00 affine + fused_phase_conv_s1,
    with identical backward programs (see _upblk_bwd)."""
    return _upblk(x, t00, b00, t10, b10, t01, b01, gamma, beta,
                  corner_mode, fold_ok, fold_site, eps)


# ----------------------------- fused_down_block -----------------------------
#
# The DownBlock mirror of fused_up_block: a whole residual down block
# forward (reference BasicIcoS2SDownBlock, models.py:22-40) in ONE two-pass
# pallas_call. Pass A (programs 0..G-1) runs both stride-2 convs off the
# shared phase halo (the fused_dual_s2_conv program) + stats accumulation,
# staging conv00's output y00 to an ANY-space HBM buffer by explicit DMA;
# pass B (programs G..2G-1) computes bn00's affine in-kernel from the
# accumulated (2, C) moments, DMAs y00 back, and runs conv01 (stride-1 at
# level s-1) in SPATIAL form — the same 7-tap masked-3×3 program as
# conv_kernel._kernel, which is what the unmerged DownBlock's conv01 uses.
# The backward recomposes the two existing VJP programs (conv_kernel._bwd
# for conv01, _ds2_bwd for the dual stride-2) around the (C,)-sized affine
# chain, exactly like _upblk_bwd.


def _dn_block_kernel(*refs, h, w, k, G, corner_mode, out_dtype, c0, c0p,
                     eps, count, has_act):
    phase_refs = refs[:4]
    idx = 4
    if has_act:
        in_mul_ref, in_add_ref = refs[4], refs[5]
        idx = 6
    (t00_ref, b00_ref, t10_ref, b10_ref, t01_ref, b01_ref,
     gam_ref, bet_ref) = refs[idx : idx + 8]
    idx += 8
    y10_ref, b0_ref, y00_any = refs[idx], refs[idx + 1], refs[idx + 2]
    s00_ref, s10_ref, s01_ref = refs[idx + 3], refs[idx + 4], refs[idx + 5]
    mul_ref, add_ref = refs[idx + 6], refs[idx + 7]
    stage = refs[idx + 8]
    sem = refs[idx + 9]
    p = pl.program_id(0)

    @pl.when(p < G)
    def _pass_a():
        cin = phase_refs[0].shape[-1]
        phases = tuple(r[...].reshape(k * 5, h, w, cin) for r in phase_refs)
        if has_act:
            phases = tuple(
                _act_apply(ph, in_mul_ref[0], in_add_ref[0]) for ph in phases
            )
        padded = _phase_pad_k(phases, k, h, w, corner_mode)
        res = _contract(
            padded, [t00_ref, t10_ref], [b00_ref, b10_ref], (2,), h, w, k,
            out_dtype,
        )
        y00, y10 = res[0][0], res[1][0]
        # lane-tile-aligned cross-pass buffer (see fused_up_block): HBM
        # memref slices need a 128-multiple lane dim
        if c0p == c0:
            stage[...] = y00
        else:
            stage[:, :, :, :, 0:c0] = y00
        cp = pltpu.make_async_copy(stage, y00_any.at[pl.ds(p * k, k)], sem)
        cp.start()
        y10_ref[...] = y10

        @pl.when(p == 0)
        def _():
            s00_ref[...] = jnp.zeros_like(s00_ref)
            s10_ref[...] = jnp.zeros_like(s10_ref)

        s00_ref[...] += _stats_partial([y00])
        s10_ref[...] += _stats_partial([y10])
        cp.wait()

    @pl.when(p >= G)
    def _pass_b():
        # bn00 affine from the pass-A moments (_StatsBN's exact formula)
        s = s00_ref[0]
        mean = s / count
        var = jnp.maximum(0.0, s00_ref[1] / count - mean * mean)
        mul = jax.lax.rsqrt(var + eps) * gam_ref[0]
        add = bet_ref[0] - mean * mul

        @pl.when(p == G)
        def _():
            mul_ref[...] = mul.reshape(1, -1)
            add_ref[...] = add.reshape(1, -1)

        cp = pltpu.make_async_copy(y00_any.at[pl.ds((p - G) * k, k)], stage,
                                   sem)
        cp.start()
        cp.wait()
        yact = _act_apply(stage[:, :, :, :, 0:c0], mul, add)
        from geniconet_tpu.ops.conv import HEX_TAP_OFFSETS

        P = jnp.concatenate(
            [_build_padded(yact[i], h, w, corner_mode) for i in range(k)],
            axis=0,
        )  # (k*5, h+2, w+2, c0)
        rows = k * 5 * h * w
        c2 = t01_ref.shape[-1]
        acc = jnp.zeros((rows, c2), jnp.float32)
        for t, (di, dj) in enumerate(HEX_TAP_OFFSETS):
            sl = P[:, 1 + di : 1 + di + h, 1 + dj : 1 + dj + w, :]
            acc += jnp.dot(sl.reshape(rows, c0), t01_ref[t],
                           preferred_element_type=jnp.float32)
        acc += b01_ref[0].astype(jnp.float32)
        b0 = acc.reshape(k, 5, h, w, c2).astype(out_dtype)
        b0_ref[...] = b0

        @pl.when(p == G)
        def _():
            s01_ref[...] = jnp.zeros_like(s01_ref)

        s01_ref[...] += _stats_partial([b0])


def _dn_block_fwd_impl(xp, t00, b00, t10, b10, t01, b01, gamma, beta,
                       in_mul, in_add, corner_mode, eps):
    B = xp[0].shape[0]
    h, w = xp[0].shape[2], xp[0].shape[3]
    cin = xp[0].shape[-1]
    dtype = xp[0].dtype
    c0, c1, c2 = t00.shape[-1], t10.shape[-1], t01.shape[-1]
    c0p = -(-c0 // 128) * 128
    count = 1.0 * B * 5 * h * w  # stride-2 output: ONE phase per position
    has_act = in_mul is not None
    per_sample = 5 * h * w * (
        20 * cin + 4 * (c0p + c1) + 14 * c0 + 8 * c2) * 4
    k = _choose_k(B, per_sample, 5 * h * w)
    G = B // k
    kernel = functools.partial(
        _dn_block_kernel, h=h, w=w, k=k, G=G, corner_mode=corner_mode,
        out_dtype=dtype, c0=c0, c0p=c0p, eps=eps, count=count,
        has_act=has_act,
    )
    a_idx = lambda p, nd: (jnp.minimum(p, G - 1),) + (0,) * (nd - 1)
    b_idx = lambda p, nd: (jnp.maximum(p - G, 0),) + (0,) * (nd - 1)
    in_specs = [
        pl.BlockSpec((k, 5, h, w, cin), lambda p: a_idx(p, 5),
                     memory_space=pltpu.VMEM)
    ] * 4
    args = list(xp)
    if has_act:
        in_specs += [_block((1, cin))] * 2
        args += [in_mul.reshape(1, cin).astype(jnp.float32),
                 in_add.reshape(1, cin).astype(jnp.float32)]
    in_specs += [
        _full(), _block((1, c0)), _full(), _block((1, c1)),
        _full(), _block((1, c2)),
        _block((1, c0)), _block((1, c0)),
    ]
    args += [
        t00, _norm_bias(b00, c0, t00.dtype), t10,
        _norm_bias(b10, c1, t10.dtype), t01, _norm_bias(b01, c2, t01.dtype),
        gamma.reshape(1, c0).astype(jnp.float32),
        beta.reshape(1, c0).astype(jnp.float32),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, 5, h, w, c1), dtype),   # y10
        jax.ShapeDtypeStruct((B, 5, h, w, c2), dtype),   # b0
        jax.ShapeDtypeStruct((B, 5, h, w, c0p), dtype),  # y00 (ANY)
        jax.ShapeDtypeStruct((2, c0), jnp.float32),
        jax.ShapeDtypeStruct((2, c1), jnp.float32),
        jax.ShapeDtypeStruct((2, c2), jnp.float32),
        jax.ShapeDtypeStruct((1, c0), jnp.float32),      # mul00
        jax.ShapeDtypeStruct((1, c0), jnp.float32),      # add00
    ]
    out_specs = [
        pl.BlockSpec((k, 5, h, w, c1), lambda p: a_idx(p, 5),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, 5, h, w, c2), lambda p: b_idx(p, 5),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        _acc_spec((2, c0)), _acc_spec((2, c1)), _acc_spec((2, c2)),
        _acc_spec((1, c0)), _acc_spec((1, c0)),
    ]
    flops = 2 * B * 5 * h * w * 7 * (cin * (c0 + c1) + c0 * c2)
    outs = pl.pallas_call(
        kernel,
        grid=(2 * G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((k, 5, h, w, c0p), dtype),
                        pltpu.SemaphoreType.DMA],
        **_params(flops, B * 5 * h * w * (4 * cin + 3 * c0 + c1 + c2)
                  * dtype.itemsize),
    )(*args)
    y10, b0 = outs[0], outs[1]
    y00 = outs[2] if c0p == c0 else outs[2][..., :c0]
    s00, s10, s01 = outs[3], outs[4], outs[5]
    mul00, add00 = outs[6].reshape(-1), outs[7].reshape(-1)
    return b0, y10, y00, s00, s01, s10, mul00, add00


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _dnblk(xp, t00, b00, t10, b10, t01, b01, gamma, beta, in_mul, in_add,
           corner_mode, fold_ok, s_in, eps):
    b0, y10, _, s00, s01, s10, _, _ = _dn_block_fwd_impl(
        xp, t00, b00, t10, b10, t01, b01, gamma, beta, in_mul, in_add,
        corner_mode, eps)
    return b0, y10, s00, s01, s10


def _dnblk_fwd(xp, t00, b00, t10, b10, t01, b01, gamma, beta, in_mul,
               in_add, corner_mode, fold_ok, s_in, eps):
    b0, y10, y00, s00, s01, s10, mul00, add00 = _dn_block_fwd_impl(
        xp, t00, b00, t10, b10, t01, b01, gamma, beta, in_mul, in_add,
        corner_mode, eps)
    res = (xp, t00, b00, t10, b10, t01, b01, gamma, beta, in_mul, in_add,
           y00, y10, b0, s00, mul00, add00)
    return (b0, y10, s00, s01, s10), res


def _dnblk_bwd(corner_mode, fold_ok, s_in, eps, res, g):
    (xp, t00, b00, t10, b10, t01, b01, gamma, beta, in_mul, in_add,
     y00, y10, b0, s00, mul00, add00) = res
    g_b0, g_y10, g_s00, g_s01, g_s10 = g
    from geniconet_tpu.ops.pallas import conv_kernel as _ck

    # conv01 backward — the spatial conv's program, bit for bit
    d_y00, dt01, db01, dmul, dadd = _ck._bwd(
        s_in - 1, corner_mode, 1, True,
        (y00, t01, b01, mul00, add00, b0), (g_b0, g_s01),
    )
    # bn00 affine chain: (C,)-sized XLA math (the _StatsBN formula)
    B, h, w = y00.shape[0], y00.shape[2], y00.shape[3]
    count = 1.0 * B * 5 * h * w

    def _affine(s, gam, bet):
        mean = s[0] / count
        var = jnp.maximum(0.0, s[1] / count - mean * mean)
        mul = jax.lax.rsqrt(var + eps) * gam
        return mul, bet - mean * mul

    _, aff_vjp = jax.vjp(_affine, s00, gamma, beta)
    d_s00_aff, d_gamma, d_beta = aff_vjp(
        (dmul.reshape(-1).astype(jnp.float32),
         dadd.reshape(-1).astype(jnp.float32))
    )
    gs00 = d_s00_aff + g_s00
    # dual stride-2 backward — today's ds2 program, bit for bit
    dxp, dt00, db00, dt10, db10, dmul_in, dadd_in = _ds2_bwd(
        corner_mode, True, fold_ok,
        (tuple(xp), t00, b00, t10, b10, in_mul, in_add, (y00, y10)),
        (d_y00, g_y10, gs00, g_s10),
    )
    return (dxp, dt00, db00, dt10, db10, dt01, db01,
            d_gamma.astype(gamma.dtype), d_beta.astype(beta.dtype),
            dmul_in, dadd_in)


_dnblk.defvjp(_dnblk_fwd, _dnblk_bwd)


def fused_down_block(xp, t00, b00, t10, b10, t01, b01, gamma, beta,
                     s_in, in_act=None, corner_mode="average", fold_ok=True,
                     eps=1e-5):
    """A whole DownBlock forward (train mode) in ONE two-pass kernel.

    xp: 4 parity phases of the level-s_in input, each (B, 5, h, w, C_in);
    taps/biases of the block's three convs; gamma/beta = bn00's fp32
    scale/bias (affine computed in-kernel from pass-A batch moments —
    single-replica statistics; gate off under a data-parallel axis_name);
    in_act: optional pending (mul, add) BN-apply+ReLU prologue from the
    producing layer.

    Returns (b0, y10, s00, s01, s10) with b0/y10 standard level-(s_in - 1)
    grids — the same contract as fused_dual_s2_conv + bn00 affine +
    IcoConvS2S(conv01, act), with identical backward programs."""
    mul, add = in_act if in_act is not None else (None, None)
    return _dnblk(tuple(xp), t00, b00, t10, b10, t01, b01, gamma, beta,
                  mul, add, corner_mode, fold_ok, s_in, eps)


# ----------------------------- fused_pair_head ------------------------------
#
# The decoder's last UpBlock tail + 1x1 head + tanh in ONE kernel, in phase
# form. XLA previously paid, per step: the two-affine add+ReLU fused with the
# 64-channel interleave (~0.3 ms), the head dot, the tanh, and — on backward —
# three elementwise passes rebuilding the 8 phase cotangents plus the affine
# grads (~1.2 ms total at bs36, round-3 trace). Here the 64-channel tensor
# never re-interleaves in HBM: the kernel consumes the 8 raw phase tensors
# (b0 from the block's second conv, y10 from the residual branch) plus the
# four pending BatchNorm affines, computes
#     t = relu(b0*mul1 + add1 + y10*mul2 + add2)       (the block tail)
#     out = tanh(t @ W + b)                            (reference models.py:151-155)
# and emits the four 3-channel output phases; XLA interleaves those (24x less
# data). The backward kernel recomputes t in VMEM and emits the 8 phase
# cotangents, the affine grads, and dW/db in one pass.


def _phead_fwd_kernel(*refs, h, w, k, cin, F, cdtype):
    b0 = refs[0:4]
    y10 = refs[4:8]
    mul1, add1, mul2, add2 = refs[8][0], refs[9][0], refs[10][0], refs[11][0]
    Wh, bh = refs[12], refs[13]
    outs = refs[14:18]
    n = k * 5
    rows = n * h * w
    for o_ref, a_ref, b_ref in zip(outs, b0, y10):
        a32 = a_ref[...].reshape(n, h, w, cin).astype(jnp.float32)
        b32 = b_ref[...].reshape(n, h, w, cin).astype(jnp.float32)
        t = jnp.maximum(a32 * mul1 + add1 + b32 * mul2 + add2, 0.0).astype(cdtype)
        z = jnp.dot(t.reshape(rows, cin), Wh[...],
                    preferred_element_type=jnp.float32)
        z = z + bh[0].astype(jnp.float32)
        # match the XLA path's Dense(dtype) downcast before the fp32 tanh
        z = z.astype(cdtype).astype(jnp.float32)
        o_ref[...] = jnp.tanh(z).reshape(k, 5, h, w, F)


def _phead_bwd_kernel(*refs, h, w, k, cin, F, cdtype, out_dtype):
    g_refs = refs[0:4]
    b0 = refs[4:8]
    y10 = refs[8:12]
    mul1, add1, mul2, add2 = refs[12][0], refs[13][0], refs[14][0], refs[15][0]
    Wh, bh = refs[16], refs[17]
    db0 = refs[18:22]
    dy10 = refs[22:26]
    dW_ref, dbh_ref = refs[26], refs[27]
    dm1_ref, da1_ref, dm2_ref, da2_ref = refs[28], refs[29], refs[30], refs[31]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dW_ref[...] = jnp.zeros_like(dW_ref)
        dbh_ref[...] = jnp.zeros_like(dbh_ref)
        dm1_ref[...] = jnp.zeros_like(dm1_ref)
        da1_ref[...] = jnp.zeros_like(da1_ref)
        dm2_ref[...] = jnp.zeros_like(dm2_ref)
        da2_ref[...] = jnp.zeros_like(da2_ref)

    n = k * 5
    rows = n * h * w
    W32 = Wh[...].astype(jnp.float32)
    dW_p = jnp.zeros((cin, F), jnp.float32)
    dbh_p = jnp.zeros((F,), jnp.float32)
    dm1_p = jnp.zeros((cin,), jnp.float32)
    da1_p = jnp.zeros((cin,), jnp.float32)
    dm2_p = jnp.zeros((cin,), jnp.float32)
    for g_ref, a_ref, b_ref, o_a, o_b in zip(g_refs, b0, y10, db0, dy10):
        a32 = a_ref[...].reshape(n, h, w, cin).astype(jnp.float32)
        b32 = b_ref[...].reshape(n, h, w, cin).astype(jnp.float32)
        pre = a32 * mul1 + add1 + b32 * mul2 + add2
        t = jnp.maximum(pre, 0.0).astype(cdtype)
        tm = t.reshape(rows, cin)
        z = jnp.dot(tm, Wh[...], preferred_element_type=jnp.float32)
        z = (z + bh[0].astype(jnp.float32)).astype(cdtype).astype(jnp.float32)
        out = jnp.tanh(z)
        g = g_ref[...].reshape(rows, F).astype(jnp.float32)
        dz = g * (1.0 - out * out)
        dbh_p += jnp.sum(dz, axis=0)
        dW_p += jax.lax.dot_general(
            tm.astype(jnp.float32), dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dt = jax.lax.dot_general(
            dz, W32,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(n, h, w, cin)
        dm = dt * (pre > 0.0).astype(jnp.float32)
        o_a[...] = (dm * mul1).reshape(k, 5, h, w, cin).astype(out_dtype)
        o_b[...] = (dm * mul2).reshape(k, 5, h, w, cin).astype(out_dtype)
        dm1_p += jnp.sum(dm * a32, axis=(0, 1, 2))
        da1_p += jnp.sum(dm, axis=(0, 1, 2))
        dm2_p += jnp.sum(dm * b32, axis=(0, 1, 2))
    dW_ref[...] += dW_p
    dbh_ref[...] += dbh_p.reshape(1, F)
    dm1_ref[...] += dm1_p.reshape(1, cin)
    da1_ref[...] += da1_p.reshape(1, cin)
    dm2_ref[...] += dm2_p.reshape(1, cin)
    da2_ref[...] += da1_p.reshape(1, cin)  # Σdm is shared by both affines


def _head_k(B, h, w, cin, F, fwd, extra_per_cell_bytes=0):
    """Samples per program for the head kernels. These are tiny-matmul,
    bandwidth-bound programs — per-program overhead dominates at k=1 (36
    programs cost ~0.5 ms at bs36) — but every buffer is LANE-PADDED to 128
    in VMEM (the F=3 outputs 42x, the 64-ch phases 2x), so the estimate must
    use padded channel counts (measured 18.75MB/sample at up2 shapes; a
    k=6 program hit Mosaic's 100MB scoped-vmem stack limit).
    extra_per_cell_bytes: additional per-grid-cell VMEM for kernel variants
    with more resident buffers (the MSE head's lane-padded packed target)."""
    del F  # everything pads to the 128-lane tile anyway
    cells = 5 * h * w
    cpad = max(cin, 128)
    if fwd:
        # 8 input phases bf16 + ~4 fp32 temporaries + 4 padded fp32 outs
        per = cells * (8 * cpad * 2 + 4 * cpad * 4 + 4 * 128 * 4)
    else:
        # + 4 padded g inputs, 8 bf16 grad outputs, ~6 fp32 temporaries
        per = cells * (16 * cpad * 2 + 6 * cpad * 4 + 4 * 128 * 4)
    per = int((per + cells * extra_per_cell_bytes) * 1.25)
    k_mem = max(1, (72 * 1024 * 1024) // per)
    for k in range(min(k_mem, B), 0, -1):
        if B % k == 0:
            return k
    return 1


@jax.custom_vjp
def _phead(b0, y10, mul1, add1, mul2, add2, Wh, bh):
    h, w = b0[0].shape[2], b0[0].shape[3]
    B, cin = b0[0].shape[0], b0[0].shape[-1]
    F = Wh.shape[-1]
    cdtype = b0[0].dtype
    k = _head_k(B, h, w, cin, F, fwd=True)
    kernel = functools.partial(
        _phead_fwd_kernel, h=h, w=w, k=k, cin=cin, F=F, cdtype=cdtype
    )
    in_specs = [_block((k, 5, h, w, cin))] * 8
    in_specs += [_block((1, cin))] * 4
    in_specs += [_full(), _block((1, F))]
    args = (
        list(b0) + list(y10)
        + [v.reshape(1, cin).astype(jnp.float32) for v in (mul1, add1, mul2, add2)]
        + [Wh, bh.reshape(1, F)]
    )
    out_shape = [jax.ShapeDtypeStruct((B, 5, h, w, F), jnp.float32)] * 4
    out_specs = [_block((k, 5, h, w, F))] * 4
    flops = 2 * B * 5 * h * w * 4 * cin * F
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * cdtype.itemsize * 8),
    )(*args)
    return tuple(outs)


def _phead_fwd(b0, y10, mul1, add1, mul2, add2, Wh, bh):
    outs = _phead(b0, y10, mul1, add1, mul2, add2, Wh, bh)
    return outs, (b0, y10, mul1, add1, mul2, add2, Wh, bh)


def _phead_bwd(res, g):
    b0, y10, mul1, add1, mul2, add2, Wh, bh = res
    h, w = b0[0].shape[2], b0[0].shape[3]
    B, cin = b0[0].shape[0], b0[0].shape[-1]
    F = Wh.shape[-1]
    cdtype = b0[0].dtype
    k = _head_k(B, h, w, cin, F, fwd=False)
    kernel = functools.partial(
        _phead_bwd_kernel, h=h, w=w, k=k, cin=cin, F=F, cdtype=cdtype,
        out_dtype=cdtype,
    )
    in_specs = [_block((k, 5, h, w, F))] * 4
    in_specs += [_block((k, 5, h, w, cin))] * 8
    in_specs += [_block((1, cin))] * 4
    in_specs += [_full(), _block((1, F))]
    args = (
        list(g) + list(b0) + list(y10)
        + [v.reshape(1, cin).astype(jnp.float32) for v in (mul1, add1, mul2, add2)]
        + [Wh, bh.reshape(1, F)]
    )
    out_shape = [jax.ShapeDtypeStruct((B, 5, h, w, cin), cdtype)] * 8
    out_specs = [_block((k, 5, h, w, cin))] * 8
    out_shape += [
        jax.ShapeDtypeStruct((cin, F), jnp.float32),
        jax.ShapeDtypeStruct((1, F), jnp.float32),
    ]
    out_specs += [_acc_spec((cin, F)), _acc_spec((1, F))]
    out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 4
    out_specs += [_acc_spec((1, cin))] * 4
    flops = 2 * B * 5 * h * w * 4 * cin * F * 3
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * cdtype.itemsize * 16),
    )(*args)
    db0 = tuple(outs[0:4])
    dy10 = tuple(outs[4:8])
    dW = outs[8].astype(Wh.dtype)
    dbh = outs[9].reshape(F).astype(bh.dtype)
    dm1 = outs[10].reshape(cin)
    da1 = outs[11].reshape(cin)
    dm2 = outs[12].reshape(cin)
    da2 = outs[13].reshape(cin)
    return db0, dy10, dm1, da1, dm2, da2, dW, dbh


_phead.defvjp(_phead_fwd, _phead_bwd)


def fused_pair_head(b0, y10, affines, Wh, bh):
    """Last-UpBlock tail + 1x1 head + tanh, fused (see section comment).

    b0, y10: 4-tuples of (B, 5, h, w, C) phase tensors; affines:
    (mul1, add1, mul2, add2) fp32 (C,) — the pending bn01/bn10 applies;
    Wh (C, F), bh (F,). Returns the 4 output phases (B, 5, h, w, F) fp32
    with tanh applied — interleave with phase_merge.
    """
    mul1, add1, mul2, add2 = affines
    return _phead(tuple(b0), tuple(y10), mul1, add1, mul2, add2, Wh, bh)


# --------------------------- fused_pair_head_mse ----------------------------
#
# The AE's ENTIRE decoder tail — last-UpBlock pair tail + 1x1 head + tanh +
# position-MSE against the target (grid cells AND the two averaged pole
# vertices, reference losses.py:22-31,48-51) — in one kernel emitting a
# per-sample squared-error SUM. The reconstruction never exists in HBM in
# any layout: no (..., 3) tensor (42x lane padding) is ever written or read
# back, and the loss's XLA passes disappear. The target arrives lane-packed
# (ops/vertices.pack_target_phases). Used on the AE training/eval loss path
# (pos-only factors); the VAE keeps fused_pair_head + the general loss.


def _phmse_phase(a_ref, b_ref, mul1, add1, mul2, add2, Wh, bh, k, h, w, cin,
                 F, cdtype):
    """ONE phase's fwd recompute: (a32, b32, pre (n,h,w,cin) f32, t
    (rows,cin) cdtype, v (k,5,h,w,F) f32 tanh output). Called per phase so
    only one phase's temporaries are ever live — materializing all four at
    once (~4x the working set) overflows scoped VMEM at the chosen k."""
    n = k * 5
    rows = n * h * w
    a32 = a_ref[...].reshape(n, h, w, cin).astype(jnp.float32)
    b32 = b_ref[...].reshape(n, h, w, cin).astype(jnp.float32)
    pre = a32 * mul1 + add1 + b32 * mul2 + add2
    t = jnp.maximum(pre, 0.0).astype(cdtype).reshape(rows, cin)
    z = jnp.dot(t, Wh[...], preferred_element_type=jnp.float32)
    z = (z + bh[0].astype(jnp.float32)).astype(cdtype).astype(jnp.float32)
    v = jnp.tanh(z).reshape(k, 5, h, w, F)
    return a32, b32, pre, t, v


def _pole_mean(v, k, h, w, F, south):
    """One pole's (k, F) vertex mean from its output phase (ops/vertices.py:
    north = mean_c grid[c,0,0] = mean_c ee[c,0,0]; south = mean_c
    grid[c,h-1,w-1] = mean_c oq[c,hp-1,wp-1])."""
    fifth = jnp.asarray(0.2, jnp.float32)
    if south:
        return sum(v[:, c, h - 1, w - 1, :] for c in range(5)) * fifth
    return sum(v[:, c, 0, 0, :] for c in range(5)) * fifth


def _phmse_fwd_kernel(*refs, h, w, k, cin, F, cdtype):
    b0 = refs[0:4]
    y10 = refs[4:8]
    mul1, add1, mul2, add2 = refs[8][0], refs[9][0], refs[10][0], refs[11][0]
    Wh, bh = refs[12], refs[13]
    tpack_ref, tpole_ref = refs[14], refs[15]
    sse_ref = refs[16]
    tpack = tpack_ref[...].astype(jnp.float32)
    # Mosaic-safe reduction discipline: real Mosaic rejects both rank-1 (k,)
    # vectors (layout.h SIGABRT) and stepwise sublane reductions of the 5-D
    # diff ("Invalid relayout ... replicated in destination" on the
    # (k,5,h,F) intermediate). Per-sample sums are therefore done as an MXU
    # matmul against a block-indicator selector: rows of the flattened
    # (rows, F) tensor belong to sample r // (5*h*w).
    rows_per = 5 * h * w
    rows = k * rows_per
    sample_of_row = jax.lax.broadcasted_iota(jnp.int32, (k, rows), 1) // rows_per
    sample_id = jax.lax.broadcasted_iota(jnp.int32, (k, rows), 0)
    S = (sample_of_row == sample_id).astype(jnp.float32)  # (k, rows)
    sseF = jnp.zeros((k, F), jnp.float32)
    pn = ps = None
    for p in range(4):
        _, _, _, _, v = _phmse_phase(b0[p], y10[p], mul1, add1, mul2, add2,
                                     Wh, bh, k, h, w, cin, F, cdtype)
        d = v - tpack[..., p * F : (p + 1) * F]
        sseF += jnp.dot(S, (d * d).reshape(rows, F),
                        preferred_element_type=jnp.float32)
        if p == 0:
            pn = _pole_mean(v, k, h, w, F, south=False)
        if p == 3:
            ps = _pole_mean(v, k, h, w, F, south=True)
    tp = tpole_ref[...].reshape(k, 2 * F).astype(jnp.float32)
    dn = pn - tp[:, 0:F]
    ds_ = ps - tp[:, F : 2 * F]
    # lane reduce (k,F)->(k,1) as a matmul too, then pad to the (k,1,8) block
    # (scatter is not lowerable on Mosaic; pad is)
    onesF = jnp.ones((F, 1), jnp.float32)
    sse2 = jnp.dot(sseF + dn * dn + ds_ * ds_, onesF,
                   preferred_element_type=jnp.float32)  # (k, 1)
    sse_ref[...] = jnp.pad(sse2, ((0, 0), (0, 7))).reshape(k, 1, 8)


def _phmse_bwd_kernel(*refs, h, w, k, cin, F, cdtype, out_dtype):
    g_ref = refs[0]
    b0 = refs[1:5]
    y10 = refs[5:9]
    mul1, add1, mul2, add2 = refs[9][0], refs[10][0], refs[11][0], refs[12][0]
    Wh, bh = refs[13], refs[14]
    tpack_ref, tpole_ref = refs[15], refs[16]
    db0 = refs[17:21]
    dy10 = refs[21:25]
    dW_ref, dbh_ref = refs[25], refs[26]
    dm1_ref, da1_ref, dm2_ref, da2_ref = refs[27], refs[28], refs[29], refs[30]
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dW_ref[...] = jnp.zeros_like(dW_ref)
        dbh_ref[...] = jnp.zeros_like(dbh_ref)
        dm1_ref[...] = jnp.zeros_like(dm1_ref)
        da1_ref[...] = jnp.zeros_like(da1_ref)
        dm2_ref[...] = jnp.zeros_like(dm2_ref)
        da2_ref[...] = jnp.zeros_like(da2_ref)

    n = k * 5
    rows = n * h * w
    tpack = tpack_ref[...].astype(jnp.float32)
    tp = tpole_ref[...].reshape(k, 2 * F).astype(jnp.float32)
    # (k, 1) — rank-2 throughout; rank-1 (k,) arrays abort real Mosaic
    g2 = g_ref[...].reshape(k, 8)[:, 0:1].astype(jnp.float32)
    gb = g2.reshape(k, 1, 1, 1, 1)

    W32 = Wh[...].astype(jnp.float32)
    dW_p = jnp.zeros((cin, F), jnp.float32)
    dbh_p = jnp.zeros((F,), jnp.float32)
    dm1_p = jnp.zeros((cin,), jnp.float32)
    da1_p = jnp.zeros((cin,), jnp.float32)
    dm2_p = jnp.zeros((cin,), jnp.float32)
    for p in range(4):
        a32, b32, pre, t, v = _phmse_phase(
            b0[p], y10[p], mul1, add1, mul2, add2, Wh, bh, k, h, w, cin, F,
            cdtype)
        dv = gb * 2.0 * (v - tpack[..., p * F : (p + 1) * F])
        # pole-mean adjoint, computed from THIS phase's own output (north
        # pole reads only p=0's corners, south only p=3's): each of the 5
        # contributing corner cells gets 1/5 of the pole cotangent (the SAME
        # recipe as _pad_transpose). Folding this into the loop removed a
        # pre-pass that recomputed phases 0 and 3 a second time — 2 of 6
        # full head recomputes (ROADMAP round-3 item 3).
        if p == 0:  # ee corner cells feed the north pole (pad, not scatter)
            pn = _pole_mean(v, k, h, w, F, south=False)
            dpole_n = (g2 * 2.0 * (pn - tp[:, 0:F]))[:, None, :] * 0.2
            corner = jnp.broadcast_to(dpole_n[:, :, None, None, :], (k, 5, 1, 1, F))
            dv = dv + jnp.pad(
                corner, ((0, 0), (0, 0), (0, h - 1), (0, w - 1), (0, 0))
            )
        if p == 3:  # oq corner cells feed the south pole
            ps = _pole_mean(v, k, h, w, F, south=True)
            dpole_s = (g2 * 2.0 * (ps - tp[:, F : 2 * F]))[:, None, :] * 0.2
            corner = jnp.broadcast_to(dpole_s[:, :, None, None, :], (k, 5, 1, 1, F))
            dv = dv + jnp.pad(
                corner, ((0, 0), (0, 0), (h - 1, 0), (w - 1, 0), (0, 0))
            )
        dz = dv.reshape(rows, F) * (1.0 - (v * v).reshape(rows, F))
        dbh_p += jnp.sum(dz, axis=0)
        dW_p += jax.lax.dot_general(
            t.astype(jnp.float32), dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dt = jax.lax.dot_general(
            dz, W32,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(n, h, w, cin)
        dm = dt * (pre > 0.0).astype(jnp.float32)
        db0[p][...] = (dm * mul1).reshape(k, 5, h, w, cin).astype(out_dtype)
        dy10[p][...] = (dm * mul2).reshape(k, 5, h, w, cin).astype(out_dtype)
        dm1_p += jnp.sum(dm * a32, axis=(0, 1, 2))
        da1_p += jnp.sum(dm, axis=(0, 1, 2))
        dm2_p += jnp.sum(dm * b32, axis=(0, 1, 2))
    dW_ref[...] += dW_p
    dbh_ref[...] += dbh_p.reshape(1, F)
    dm1_ref[...] += dm1_p.reshape(1, cin)
    da1_ref[...] += da1_p.reshape(1, cin)
    dm2_ref[...] += dm2_p.reshape(1, cin)
    da2_ref[...] += da1_p.reshape(1, cin)


def _phmse_choose_k(B, h, w, cin, F, fwd):
    """MSE-head k: `_head_k` + the lane-padded packed target, with an env
    override (GENICONET_PHMSE_K) for hardware bisection of the runtime
    crash under investigation (scripts/probe_phmse_micro.py)."""
    import os

    v = _exp_env("GENICONET_PHMSE_K", "")
    if v:
        k = int(v)
        while B % k:
            k -= 1
        return max(k, 1)
    return _head_k(B, h, w, cin, F, fwd=fwd, extra_per_cell_bytes=512)


@jax.custom_vjp
def _phmse(b0, y10, mul1, add1, mul2, add2, Wh, bh, tpack, tpoles):
    h, w = b0[0].shape[2], b0[0].shape[3]
    B, cin = b0[0].shape[0], b0[0].shape[-1]
    F = Wh.shape[-1]
    cdtype = b0[0].dtype
    # +128-lane f32 packed target resident per cell vs the plain head
    k = _phmse_choose_k(B, h, w, cin, F, fwd=True)
    kernel = functools.partial(
        _phmse_fwd_kernel, h=h, w=w, k=k, cin=cin, F=F, cdtype=cdtype
    )
    in_specs = [_block((k, 5, h, w, cin))] * 8
    in_specs += [_block((1, cin))] * 4
    in_specs += [_full(), _block((1, F))]
    # per-sample vectors ride as (B, 1, n): Mosaic requires the last two
    # block dims be (8,128)-divisible OR full — (k, n) blocks are neither
    in_specs += [_block((k, 5, h, w, 4 * F)), _block((k, 1, 2 * F))]
    args = (
        list(b0) + list(y10)
        + [v.reshape(1, cin).astype(jnp.float32) for v in (mul1, add1, mul2, add2)]
        + [Wh, bh.reshape(1, F), tpack, tpoles.reshape(B, 1, 2 * F)]
    )
    flops = 2 * B * 5 * h * w * 4 * cin * F
    out = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=_block((k, 1, 8)),
        out_shape=jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
        **_params(flops, B * 5 * h * w * cin * cdtype.itemsize * 8),
    )(*args)
    return out[:, 0, 0]


def _phmse_fwd(b0, y10, mul1, add1, mul2, add2, Wh, bh, tpack, tpoles):
    sse = _phmse(b0, y10, mul1, add1, mul2, add2, Wh, bh, tpack, tpoles)
    return sse, (b0, y10, mul1, add1, mul2, add2, Wh, bh, tpack, tpoles)


def _phmse_bwd(res, g):
    b0, y10, mul1, add1, mul2, add2, Wh, bh, tpack, tpoles = res
    h, w = b0[0].shape[2], b0[0].shape[3]
    B, cin = b0[0].shape[0], b0[0].shape[-1]
    F = Wh.shape[-1]
    cdtype = b0[0].dtype
    # +128-lane f32 packed target resident per cell vs the plain head
    k = _phmse_choose_k(B, h, w, cin, F, fwd=False)
    kernel = functools.partial(
        _phmse_bwd_kernel, h=h, w=w, k=k, cin=cin, F=F, cdtype=cdtype,
        out_dtype=cdtype,
    )
    g8 = jnp.zeros((B, 1, 8), jnp.float32).at[:, 0, 0].set(g.astype(jnp.float32))
    in_specs = [_block((k, 1, 8))]
    in_specs += [_block((k, 5, h, w, cin))] * 8
    in_specs += [_block((1, cin))] * 4
    in_specs += [_full(), _block((1, F))]
    in_specs += [_block((k, 5, h, w, 4 * F)), _block((k, 1, 2 * F))]
    args = (
        [g8] + list(b0) + list(y10)
        + [v.reshape(1, cin).astype(jnp.float32) for v in (mul1, add1, mul2, add2)]
        + [Wh, bh.reshape(1, F), tpack, tpoles.reshape(B, 1, 2 * F)]
    )
    out_shape = [jax.ShapeDtypeStruct((B, 5, h, w, cin), cdtype)] * 8
    out_specs = [_block((k, 5, h, w, cin))] * 8
    out_shape += [
        jax.ShapeDtypeStruct((cin, F), jnp.float32),
        jax.ShapeDtypeStruct((1, F), jnp.float32),
    ]
    out_specs += [_acc_spec((cin, F)), _acc_spec((1, F))]
    out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 4
    out_specs += [_acc_spec((1, cin))] * 4
    flops = 2 * B * 5 * h * w * 4 * cin * F * 3
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **_params(flops, B * 5 * h * w * cin * cdtype.itemsize * 16),
    )(*args)
    db0 = tuple(outs[0:4])
    dy10 = tuple(outs[4:8])
    dW = outs[8].astype(Wh.dtype)
    dbh = outs[9].reshape(F).astype(bh.dtype)
    dm1 = outs[10].reshape(cin)
    da1 = outs[11].reshape(cin)
    dm2 = outs[12].reshape(cin)
    da2 = outs[13].reshape(cin)
    return (db0, dy10, dm1, da1, dm2, da2, dW, dbh,
            jnp.zeros_like(tpack), jnp.zeros_like(tpoles))


_phmse.defvjp(_phmse_fwd, _phmse_bwd)


def fused_pair_head_mse(b0, y10, affines, Wh, bh, tpack, tpoles):
    """Last-UpBlock tail + head + tanh + position-SSE in one kernel.

    b0/y10/affines/Wh/bh as in `fused_pair_head`; tpack/tpoles from
    ops/vertices.pack_target_phases. Returns (B,) fp32 per-sample squared-
    error SUM over every vertex coordinate — grid cells plus the two
    averaged pole vertices (reference losses.py:22-31,48-51). Divide by
    (V*3) for the reference's per-sample MSE."""
    mul1, add1, mul2, add2 = affines
    return _phmse(tuple(b0), tuple(y10), mul1, add1, mul2, add2, Wh, bh,
                  tpack, tpoles)
