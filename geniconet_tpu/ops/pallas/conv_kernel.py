"""Fused Pallas hex-conv: cross-chart halo + 7-tap contraction in one kernel.

The XLA path (ops/conv.py) materializes the padded ``(B,5,h+2,w+2,C)`` tensor
in HBM between `ico_pad` and the conv. This kernel keeps the halo in VMEM:
each grid program loads one sample's full 5-chart block (≤ ~1.3 MB even at
s=5 ×64ch bf16 — channel width shrinks as resolution grows, so the block
always fits), builds the padded array in a VMEM scratch with the exact
`ico_pad` slicing semantics, and contracts the 7 hexagonal taps as shifted
``(5·h·w, C_in) × (C_in, C_out)`` matmuls with fp32 accumulation on the MXU.

Autodiff: `fused_ico_conv_s2s` carries a ``jax.custom_vjp`` whose backward
is ALSO fused Pallas kernels — ``_dtaps_kernel`` (tap gradients accumulated
across the batch grid) and ``_dx_kernel`` (the exact linear transpose of the
halo pad + tap contraction) — verified against the XLA composition's
autodiff in tests/test_pallas_conv.py.

Only stride 1 is routed through the fused path by default. The stride-2
kernels below are numerically verified but their parity-split windows
(sublane-dimension reshapes) trigger multi-minute Mosaic compiles on the
current toolchain, so stride-2 convs keep the shared-pad XLA route. The same
Mosaic limitation rules out a naive fused upsample+conv kernel (interleaving
the four upsample phases is a sublane reshape; measured 62 s compile for a
tiny shape) — a phase-domain formulation that never interleaves is the
round-2 path to fusing UpBlocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geniconet_tpu.geometry import ico
from geniconet_tpu.ops.conv import HEX_TAP_OFFSETS, ico_conv_s2s
from geniconet_tpu.ops.pad import ico_pad

__all__ = ["fused_ico_conv_s2s", "fused_vmem_ok"]


def fused_vmem_ok(subdivisions: int, cin: int, cout: int, itemsize: int) -> bool:
    """Whether one sample's kernel working set fits the scoped-VMEM budget.

    The peak is the dx backward kernel: Mosaic materializes the 7
    per-tap contributions, dP, and the pad-transpose temporaries, all in
    fp32 — roughly 15 buffers of 5·h·w·C·4 bytes. At s=6 even 64-channel
    layers exceed the 100 MB scoped limit (measured 111 MB). Callers fall
    back to the XLA path when this returns False.
    """
    del itemsize  # the fp32 backward temporaries dominate regardless
    h, w = ico.chart_shape(subdivisions)
    c = max(cin, cout)
    est = 15 * 5 * h * w * c * 4
    return est < 90 * 1024 * 1024


def _interpret() -> bool:
    """GENICONET_PALLAS_INTERPRET=1 runs every pallas_call as plain JAX ops
    (pallas interpret mode). Unlike pltpu.force_tpu_interpret_mode — whose
    threaded cross-device barrier simulation aborts under shard_map on many
    virtual devices — this has no device-synchronization machinery, so it is
    the mode multi-chip CPU tests and the driver dryrun use."""
    import os

    return os.environ.get("GENICONET_PALLAS_INTERPRET", "0") == "1"


def _build_padded(x, h, w, corner_mode):
    """In-kernel halo construction; mirrors ops/pad.py `ico_pad` for one
    sample: x (5, h, w, C) -> (5, h+2, w+2, C)."""
    # chart c+1 / c-1 views via static-slice concat (Mosaic's rotate op does
    # not support all dtypes)
    up = jnp.concatenate([x[1:], x[:1]], axis=0)
    dn = jnp.concatenate([x[4:], x[:4]], axis=0)

    C = x.shape[-1]
    if corner_mode == "average":
        # unrolled sum over the 5 charts — Mosaic cannot reduce over a
        # sublane-offset dimension (multi_reduction layout restriction)
        fifth = jnp.asarray(0.2, jnp.float32)
        pn = sum(x[c, 0:1, 0:1, :].astype(jnp.float32) for c in range(5)) * fifth
        ps = sum(
            x[c, h - 1 : h, w - 1 : w, :].astype(jnp.float32) for c in range(5)
        ) * fifth
        pole_n = jnp.broadcast_to(pn[None].astype(x.dtype), (5, 1, 1, C))
        pole_s = jnp.broadcast_to(ps[None].astype(x.dtype), (5, 1, 1, C))
    else:
        pole_n = jnp.zeros((5, 1, 1, C), x.dtype)
        pole_s = jnp.zeros((5, 1, 1, C), x.dtype)
    zero = jnp.zeros((5, 1, 1, x.shape[-1]), x.dtype)

    top = jnp.concatenate(
        [
            zero,
            pole_n,
            jnp.swapaxes(up[:, 0:h, 0:1, :], 1, 2),
            up[:, h - 1 : h, 1 : h + 1, :],
        ],
        axis=2,
    )
    bottom = jnp.concatenate(
        [
            dn[:, 0:1, h - 1 : w, :],
            jnp.swapaxes(dn[:, 0:h, w - 1 : w, :], 1, 2),
            zero,
        ],
        axis=2,
    )
    left = jnp.swapaxes(dn[:, 0:1, 0:h, :], 1, 2)
    right = jnp.concatenate(
        [jnp.swapaxes(up[:, h - 1 : h, h + 1 : w, :], 1, 2), pole_s], axis=1
    )
    mid = jnp.concatenate([left, x, right], axis=2)
    return jnp.concatenate([top, mid, bottom], axis=1)


def _choose_k(B, h, w, cin, cout, itemsize):
    """Samples per grid program: batch small grids so each matmul has
    >=~8k rows (MXU utilization at coarse subdivisions — measured 1.5-2.2x
    on s<=4 layers), bounded by a VMEM budget and divisibility of B."""
    target_rows = 8192
    k_rows = max(1, target_rows // (5 * h * w))
    # rough VMEM bound: input + padded + output + fp32 acc per sample
    per_sample = 5 * h * w * (cin + cout) * itemsize * 3 + 5 * h * w * cout * 4
    k_mem = max(1, (10 * 1024 * 1024) // max(per_sample, 1))
    k_cap = min(k_rows, k_mem, B)
    for k in range(k_cap, 0, -1):
        if B % k == 0:
            return k
    return 1


def _tap_slice(P, h, w, di, dj, stride):
    """Tap-shifted window of the padded array, optionally stride-2.

    stride 1: P[:, 1+di : 1+di+h, 1+dj : 1+dj+w].
    stride 2: centers P[2r'+2, 2q'+1] -> rows (2+di)::2 (h/2), cols
    (1+dj)::2 (w/2). Mosaic has no strided slicing, so parity-split via a
    reshape: rows a0+2k = parity(a0) rows offset a0//2.
    """
    if stride == 1:
        return P[:, 1 + di : 1 + di + h, 1 + dj : 1 + dj + w, :]
    n, C = P.shape[0], P.shape[-1]
    a0, b0 = 2 + di, 1 + dj
    ra, pa = a0 // 2, a0 % 2
    cb, pb = b0 // 2, b0 % 2
    Pr = P.reshape(n, (h + 2) // 2, 2, (w + 2) // 2, 2, C)
    return Pr[:, ra : ra + h // 2, pa, cb : cb + w // 2, pb, :]


def _act_apply(x, mul, add):
    """BN-apply + ReLU prologue: relu(x·mul + add), fp32 math, input dtype
    out (matches the XLA order apply→downcast→relu: relu commutes with
    round-to-bf16)."""
    pre = x.astype(jnp.float32) * mul + add
    return jnp.maximum(pre, 0.0).astype(x.dtype)


def _geff_one(g, y, gs0, gs1, dtype):
    """The stats-cotangent fold: d/dy of gs·(Σy, Σy²) added to the direct
    cotangent — g_eff = g + gs0 + 2·y·gs1, downcast to the activation dtype.
    The ONE definition shared by every kernel family's backward (in-kernel
    and XLA-side), so the fused/XLA numerics can never diverge."""
    return (
        g.astype(jnp.float32) + gs0 + 2.0 * y.astype(jnp.float32) * gs1
    ).astype(dtype)


def _kernel(*refs, h, w, corner_mode, stride, k, out_dtype, has_act, with_stats):
    # refs: x, [mul, add], taps, bias -> out, [stats (2, cout)]
    x_ref = refs[0]
    idx = 1
    xv = x_ref[...]
    if has_act:
        xv = _act_apply(xv, refs[1][0], refs[2][0])
        idx = 3
    w_ref, b_ref = refs[idx], refs[idx + 1]
    o_ref = refs[idx + 2]
    # k samples per program: per-sample halos concatenated along the chart
    # axis (slicing is row-independent, so tap windows apply unchanged)
    P = jnp.concatenate(
        [_build_padded(xv[i], h, w, corner_mode) for i in range(k)], axis=0
    )  # (k*5, h+2, w+2, Cin)
    cin = x_ref.shape[-1]
    cout = w_ref.shape[-1]
    ho, wo = h // stride, w // stride
    rows = k * 5 * ho * wo
    # seven shifted matmuls accumulated in fp32. (An im2col variant — one
    # (N, 7*Cin) x (7*Cin, Cout) matmul — was measured slower on balance:
    # the lane-dim concat costs more than the larger K saves, e.g. 3x
    # regression at s=4/C=128 bf16.)
    acc = jnp.zeros((rows, cout), jnp.float32)
    for t, (di, dj) in enumerate(HEX_TAP_OFFSETS):
        sl = _tap_slice(P, h, w, di, dj, stride).reshape(rows, cin)
        acc += jnp.dot(sl, w_ref[t], preferred_element_type=jnp.float32)
    acc += b_ref[0].astype(jnp.float32)
    y = acc.reshape(k, 5, ho, wo, cout).astype(out_dtype)
    o_ref[...] = y
    if with_stats:
        s_ref = refs[idx + 3]
        y32 = y.astype(jnp.float32)
        part = jnp.stack([
            jnp.sum(y32, axis=(0, 1, 2, 3)),
            jnp.sum(jnp.square(y32), axis=(0, 1, 2, 3)),
        ])

        @pl.when(pl.program_id(0) == 0)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)

        s_ref[...] += part


def _pallas_forward(x, taps, bias, subdivisions, corner_mode, stride=1,
                    act=None, with_stats=False):
    B = x.shape[0]
    h, w = ico.chart_shape(subdivisions)
    ho, wo = h // stride, w // stride
    cin = x.shape[-1]
    cout = taps.shape[-1]
    if bias is None:
        bias = jnp.zeros((cout,), x.dtype)
    k = _choose_k(B, h, w, cin, cout, x.dtype.itemsize)
    kernel = functools.partial(
        _kernel, h=h, w=w, corner_mode=corner_mode, stride=stride, k=k,
        out_dtype=x.dtype, has_act=act is not None, with_stats=with_stats,
    )
    in_specs = [
        pl.BlockSpec((k, 5, h, w, cin), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x]
    if act is not None:
        in_specs += [pl.BlockSpec((1, cin), lambda b: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [taps, bias.reshape(1, cout)]
    out_specs = [pl.BlockSpec((k, 5, ho, wo, cout), lambda b: (b, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, 5, ho, wo, cout), x.dtype)]
    if with_stats:
        out_specs.append(pl.BlockSpec((2, cout), lambda b: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((2, cout), jnp.float32))
    flops = 2 * B * 5 * ho * wo * 7 * cin * cout
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # the s=5 f32 block (in + padded scratch + f32 acc + double
            # buffering) exceeds the default 16M scoped-vmem budget
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*args)
    return (outs[0], outs[1]) if with_stats else (outs[0], None)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _dtaps_kernel(*refs, h, w, corner_mode, stride, k, has_act,
                  with_stats=False):
    """dL/dtaps[t] = P_slice(t)^T · g, accumulated across the batch grid.
    refs: x, [mul, add], g, [y, gs] -> out. With with_stats the BatchNorm
    stats-cotangent fold (g_eff = g + gs0 + 2·gs1·y) runs in-kernel."""
    x_ref = refs[0]
    idx = 1
    xv = x_ref[...]
    if has_act:
        xv = _act_apply(xv, refs[1][0], refs[2][0])
        idx = 3
    g_ref = refs[idx]
    idx += 1
    g = g_ref[...]
    if with_stats:
        y_ref, gs_ref = refs[idx], refs[idx + 1]
        idx += 2
        g = _geff_one(g, y_ref[...], gs_ref[0].astype(jnp.float32),
                      gs_ref[1].astype(jnp.float32), g.dtype)
    o_ref = refs[idx]
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    ho, wo = h // stride, w // stride
    rows = k * 5 * ho * wo
    # operands stay in the activation dtype — the MXU multiplies bf16
    # natively and accumulates f32 via preferred_element_type; explicit f32
    # upcasts forced multi-pass fp32 matmuls (round-3 trace)
    g = g.reshape(rows, g_ref.shape[-1])
    P = jnp.concatenate(
        [_build_padded(xv[i], h, w, corner_mode) for i in range(k)], axis=0
    )
    cin = x_ref.shape[-1]
    for t, (di, dj) in enumerate(HEX_TAP_OFFSETS):
        sl = _tap_slice(P, h, w, di, dj, stride).reshape(rows, cin)
        o_ref[t] += jax.lax.dot_general(
            sl, g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _pad_transpose(dP, *, h, w, corner_mode, k):
    """Exact transpose of `_build_padded`: accumulate every pad-source
    position of dP (k·5, h+2, w+2, C) back into dx (k·5, h, w, C). The
    slicing is per-chart-row local, so the k·5 chart axis passes through
    unchanged except the pole sums, done per sample. Shared by the plain
    conv backward and the fused upsample+conv backward
    (ops/pallas/phase_kernel.py)."""
    n = k * 5
    cin = dP.shape[-1]

    def place(val, r0, q0):
        """Embed val (n, vh, vw, C) into a zero (n, h, w, C) at (r0, q0)."""
        vh, vw = val.shape[1], val.shape[2]
        return jnp.pad(val, ((0, 0), (r0, h - r0 - vh), (q0, w - q0 - vw), (0, 0)))

    def roll_chart(A, shift):
        """A[c] -> A[(c+shift) mod 5] within each sample's 5-chart group."""
        A5 = A.reshape(k, 5, *A.shape[1:])
        rolled = jnp.concatenate([A5[:, shift:], A5[:, :shift]], axis=1)
        return rolled.reshape(A.shape)

    # interior
    dx = dP[:, 1 : h + 1, 1 : w + 1, :]
    # chart-rolled views within each sample: dPm1[c] = dP[c-1], dPp1[c] = dP[c+1]
    dPm1 = roll_chart(dP, 4)
    dPp1 = roll_chart(dP, 1)
    swap = lambda a: jnp.swapaxes(a, 1, 2)
    # transpose of: P[c,0,2:h+2]    = x[c+1, 0:h, 0]
    dx += place(swap(dPm1[:, 0:1, 2 : h + 2, :]), 0, 0)
    # transpose of: P[c,0,h+2:w+2]  = x[c+1, h-1, 1:h+1]
    dx += place(dPm1[:, 0:1, h + 2 : w + 2, :], h - 1, 1)
    # transpose of: P[c,h+1,0:h+1]  = x[c-1, 0, h-1:w]
    dx += place(dPp1[:, h + 1 : h + 2, 0 : h + 1, :], 0, h - 1)
    # transpose of: P[c,h+1,h+1:w+1]= x[c-1, 0:h, w-1]
    dx += place(swap(dPp1[:, h + 1 : h + 2, h + 1 : w + 1, :]), 0, w - 1)
    # transpose of: P[c,1:h+1,0]    = x[c-1, 0, 0:h]
    dx += place(swap(dPp1[:, 1 : h + 1, 0:1, :]), 0, 0)
    # transpose of: P[c,1:h,w+1]    = x[c+1, h-1, h+1:w]
    dx += place(swap(dPm1[:, 1:h, w + 1 : w + 2, :]), h - 1, h + 1)
    if corner_mode == "average":
        # transpose of pole synthesis: every chart's pole cell feeds back
        # 1/5 of the per-sample summed pole-position cotangents (unrolled —
        # Mosaic cannot reduce over a sublane-offset dim)
        fifth = jnp.asarray(0.2, jnp.float32)
        dP5 = dP.reshape(k, 5, h + 2, w + 2, cin)
        dpn = sum(dP5[:, c, 0:1, 1:2, :] for c in range(5)) * fifth  # (k,1,1,C)
        dps = sum(dP5[:, c, h : h + 1, w + 1 : w + 2, :] for c in range(5)) * fifth
        dpn = jnp.broadcast_to(dpn[:, None], (k, 5, 1, 1, cin)).reshape(n, 1, 1, cin)
        dps = jnp.broadcast_to(dps[:, None], (k, 5, 1, 1, cin)).reshape(n, 1, 1, cin)
        dx += place(dpn, 0, 0)
        dx += place(dps, h - 1, w - 1)
    return dx


def _conv_transpose_dP(gm, w_ref, h, w, stride, k, cin):
    """dP = Σ_t place(g·W_tᵀ at slice_t) — the conv transpose scattered into
    the padded array, fp32. stride-2 scatters via parity interleave (Mosaic
    has no value-level dynamic scatter). Shared by the split dx kernel and
    the merged backward."""
    n = k * 5
    ho, wo = h // stride, w // stride
    dP = jnp.zeros((n, h + 2, w + 2, cin), jnp.float32)
    for t, (di, dj) in enumerate(HEX_TAP_OFFSETS):
        contrib = jax.lax.dot_general(
            gm, w_ref[t],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(n, ho, wo, cin)
        if stride == 1:
            dP += jnp.pad(
                contrib, ((0, 0), (1 + di, 1 - di), (1 + dj, 1 - dj), (0, 0))
            )
        else:
            a0, b0 = 2 + di, 1 + dj
            ra, pa = a0 // 2, a0 % 2
            cb, pb = b0 // 2, b0 % 2
            z = jnp.zeros_like(contrib)
            cols = jnp.stack([contrib, z] if pb == 0 else [z, contrib], axis=3)
            cols = cols.reshape(n, ho, wo * 2, cin)
            rows = jnp.stack([cols, jnp.zeros_like(cols)] if pa == 0
                             else [jnp.zeros_like(cols), cols], axis=2)
            rows = rows.reshape(n, ho * 2, wo * 2, cin)
            dP += jnp.pad(
                rows,
                ((0, 0), (2 * ra, (h + 2) - 2 * ra - ho * 2),
                 (2 * cb, (w + 2) - 2 * cb - wo * 2), (0, 0)),
            )
    return dP


def _dx_kernel(*refs, h, w, corner_mode, stride, k, out_dtype, has_act,
               with_stats=False, emit_gsum=None):
    """dx = padᵀ(convᵀ(g)): build dP = Σ_t slice_t ← g·W_tᵀ, then accumulate
    every pad-source position back via `_pad_transpose`. refs: g, [y, gs],
    taps, [x, mul, add] -> dx, [gsum], [dmul, dadd]. With with_stats the
    stats-cotangent fold runs in-kernel and Σg_eff (the bias grad) is
    emitted. With act the result is gated by the ReLU mask and scaled by mul
    (dL/dx of x' = relu(x·mul+add))."""
    g_ref = refs[0]
    idx = 1
    g = g_ref[...]
    if with_stats:
        y_ref, gs_ref = refs[idx], refs[idx + 1]
        idx += 2
        g = _geff_one(g, y_ref[...], gs_ref[0].astype(jnp.float32),
                      gs_ref[1].astype(jnp.float32), g.dtype)
    w_ref = refs[idx]
    idx += 1
    if has_act:
        x_ref, mul_ref, add_ref = refs[idx], refs[idx + 1], refs[idx + 2]
        idx += 3
    o_ref = refs[idx]
    idx += 1
    first = pl.program_id(0) == 0
    cout = g_ref.shape[-1]
    cin = w_ref.shape[1]
    if emit_gsum is None:
        emit_gsum = with_stats
    if emit_gsum:
        # Σg is the bias grad whether the fold ran here or upstream in XLA
        gsum_ref = refs[idx]
        idx += 1

        @pl.when(first)
        def _():
            gsum_ref[...] = jnp.zeros_like(gsum_ref)

        gsum_ref[...] += jnp.sum(
            g.astype(jnp.float32), axis=(0, 1, 2, 3)
        ).reshape(1, cout)
    ho, wo = h // stride, w // stride
    gm = g.reshape(k * 5 * ho * wo, cout)
    n = k * 5
    dP = _conv_transpose_dP(gm, w_ref, h, w, stride, k, cin)
    dx = _pad_transpose(dP, h=h, w=w, corner_mode=corner_mode, k=k)
    if not has_act:
        o_ref[...] = dx.reshape(k, 5, h, w, cin).astype(out_dtype)
        return
    mul, add = mul_ref[0], add_ref[0]
    dmul_ref, dadd_ref = refs[idx], refs[idx + 1]
    x32 = x_ref[...].reshape(k * 5, h, w, cin).astype(jnp.float32)
    mask = (x32 * mul + add > 0.0).astype(jnp.float32)
    dm = dx * mask
    o_ref[...] = (dm * mul).reshape(k, 5, h, w, cin).astype(out_dtype)

    @pl.when(first)
    def _():
        dmul_ref[...] = jnp.zeros_like(dmul_ref)
        dadd_ref[...] = jnp.zeros_like(dadd_ref)

    dmul_ref[...] += jnp.sum(dm * x32, axis=(0, 1, 2)).reshape(1, cin)
    dadd_ref[...] += jnp.sum(dm, axis=(0, 1, 2)).reshape(1, cin)


def _std_bwd_kernel(*refs, h, w, corner_mode, stride, k, out_dtype, has_act,
                    with_stats):
    """Merged standard-conv backward: dx + dtaps + Σg_eff (+ d_mul/d_add) in
    one kernel, sharing the g read, the stats-cotangent fold, and the padded
    halo. refs (inputs): x, [mul, add], g, [y, gs], taps; (outputs): dx,
    dtaps, gsum, [dmul, dadd]."""
    x_ref = refs[0]
    idx = 1
    if has_act:
        mul, add = refs[1][0], refs[2][0]
        idx = 3
    g_ref = refs[idx]
    idx += 1
    if with_stats:
        y_ref, gs_ref = refs[idx], refs[idx + 1]
        idx += 2
    w_ref = refs[idx]
    idx += 1
    o_ref, dt_ref, gsum_ref = refs[idx], refs[idx + 1], refs[idx + 2]
    first = pl.program_id(0) == 0
    cin = x_ref.shape[-1]
    cout = w_ref.shape[-1]
    ho, wo = h // stride, w // stride
    rows = k * 5 * ho * wo

    g = g_ref[...]
    if with_stats:
        g = _geff_one(g, y_ref[...], gs_ref[0].astype(jnp.float32),
                      gs_ref[1].astype(jnp.float32), out_dtype)

    @pl.when(first)
    def _():
        gsum_ref[...] = jnp.zeros_like(gsum_ref)
        dt_ref[...] = jnp.zeros_like(dt_ref)

    gsum_ref[...] += jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3)).reshape(1, cout)

    # dx = padT(convT(g_eff)) — native-dtype matmul operands, f32 acc
    gm = g.reshape(rows, cout)
    n = k * 5
    dP = _conv_transpose_dP(gm, w_ref, h, w, stride, k, cin)
    dx = _pad_transpose(dP, h=h, w=w, corner_mode=corner_mode, k=k)
    xv = x_ref[...]
    if has_act:
        dmul_ref, dadd_ref = refs[idx + 3], refs[idx + 4]
        x32 = xv.reshape(n, h, w, cin).astype(jnp.float32)
        pre = x32 * mul + add
        mask = (pre > 0.0).astype(jnp.float32)
        dm = dx * mask
        o_ref[...] = (dm * mul).reshape(k, 5, h, w, cin).astype(out_dtype)

        @pl.when(first)
        def _():
            dmul_ref[...] = jnp.zeros_like(dmul_ref)
            dadd_ref[...] = jnp.zeros_like(dadd_ref)

        dmul_ref[...] += jnp.sum(dm * x32, axis=(0, 1, 2)).reshape(1, cin)
        dadd_ref[...] += jnp.sum(dm, axis=(0, 1, 2)).reshape(1, cin)
        xv = jnp.maximum(pre, 0.0).astype(xv.dtype).reshape(k, 5, h, w, cin)
    else:
        o_ref[...] = dx.reshape(k, 5, h, w, cin).astype(out_dtype)

    # dtaps shares the (activated) padded halo
    P = jnp.concatenate(
        [_build_padded(xv[i], h, w, corner_mode) for i in range(k)], axis=0
    )
    gm2 = g.reshape(rows, cout)
    for t, (di, dj) in enumerate(HEX_TAP_OFFSETS):
        sl = _tap_slice(P, h, w, di, dj, stride).reshape(rows, cin)
        dt_ref[t] += jax.lax.dot_general(
            sl, gm2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _std_bwd(x, g, taps, y, gs, subdivisions, corner_mode, stride, act,
             with_stats, out_dtype):
    """pallas_call plumbing for `_std_bwd_kernel`.
    Returns (dx, dtaps, gsum, dmul, dadd)."""
    B = x.shape[0]
    h, w = ico.chart_shape(subdivisions)
    ho, wo = h // stride, w // stride
    cin, cout = x.shape[-1], g.shape[-1]
    k = _choose_k(B, h, w, cin, cout, x.dtype.itemsize)
    kernel = functools.partial(
        _std_bwd_kernel, h=h, w=w, corner_mode=corner_mode, stride=stride,
        k=k, out_dtype=out_dtype, has_act=act is not None,
        with_stats=with_stats,
    )
    bspec = lambda shape: pl.BlockSpec(
        shape, lambda b, nd=len(shape): (b,) + (0,) * (nd - 1),
        memory_space=pltpu.VMEM,
    )
    aspec = lambda shape: pl.BlockSpec(
        shape, lambda b, nd=len(shape): (0,) * nd, memory_space=pltpu.VMEM
    )
    in_specs = [bspec((k, 5, h, w, cin))]
    args = [x]
    if act is not None:
        in_specs += [aspec((1, cin))] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    in_specs.append(bspec((k, 5, ho, wo, cout)))
    args.append(g)
    if with_stats:
        in_specs += [bspec((k, 5, ho, wo, cout)), aspec((2, cout))]
        args += [y, gs]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(taps)
    out_specs = [
        bspec((k, 5, h, w, cin)),
        aspec((7, cin, cout)),
        aspec((1, cout)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, 5, h, w, cin), out_dtype),
        jax.ShapeDtypeStruct((7, cin, cout), jnp.float32),
        jax.ShapeDtypeStruct((1, cout), jnp.float32),
    ]
    if act is not None:
        out_specs += [aspec((1, cin))] * 2
        out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 2
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*args)
    dx, dtaps, gsum = outs[0], outs[1], outs[2].reshape(cout)
    if act is not None:
        return dx, dtaps, gsum, outs[3].reshape(cin), outs[4].reshape(cin)
    return dx, dtaps, gsum, None, None


def _std_bwd_vmem_ok(subdivisions, cin, cout, B):
    """Gate evaluated at the k the plumbing will choose (advisor round-2:
    the per-sample estimate alone understates a k>1 program's footprint)."""
    from geniconet_tpu.ops.pallas.phase_kernel import _merged_bwd_enabled

    if not _merged_bwd_enabled("std"):
        return False
    h, w = ico.chart_shape(subdivisions)
    c = max(cin, cout)
    per_sample = 24 * 5 * h * w * c * 4
    k = _choose_k(B, h, w, cin, cout, 4)
    return k * per_sample < 90 * 1024 * 1024


def _pallas_dtaps(x, g, subdivisions, corner_mode, stride=1, act=None,
                  y=None, gs=None):
    B = x.shape[0]
    h, w = ico.chart_shape(subdivisions)
    ho, wo = h // stride, w // stride
    cin, cout = x.shape[-1], g.shape[-1]
    with_stats = y is not None
    k = _choose_k(B, h, w, cin, cout, x.dtype.itemsize)
    kernel = functools.partial(
        _dtaps_kernel, h=h, w=w, corner_mode=corner_mode, stride=stride, k=k,
        has_act=act is not None, with_stats=with_stats,
    )
    in_specs = [
        pl.BlockSpec((k, 5, h, w, cin), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x]
    if act is not None:
        in_specs += [pl.BlockSpec((1, cin), lambda b: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
    in_specs.append(
        pl.BlockSpec((k, 5, ho, wo, cout), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    args.append(g)
    if with_stats:
        in_specs += [
            pl.BlockSpec((k, 5, ho, wo, cout), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [y, gs]
    out = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((7, cin, cout), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((7, cin, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*args)
    return out.astype(x.dtype)


def _pallas_dx(g, taps, subdivisions, corner_mode, out_dtype, stride=1,
               act=None, x=None, y=None, gs=None, emit_gsum=None):
    """Returns (dx, dmul, dadd, gsum) — gsum = Σg (the bias grad) when
    emit_gsum (defaults to the y/gs in-kernel stats fold being on)."""
    B = g.shape[0]
    h, w = ico.chart_shape(subdivisions)
    ho, wo = h // stride, w // stride
    cin, cout = taps.shape[1], g.shape[-1]
    with_stats = y is not None
    if emit_gsum is None:
        emit_gsum = with_stats
    k = _choose_k(B, h, w, cin, cout, g.dtype.itemsize)
    kernel = functools.partial(
        _dx_kernel, h=h, w=w, corner_mode=corner_mode, stride=stride, k=k,
        out_dtype=out_dtype, has_act=act is not None, with_stats=with_stats,
        emit_gsum=emit_gsum,
    )
    in_specs = [
        pl.BlockSpec((k, 5, ho, wo, cout), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [g]
    if with_stats:
        in_specs += [
            pl.BlockSpec((k, 5, ho, wo, cout), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [y, gs]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(taps)
    out_specs = [pl.BlockSpec((k, 5, h, w, cin), lambda b: (b, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, 5, h, w, cin), out_dtype)]
    if emit_gsum:
        out_specs.append(pl.BlockSpec((1, cout), lambda b: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, cout), jnp.float32))
    if act is not None:
        in_specs.append(pl.BlockSpec((k, 5, h, w, cin), lambda b: (b, 0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs += [pl.BlockSpec((1, cin), lambda b: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [x, act[0].reshape(1, cin).astype(jnp.float32),
                 act[1].reshape(1, cin).astype(jnp.float32)]
        out_specs += [pl.BlockSpec((1, cin), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)] * 2
        out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 2
    outs = pl.pallas_call(
        kernel,
        grid=(B // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*args)
    idx = 1
    gsum = None
    if emit_gsum:
        gsum = outs[idx].reshape(cout)
        idx += 1
    if act is not None:
        return outs[0], outs[idx].reshape(cin), outs[idx + 1].reshape(cin), gsum
    return outs[0], None, None, gsum


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fic(x, taps, bias, act_mul, act_add, subdivisions, corner_mode, stride,
         with_stats):
    act = None if act_mul is None else (act_mul, act_add)
    return _pallas_forward(x, taps, bias, subdivisions, corner_mode, stride,
                           act, with_stats)


def _fwd(x, taps, bias, act_mul, act_add, subdivisions, corner_mode, stride,
         with_stats):
    y, st = _fic(x, taps, bias, act_mul, act_add, subdivisions, corner_mode,
                 stride, with_stats)
    res = (x, taps, bias, act_mul, act_add, y if with_stats else None)
    return (y, st), res


def _bwd(subdivisions, corner_mode, stride, with_stats, res, g):
    x, taps, bias, act_mul, act_add, y = res
    gy, gst = g
    act = None if act_mul is None else (act_mul, act_add)
    if _std_bwd_vmem_ok(subdivisions, x.shape[-1], gy.shape[-1], x.shape[0]):
        dx, dtaps, gsum, dmul, dadd = _std_bwd(
            x, gy, taps, y, gst if with_stats else None, subdivisions,
            corner_mode, stride, act, with_stats, x.dtype,
        )
        dbias = None if bias is None else gsum.astype(bias.dtype)
        return dx, dtaps.astype(x.dtype), dbias, dmul, dadd
    from geniconet_tpu.ops.pallas.phase_kernel import _kernel_geff_enabled

    fold = with_stats and _kernel_geff_enabled("std")
    if with_stats and not fold:
        from geniconet_tpu.ops.pallas.phase_kernel import _stats_geff

        (gy,) = _stats_geff((gy,), (y,), gst)
    yk = dict(y=y, gs=gst) if fold else {}
    # bias grad rides the dx kernel as a Σg accumulator (post-fold gy IS
    # g_eff) — no XLA whole-cotangent convert+reduce per conv
    dx, dmul, dadd, gsum = _pallas_dx(gy, taps, subdivisions, corner_mode,
                                      x.dtype, stride, act=act, x=x,
                                      emit_gsum=bias is not None, **yk)
    dtaps = _pallas_dtaps(x, gy, subdivisions, corner_mode, stride, act=act,
                          **yk)
    dbias = None if bias is None else gsum.astype(bias.dtype)
    return dx, dtaps, dbias, dmul, dadd


_fic.defvjp(_fwd, _bwd)


def fused_ico_conv_s2s(x, taps, bias, subdivisions, corner_mode="average",
                       stride=1, act=None, with_stats=False):
    """Drop-in fused hex conv: (B,5,h,w,Cin) -> (B,5,h/stride,w/stride,Cout).

    bias may be None; stride ∈ {1, 2}. act: optional (mul, add) fp32 (C_in,)
    BN-apply+ReLU prologue applied in-kernel before the halo pad.
    with_stats: also return (2, C_out) fp32 [sum, sumsq] of the output.
    Backward = fused Pallas kernels (dtaps accumulated across the batch
    grid; dx as the exact transpose of the halo pad, gated by the ReLU mask
    under act), verified against the XLA composition's autodiff in tests.
    """
    mul, add = (act if act is not None else (None, None))
    y, st = _fic(x, taps, bias, mul, add, subdivisions, corner_mode, stride,
                 with_stats)
    return (y, st) if with_stats else y
