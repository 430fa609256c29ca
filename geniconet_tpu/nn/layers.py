"""Flax modules: icosahedral conv / batchnorm / residual blocks.

Semantics re-specified from the reference architecture (models.py:22-62,
101-156) but built on this framework's TPU ops: all tensors are chart-split
``(B, 5, h, w, C)`` NHWC (channels last = TPU lane dimension), parameters are
the 7 active hex taps (no dead 3×3 corners), compute dtype is configurable
(bf16 on TPU, fp32 accumulation inside the conv), and BatchNorm supports
cross-replica axis reduction for data parallelism (``axis_name``) so a DP
run matches a single-chip large-batch run.

Initialization follows the torch Conv2d *recipe* (kaiming_uniform(a=√5) ⇒
U(±1/sqrt(fan_in)) for weight and bias) but with the hex conv's true
fan_in = 7·C_in — a DELIBERATE deviation from the reference, whose masked
3×3 Conv2d would use fan_in = 9·C_in (counting the two dead corner taps).
7·C_in is the variance-correct choice for a 7-tap stencil; the reference's
effective init is a constant factor √(7/9) ≈ 0.88 narrower.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from geniconet_tpu.ops.conv import ico_conv_s2s, ico_conv_s2s_padded, taps_to_kernel
from geniconet_tpu.ops.pad import ico_pad
from geniconet_tpu.ops.upsample import ico_upsample_s2s

__all__ = ["IcoConvS2S", "IcoBatchNorm", "DownBlock", "UpBlock",
           "hex_uniform_init", "pallas_block_enabled"]



def pallas_block_enabled(name: Optional[str],
                         default: Optional[str] = None) -> bool:
    """Per-block Pallas routing override: when GENICONET_PALLAS_BLOCKS is
    set (comma list, e.g. 'down0,up2,conv_in'), only the named blocks keep
    their fused kernels; everything else falls back to XLA. With the env
    unset, `default` (a model's `pallas_blocks` attribute — e.g. the
    VAE-bs36 crash workaround, artifacts/vae36_bisect.json) applies; unset
    both = all blocks fused. Used to bisect the VAE-bs36 backend crash
    (ROADMAP 'Known issue')."""
    import os

    v = os.environ.get("GENICONET_PALLAS_BLOCKS", "")
    if not v:
        v = default or ""
    if not v:
        return True
    return (name or "") in {s.strip() for s in v.split(",")}


def hex_uniform_init(fan_in: int) -> Callable:
    """U(±1/sqrt(fan_in)) — the torch Conv2d reset_parameters recipe
    (kaiming_uniform with a=sqrt(5) reduces to this bound for both the
    weight and the bias). Callers pass fan_in = 7·C_in (the live hex taps),
    not the masked-3×3's 9·C_in — see the module docstring."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return nn.initializers.uniform(scale=2 * bound)(key, shape, dtype) - bound

    return init


def _xla_act(x, act):
    """XLA fallback of the kernels' BN-apply+ReLU prologue."""
    if act is None:
        return x
    pre = x.astype(jnp.float32) * act[0] + act[1]
    return jnp.maximum(pre, 0.0).astype(x.dtype)


def _xla_stats(y):
    """XLA fallback of the kernels' [sum, sumsq] (2, C) fp32 emission."""
    y32 = y.astype(jnp.float32)
    axes = tuple(range(y.ndim - 1))
    return jnp.stack([jnp.sum(y32, axis=axes), jnp.sum(jnp.square(y32), axis=axes)])


class IcoConvS2S(nn.Module):
    """Hexagonal icosahedral conv (reference IcoConvS2S contract).

    Attributes:
      features: output channels.
      subdivisions: *input* subdivision level.
      stride: 1 (same level) or 2 (s -> s-1).
      corner_mode: pole synthesis for the halo ('average' | 'zeros').
      dtype: compute dtype (params stay fp32).
    """

    features: int
    subdivisions: int
    stride: int = 1
    use_bias: bool = True
    corner_mode: str = "average"
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, is_padded: bool = False, get_params: bool = False,
        act=None, with_stats: bool = False,
    ):
        """Apply the conv. With ``is_padded=True`` the input is an already
        haloed ``(B, 5, h+2, w+2, C)`` tensor (lets residual blocks share one
        `ico_pad` between their two stride branches). With
        ``get_params=True``, declare and return ``(taps, bias)`` cast to the
        compute dtype instead of applying — used by the fused block paths,
        which feed several convs' taps into one Pallas kernel while keeping
        this module as the parameter owner (checkpoint-compatible tree).
        ``act=(mul, add)`` prepends a BN-apply+ReLU prologue; ``with_stats``
        additionally returns the output's (2, C) fp32 [sum, sumsq] — both
        fused in-kernel on the Pallas route, XLA-emulated otherwise."""
        cin = x.shape[-1]
        init = hex_uniform_init(7 * cin)
        taps = self.param("taps", init, (7, cin, self.features))
        bias = self.param("bias", init, (self.features,)) if self.use_bias else None
        x = x.astype(self.dtype)
        taps = taps.astype(self.dtype)
        if get_params:
            return taps, None if bias is None else bias.astype(self.dtype)
        # fused path: stride-1 only. The stride-2 kernel exists and is
        # numerically verified (tests/test_pallas_conv.py) but its parity
        # reshape sends Mosaic into multi-minute compiles, so stride-2
        # stays on the shared-pad XLA path until that is fixed. Very large
        # blocks (s>=6 with wide channels) exceed scoped VMEM and also fall
        # back to XLA.
        from geniconet_tpu.ops.pallas.conv_kernel import fused_ico_conv_s2s, fused_vmem_ok

        if (
            self.use_pallas
            and self.stride == 1
            and not is_padded
            and fused_vmem_ok(self.subdivisions, cin, self.features,
                              jnp.dtype(self.dtype).itemsize)
        ):
            return fused_ico_conv_s2s(
                x, taps, bias.astype(self.dtype) if bias is not None else None,
                self.subdivisions, self.corner_mode, self.stride,
                act=act, with_stats=with_stats,
            )
        x = _xla_act(x, act)
        if is_padded:
            y = ico_conv_s2s_padded(x, taps_to_kernel(taps), self.stride)
            if bias is not None:
                y = y + bias.astype(y.dtype)
        else:
            y = ico_conv_s2s(
                x,
                taps,
                bias.astype(self.dtype) if bias is not None else None,
                self.subdivisions,
                stride=self.stride,
                corner_mode=self.corner_mode,
            )
        return (y, _xla_stats(y)) if with_stats else y


class _StatsBN(nn.Module):
    """BatchNorm affine provider driven by kernel-emitted sufficient
    statistics: input is ``{"stats": (2, C) fp32 [sum, sumsq] | None,
    "count": float, "features": C}`` and the output is the per-channel
    ``(mul, add)`` such that the BN apply is ``y*mul + add`` — consumed by
    the next kernel's act prologue or the block's XLA tail. The activation
    tensor is never re-read for moments. Variable tree matches nn.BatchNorm
    (fp32 scale/bias, batch_stats mean/var, momentum 0.9, eps 1e-5,
    non-negative fast variance, optional cross-replica ``axis_name`` pmean),
    so all three BN forms share checkpoints."""

    use_running_average: bool
    axis_name: Optional[str] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, stats: dict):
        C = int(stats["features"])
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (C,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (C,)
        )
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        kernel_fn = stats.get("kernel_fn")
        if kernel_fn is not None:
            # merged-block path (fused_up_block): the kernel computes this
            # BN's affine IN-KERNEL from its own accumulated moments, so it
            # needs the raw (scale, bias) BEFORE running — invert control:
            # run the kernel from inside the module call (one scope use),
            # then do the running-average update from the moments it
            # emitted. Train-mode only (the affine uses batch statistics).
            assert not self.use_running_average, (
                "kernel_fn mode computes the affine from batch moments")
            aux, st = kernel_fn(scale, bias)
            count = jnp.asarray(stats["count"], jnp.float32)
            mean = st[0] / count
            var = jnp.maximum(0.0, st[1] / count - jnp.square(mean))
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
            return aux
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            st = stats["stats"]
            count = jnp.asarray(stats["count"], jnp.float32)
            mean = st[0] / count
            mean2 = st[1] / count
            if self.axis_name is not None and not self.is_initializing():
                stacked = jax.lax.pmean(jnp.stack([mean, mean2]), self.axis_name)
                mean, mean2 = stacked[0], stacked[1]
            var = jnp.maximum(0.0, mean2 - jnp.square(mean))
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        return mul, bias - mean * mul


class IcoBatchNorm(nn.Module):
    """BatchNorm2d equivalent (torch defaults: eps 1e-5, running momentum 0.1).

    ``axis_name`` enables cross-replica moment reduction under shard_map/pmap
    so data-parallel training uses global batch statistics. Accepts a
    standard ``(B, 5, h, w, C)`` grid, or a ``{"stats", "count",
    "features"}`` dict of kernel-emitted moment sums (returning the
    ``(mul, add)`` affine instead of applying) — both share the same
    variable tree and statistics.
    """

    use_running_average: Optional[bool] = None
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        if isinstance(x, dict):
            return _StatsBN(
                use_running_average=ura,
                axis_name=self.axis_name,
                name="BatchNorm_0",
            )(x)
        B, n, h, w, C = x.shape
        flat = x.reshape(B, n * h, w, C)
        out = nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.axis_name,
        )(flat)
        return out.reshape(B, n, h, w, C)


class DownBlock(nn.Module):
    """Residual down block (reference BasicIcoS2SDownBlock, models.py:22-40).

    branch0 = BN(conv_s1(relu(BN(conv_s2(x))))), branch1 = BN(conv_s2(x)),
    out = relu(branch0 + branch1). Maps subdivision s -> s-1.

    Fused path (``use_pallas``): the input's four parity phases (XLA
    slices) feed ONE Pallas kernel computing both stride-2 convs — the
    stride-2 conv is output phase (1,0) of the phase-form hex conv, so its
    output is already standard level-(s-1) layout (ops/phase.py).
    """

    features: int
    in_subdivisions: int
    use_bias: bool = True
    corner_mode: str = "average"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    use_pallas: bool = False
    pallas_blocks: Optional[str] = None  # per-model routing default

    @nn.compact
    def __call__(self, x, train: bool = False, in_act=None) -> jnp.ndarray:
        """``in_act=(mul, add)``: a pending BN-apply+ReLU from the producing
        layer, absorbed into the first kernels' prologue on the fused path
        (applied in XLA on the fallback path). ``x`` may be a standard
        ``(B, 5, H, W, C)`` grid or its 4-tuple of parity phases (the fused
        encoder front hands phases straight through so the level-s tensor
        never re-interleaves in HBM)."""
        from geniconet_tpu.ops.phase import phase_merge, phase_split
        from geniconet_tpu.ops.pallas.phase_kernel import (
            fused_down_block,
            fused_dual_s2_conv,
            fused_dual_s2_conv_split,
            fused_phase_conv_s1,
            merged_block_enabled,
            phase_chain_enabled,
            phase_vmem_ok,
        )

        kw = dict(corner_mode=self.corner_mode, dtype=self.dtype, use_bias=self.use_bias,
                  use_pallas=self.use_pallas)
        bn = dict(use_running_average=not train, axis_name=self.axis_name, dtype=self.dtype)
        s = self.in_subdivisions
        phases_in = isinstance(x, (tuple, list))
        if phases_in:
            h2, w2, cin = x[0].shape[2], x[0].shape[3], x[0].shape[-1]
        else:
            h2, w2, cin = x.shape[2] // 2, x.shape[3] // 2, x.shape[-1]
        F = self.features
        if (
            self.use_pallas
            and pallas_block_enabled(self.name, self.pallas_blocks)
            and s >= 2
            and phase_vmem_ok(h2, w2, cin, F, n_sets=2)
        ):
            if phases_in:
                xp = tuple(p.astype(self.dtype) for p in x)
            else:
                xp = phase_split(x.astype(self.dtype))
            t00, b00 = IcoConvS2S(F, s, stride=2, name="conv00", **kw)(
                xp[0], get_params=True
            )
            t10, b10 = IcoConvS2S(F, s, stride=2, name="conv10", **kw)(
                xp[0], get_params=True
            )
            fold_ok = self.pallas_blocks is None
            if phase_chain_enabled("enc"):
                # phase chain (GENICONET_PHASE_CHAIN): the stride-2 kernel
                # emits its outputs AS level-(s-1) phases, conv01 consumes
                # them through the phase conv, and the residual join runs
                # per-phase — no spatial tensor, phase_split gather, or
                # relayout copy between encoder blocks. The joined phase
                # tuple feeds the next block's phases_in path directly.
                if train:
                    y00p, y10p, s00, s10 = fused_dual_s2_conv_split(
                        xp, t00, b00, t10, b10, self.corner_mode,
                        act=in_act, with_stats=True, fold_ok=fold_ok,
                    )
                else:
                    y00p, y10p = fused_dual_s2_conv_split(
                        xp, t00, b00, t10, b10, self.corner_mode, act=in_act,
                        fold_ok=fold_ok,
                    )
                    s00 = s10 = None
                cnt = 4.0 * math.prod(y00p[0].shape[:-1])
                mul00, add00 = IcoBatchNorm(name="bn00", **bn)(
                    {"stats": s00, "count": cnt, "features": F}
                )
                t01, b01 = IcoConvS2S(F, s - 1, stride=1, name="conv01",
                                      **kw)(y00p[0], get_params=True)
                if train:
                    b0p, s01 = fused_phase_conv_s1(
                        y00p, t01, b01, self.corner_mode,
                        act=(mul00, add00), with_stats=True, fold_ok=fold_ok,
                        fold_site=self.name or "",
                    )
                else:
                    b0p = fused_phase_conv_s1(
                        y00p, t01, b01, self.corner_mode, act=(mul00, add00))
                    s01 = None
                mul01, add01 = IcoBatchNorm(name="bn01", **bn)(
                    {"stats": s01, "count": cnt, "features": F}
                )
                mul10, add10 = IcoBatchNorm(name="bn10", **bn)(
                    {"stats": s10, "count": cnt, "features": F}
                )
                return tuple(
                    jnp.maximum(
                        a.astype(jnp.float32) * mul01 + add01
                        + b.astype(jnp.float32) * mul10 + add10,
                        0.0,
                    ).astype(self.dtype)
                    for a, b in zip(b0p, y10p)
                )
            if (
                train
                and self.axis_name is None  # in-kernel affine = local moments
                and merged_block_enabled(self.name or "")
            ):
                # whole block in ONE two-pass kernel: dual stride-2 + stats
                # (pass A), in-kernel bn00 affine + spatial conv01 + stats
                # (pass B) — see phase_kernel.fused_down_block
                t01, b01 = IcoConvS2S(F, s - 1, stride=1, name="conv01", **kw)(
                    jnp.zeros((1, F), self.dtype), get_params=True
                )
                cnt = 1.0 * xp[0].shape[0] * 5 * h2 * w2

                def _run(gamma, beta):
                    b0, y10, s00, s01, s10 = fused_down_block(
                        xp, t00, b00, t10, b10, t01, b01, gamma, beta, s,
                        in_act=in_act, corner_mode=self.corner_mode,
                        fold_ok=fold_ok,
                    )
                    return (b0, y10, s01, s10), s00

                b0, y10, s01, s10 = IcoBatchNorm(name="bn00", **bn)(
                    {"kernel_fn": _run, "count": cnt, "features": F}
                )
                mul01, add01 = IcoBatchNorm(name="bn01", **bn)(
                    {"stats": s01, "count": cnt, "features": F}
                )
                mul10, add10 = IcoBatchNorm(name="bn10", **bn)(
                    {"stats": s10, "count": cnt, "features": F}
                )
                out = jnp.maximum(
                    b0.astype(jnp.float32) * mul01 + add01
                    + y10.astype(jnp.float32) * mul10 + add10,
                    0.0,
                )
                return out.astype(self.dtype)
            if train:
                y00, y10, s00, s10 = fused_dual_s2_conv(
                    xp, t00, b00, t10, b10, self.corner_mode,
                    act=in_act, with_stats=True, fold_ok=fold_ok,
                )
            else:
                y00, y10 = fused_dual_s2_conv(
                    xp, t00, b00, t10, b10, self.corner_mode,
                    act=in_act, fold_ok=fold_ok,
                )
                s00 = s10 = None
            cnt = float(math.prod(y00.shape[:-1]))
            mul00, add00 = IcoBatchNorm(name="bn00", **bn)(
                {"stats": s00, "count": cnt, "features": F}
            )
            b0, s01 = IcoConvS2S(F, s - 1, stride=1, name="conv01", **kw)(
                y00, act=(mul00, add00), with_stats=train
            ) if train else (
                IcoConvS2S(F, s - 1, stride=1, name="conv01", **kw)(
                    y00, act=(mul00, add00)
                ),
                None,
            )
            mul01, add01 = IcoBatchNorm(name="bn01", **bn)(
                {"stats": s01, "count": cnt, "features": F}
            )
            mul10, add10 = IcoBatchNorm(name="bn10", **bn)(
                {"stats": s10, "count": cnt, "features": F}
            )
            out = jnp.maximum(
                b0.astype(jnp.float32) * mul01 + add01
                + y10.astype(jnp.float32) * mul10 + add10,
                0.0,
            )
            return out.astype(self.dtype)
        # XLA fallback: both stride-2 branches read the same halo — pad once
        xd = (phase_merge(x) if phases_in else x).astype(self.dtype)
        xd = _xla_act(xd, in_act)
        src = ico_pad(xd, s, self.corner_mode)
        y00 = IcoConvS2S(F, s, stride=2, name="conv00", **kw)(src, is_padded=True)
        y10 = IcoConvS2S(F, s, stride=2, name="conv10", **kw)(src, is_padded=True)
        b0 = IcoBatchNorm(name="bn00", **bn)(y00)
        b0 = nn.relu(b0)
        b0 = IcoConvS2S(F, s - 1, stride=1, name="conv01", **kw)(b0)
        b0 = IcoBatchNorm(name="bn01", **bn)(b0)
        b1 = IcoBatchNorm(name="bn10", **bn)(y10)
        return nn.relu(b0 + b1)


class UpBlock(nn.Module):
    """Residual up block (reference BasicIcoS2SUpBlock, models.py:42-62).

    The upsample is parameter-free, so the two branches share one upsampled
    tensor (identical numerics to the reference's two upsample instances).
    Maps subdivision s -> s+1.
    """

    features: int
    in_subdivisions: int
    use_bias: bool = True
    corner_mode: str = "average"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    use_pallas: bool = False
    pallas_blocks: Optional[str] = None  # per-model routing default
    # fused path: skip the XLA tail and hand (b0 phases, y10 phases, the four
    # pending BN affines) to the caller — the decoder head kernel absorbs the
    # two-affine add+ReLU so the 64-channel tensor never re-interleaves
    return_phases: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        from geniconet_tpu.ops.phase import phase_merge
        from geniconet_tpu.ops.pallas.phase_kernel import (
            fused_phase_conv_s1,
            fused_up_block,
            fused_up_dual_conv,
            fused_up_dual_conv_pair,
            merged_block_enabled,
            phase_vmem_ok,
        )

        kw = dict(corner_mode=self.corner_mode, dtype=self.dtype, use_bias=self.use_bias,
                  use_pallas=self.use_pallas)
        bn = dict(use_running_average=not train, axis_name=self.axis_name, dtype=self.dtype)
        s = self.in_subdivisions
        # phase-chain input (GENICONET_PHASE_CHAIN): the previous UpBlock's
        # raw phase pairs + pending affines — the residual tail runs as this
        # block's first-kernel prologue on the fused path (join + interleave
        # in XLA on the fallback)
        pair_in = isinstance(x, tuple) and len(x) == 3
        if pair_in:
            pb0, py10, paff = x
            h, w = 2 * pb0[0].shape[2], 2 * pb0[0].shape[3]
            cin = pb0[0].shape[-1]
        else:
            xd = x.astype(self.dtype)
            h, w = x.shape[2], x.shape[3]  # == phase shape of the s+1 grid
            cin = x.shape[-1]
        F = self.features
        if (
            self.use_pallas
            and pallas_block_enabled(self.name, self.pallas_blocks)
            and phase_vmem_ok(h, w, cin, F, n_sets=2)
        ):
            # whole block in phase form: upsample + both first convs fused
            # (the 4x-sized upsampled tensor never reaches HBM), BN moments
            # emitted by the kernels, bn00-apply+relu as the second conv's
            # in-kernel prologue, ONE interleave at the output in XLA.
            shape_ref = pb0[0] if pair_in else xd
            t00, b00 = IcoConvS2S(F, s + 1, stride=1, name="conv00", **kw)(
                shape_ref, get_params=True
            )
            t10, b10 = IcoConvS2S(F, s + 1, stride=1, name="conv10", **kw)(
                shape_ref, get_params=True
            )
            fold_ok = self.pallas_blocks is None
            if (
                train
                and not pair_in  # the merged two-pass kernel has no pair form
                and self.axis_name is None  # in-kernel affine = local moments
                and merged_block_enabled(self.name or "")
            ):
                # whole block in ONE two-pass kernel: upsample + dual conv +
                # stats (pass A), in-kernel bn00 affine + conv01 + stats
                # (pass B) — see phase_kernel.fused_up_block
                t01, b01 = IcoConvS2S(F, s + 1, stride=1, name="conv01", **kw)(
                    jnp.zeros((1, F), self.dtype), get_params=True
                )
                cnt = 4.0 * x.shape[0] * 5 * h * w

                def _run(gamma, beta):
                    b0, y10, s00, s01, s10 = fused_up_block(
                        xd, t00, b00, t10, b10, t01, b01, gamma, beta,
                        self.corner_mode, fold_ok=fold_ok,
                        fold_site=self.name or "",
                    )
                    return (b0, y10, s01, s10), s00

                b0, y10, s01, s10 = IcoBatchNorm(name="bn00", **bn)(
                    {"kernel_fn": _run, "count": cnt, "features": F}
                )
                mul01, add01 = IcoBatchNorm(name="bn01", **bn)(
                    {"stats": s01, "count": cnt, "features": F}
                )
                mul10, add10 = IcoBatchNorm(name="bn10", **bn)(
                    {"stats": s10, "count": cnt, "features": F}
                )
                if self.return_phases:
                    return b0, y10, (mul01, add01, mul10, add10)
                out = tuple(
                    jnp.maximum(
                        a.astype(jnp.float32) * mul01 + add01
                        + b.astype(jnp.float32) * mul10 + add10,
                        0.0,
                    ).astype(self.dtype)
                    for a, b in zip(b0, y10)
                )
                return phase_merge(out)
            if pair_in:
                if train:
                    y00, y10, s00, s10 = fused_up_dual_conv_pair(
                        pb0, py10, paff, t00, b00, t10, b10,
                        self.corner_mode, with_stats=True, fold_ok=fold_ok,
                    )
                else:
                    y00, y10 = fused_up_dual_conv_pair(
                        pb0, py10, paff, t00, b00, t10, b10, self.corner_mode)
                    s00 = s10 = None
            elif train:
                y00, y10, s00, s10 = fused_up_dual_conv(
                    xd, t00, b00, t10, b10, self.corner_mode, with_stats=True,
                    fold_ok=fold_ok
                )
            else:
                y00, y10 = fused_up_dual_conv(xd, t00, b00, t10, b10, self.corner_mode)
                s00 = s10 = None
            cnt = 4.0 * math.prod(y00[0].shape[:-1])
            mul00, add00 = IcoBatchNorm(name="bn00", **bn)(
                {"stats": s00, "count": cnt, "features": F}
            )
            t01, b01 = IcoConvS2S(F, s + 1, stride=1, name="conv01", **kw)(
                y00[0], get_params=True
            )
            if train:
                b0, s01 = fused_phase_conv_s1(
                    y00, t01, b01, self.corner_mode, act=(mul00, add00),
                    with_stats=True, fold_ok=fold_ok,
                    fold_site=self.name or "",
                )
            else:
                b0 = fused_phase_conv_s1(
                    y00, t01, b01, self.corner_mode, act=(mul00, add00)
                )
                s01 = None
            mul01, add01 = IcoBatchNorm(name="bn01", **bn)(
                {"stats": s01, "count": cnt, "features": F}
            )
            mul10, add10 = IcoBatchNorm(name="bn10", **bn)(
                {"stats": s10, "count": cnt, "features": F}
            )
            if self.return_phases:
                return b0, y10, (mul01, add01, mul10, add10)
            out = tuple(
                jnp.maximum(
                    a.astype(jnp.float32) * mul01 + add01
                    + b.astype(jnp.float32) * mul10 + add10,
                    0.0,
                ).astype(self.dtype)
                for a, b in zip(b0, y10)
            )
            return phase_merge(out)

        if pair_in:
            # XLA fallback of the pair prologue: the previous block's
            # residual tail + interleave (same math as the fused epilogue)
            mul1, add1, mul2, add2 = paff
            xd = phase_merge(tuple(
                jnp.maximum(
                    a.astype(jnp.float32) * mul1 + add1
                    + b.astype(jnp.float32) * mul2 + add2,
                    0.0,
                ).astype(self.dtype)
                for a, b in zip(pb0, py10)
            ))
        up = ico_upsample_s2s(xd, s, self.corner_mode)
        # both branches read the same upsampled halo — pad once (the route
        # when the fused kernels would exceed scoped VMEM at s>=6)
        src = ico_pad(up, s + 1, self.corner_mode)
        b0 = IcoConvS2S(self.features, s + 1, stride=1, name="conv00", **kw)(src, is_padded=True)
        b0 = IcoBatchNorm(name="bn00", **bn)(b0)
        b0 = nn.relu(b0)
        b0 = IcoConvS2S(self.features, s + 1, stride=1, name="conv01", **kw)(b0)
        b0 = IcoBatchNorm(name="bn01", **bn)(b0)
        b1 = IcoConvS2S(self.features, s + 1, stride=1, name="conv10", **kw)(src, is_padded=True)
        b1 = IcoBatchNorm(name="bn10", **bn)(b1)
        return nn.relu(b0 + b1)
