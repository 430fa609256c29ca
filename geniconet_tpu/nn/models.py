"""The GenIcoNet model family: icosahedral autoencoder (IcoAE) and VAE (IcoVAE).

Architecture re-specified from the reference (models.py:101-232 for ico2ico,
models.py:162-300 for ico2ico_vae; only the trained 'residualS2S' variant is
built — the 'simple' branches in the reference return None and are dead):

IcoAE (ico2ico):
  encoder: IcoConvS2S(3→w0, s) + BN + ReLU;
           Down(w0→w1, s→s-1); Down(w1→w2, s-1→s-2); Down(w2→w2, s-2→s-3)
  bottleneck: (w2, 5·2^(s-3), 2^(s-2)) — e.g. (256, 20, 8) at s=5
  decoder: Up(w2→w2); Up(w2→w1); Up(w1→w0); 1×1 conv(w0→3) + tanh

IcoVAE (ico2ico_vae):
  encoder: IcoConvS2S(3→w0, s) + BN + ReLU; Down(w0→w1); Down(w1→w2)  (stops at s-2)
  mu / logvar heads: IcoConvS2S(w2→wz, stride 2) + BN  → latent (wz, 5·2^(s-3), 2^(s-2))
  reparameterize: z = mu + eps·exp(0.5·logvar), explicit PRNG
  decoder: Up(wz→w2); Up(w2→w1); Up(w1→w0); 1×1 conv(w0→3) + tanh

Defaults (w0, w1, w2, wz) = (64, 128, 256, 512) and s=5 match the reference's
trained configuration. ``encode``/``decode`` are first-class methods — the
reference's split ico2enc / enc2ico models + filtered checkpoint loading
(reference models.py:234-340, run.py:360-367) are served by calling these
methods on the full model via ``flax``'s ``apply(method=...)``, no weight
surgery needed.

Public tensor format: grid ``(B, 5·2^s, 2^(s+1), C)`` channels-last; latents
``(B, 5·2^(s-3), 2^(s-2), wz)``. The VAE forward returns
``(recon, mu, logvar)`` like the reference (models.py:94-97).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from geniconet_tpu.nn.layers import DownBlock, IcoBatchNorm, IcoConvS2S, UpBlock
from geniconet_tpu.ops.conv import merge_charts, split_charts

__all__ = ["IcoAE", "IcoVAE", "IcoIdentity", "reparameterize"]


class IcoIdentity(nn.Module):
    """Debug model: output == input plus a zero-effect parameter, so the
    training loop's gradient machinery can be exercised with a known-identity
    forward (reference `Identity`, models.py:64-73)."""

    subdivisions: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        W = self.param("W", nn.initializers.normal(1.0), (1, *x.shape[1:]))
        return x + (W - W)  # zero contribution, zero gradient — like x+cat(W)-cat(W)


def reparameterize(rng: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * exp(0.5*logvar), eps ~ N(0,1) (reference models.py:89-92)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, std.shape, std.dtype)
    return eps * std + mu


def _is_packed_phases(x) -> bool:
    """Whether ``x`` is the lane-packed 4-phase input (B, 5, h, w, 4*3) the
    device-resident pipeline produces (vs a chart-split grid, which is 4-D
    before split_charts or 5-D with C=3 after)."""
    return getattr(x, "ndim", 0) == 5 and x.shape[-1] == 12


# lanes of the pre-gathered conv_in im2col table: 4 phases x 7 taps x C=3
# (ops/phase.conv_im2col, packed phase-major: lane 21*p + 3*t + c)
COL_LANES = 4 * 7 * 3


def _is_col_packed(x) -> bool:
    """Whether ``x`` is the pre-gathered encoder-front im2col table row
    (B, 5, h, w, 84) — built once per dataset (trainer.prepared_tables under
    GENICONET_COL_FRONT) because the input halo is data, not activations.
    conv_in then degenerates to four (rows, 21)x(21, w0) matmuls."""
    return getattr(x, "ndim", 0) == 5 and x.shape[-1] == COL_LANES


class _Encoder(nn.Module):
    subdivisions: int
    widths: tuple[int, ...]  # e.g. (64, 128, 256, 256) AE / (64, 128, 256) VAE
    corner_mode: str
    dtype: Any
    axis_name: Optional[str]
    use_pallas: bool = False
    pallas_blocks: Optional[str] = None  # per-model routing default

    @nn.compact
    def __call__(self, x, train: bool = False):
        """``x`` is a chart-split grid ``(B, 5, H, W, C)`` or its 4-tuple of
        parity phases (the device-resident pipeline pre-splits inputs once,
        so the per-step phase slice of the raw input vanishes)."""
        import math

        from geniconet_tpu.ops.pallas.phase_kernel import (
            fused_phase_conv_s1,
            phase_vmem_ok,
        )
        from geniconet_tpu.ops.phase import phase_merge, phase_split

        kw = dict(corner_mode=self.corner_mode, dtype=self.dtype, use_pallas=self.use_pallas)
        bn = dict(axis_name=self.axis_name, dtype=self.dtype)
        s = self.subdivisions
        w0 = self.widths[0]
        phases_in = isinstance(x, (tuple, list))
        # lane-packed phases (B, 5, h, w, 4·3): the pipeline packs the 4
        # input phases into 12 lanes so the tiny-cin tensors don't waste
        # 125/128 lanes of every transfer (ops/pallas/phase_kernel.py)
        packed_in = (not phases_in) and x.ndim == 5 and x.shape[-1] == 12
        col_in = (not phases_in) and _is_col_packed(x)
        if packed_in or col_in:
            ph2, pw2 = x.shape[2], x.shape[3]
        else:
            ph2, pw2 = (x[0].shape[2], x[0].shape[3]) if phases_in else (
                x.shape[2] // 2, x.shape[3] // 2)
        if col_in and len(self.widths) > 1:
            # pre-gathered im2col route (GENICONET_COL_FRONT): the halo
            # gather of the DATA input was done once at table-preparation
            # time (ops/phase.conv_im2col), so conv_in is four plain
            # (rows, 21)x(21, w0) matmuls — no phase_pad, no in-kernel
            # lane shuffles, and the weight gradient is xcol^T·g by
            # autodiff. bn_in-apply + relu stay fused into down0's first
            # kernel as the (mul, add) prologue, like the fused route.
            from geniconet_tpu.nn.layers import _xla_stats

            conv_in = IcoConvS2S(w0, s, stride=1, name="conv_in", **kw)
            t_in, b_in = conv_in(x[..., :3], get_params=True)
            wcat = t_in.reshape(7 * 3, w0)  # concat_t(taps[t]), tap-major
            xc = x.astype(self.dtype)
            x = tuple(
                xc[..., 21 * p : 21 * (p + 1)] @ wcat
                + (0 if b_in is None else b_in)
                for p in range(4)
            )
            st = None
            if train:
                st = _xla_stats(x[0])
                for p in range(1, 4):
                    st = st + _xla_stats(x[p])
            cnt = 4.0 * math.prod(x[0].shape[:-1])
            in_act = IcoBatchNorm(
                use_running_average=not train, name="bn_in", **bn
            )({"stats": st, "count": cnt, "features": w0})
            for k, width in enumerate(self.widths[1:]):
                x = DownBlock(
                    width, s - k, axis_name=self.axis_name, name=f"down{k}",
                    corner_mode=self.corner_mode, dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    pallas_blocks=self.pallas_blocks,
                )(x, train=train, in_act=in_act if k == 0 else None)
            return phase_merge(x) if isinstance(x, tuple) else x
        if col_in:
            # single-stage encoder: recover the raw phases from the center
            # taps (t=3 -> lanes 21p+9..21p+12) and take the standard path
            x = tuple(x[..., 21 * p + 9 : 21 * p + 12] for p in range(4))
            phases_in = True
        # bn_in-apply + relu become down0's first-kernel prologue on the
        # fused path (the activated s-level tensor never reaches HBM)
        from geniconet_tpu.nn.layers import pallas_block_enabled

        fuse_in = (
            self.use_pallas
            and pallas_block_enabled("conv_in", self.pallas_blocks)
            and s >= 2
            and len(self.widths) > 1
            and phase_vmem_ok(ph2, pw2, w0, self.widths[1], n_sets=2)
        )
        if fuse_in:
            # conv_in runs in phase form: the input's phase split costs a
            # pass over the tiny 3-channel tensor, while the phase OUTPUTS
            # feed down0's dual-s2 kernel directly — the 64-channel level-s
            # tensor is never interleaved or relayouted in HBM (round-3
            # trace: the standard-layout form paid ~0.56 ms/step in copies)
            conv_in = IcoConvS2S(w0, s, stride=1, name="conv_in", **kw)
            shape_ref = (x[0] if phases_in
                         else (x[..., :3] if packed_in else x))
            t_in, b_in = conv_in(shape_ref, get_params=True)
            if phases_in:
                xp = tuple(p.astype(self.dtype) for p in x)
            elif packed_in:
                xp = (x.astype(self.dtype),)  # 1-tuple marks lane-packed
            else:
                xp = phase_split(x.astype(self.dtype))
            if train:
                x, st = fused_phase_conv_s1(
                    xp, t_in, b_in, self.corner_mode, with_stats=True,
                    needs_dx=False,  # input is data — no input cotangent
                    fold_ok=self.pallas_blocks is None,
                )
            else:
                x, st = fused_phase_conv_s1(xp, t_in, b_in, self.corner_mode), None
            cnt = 4.0 * math.prod(x[0].shape[:-1])
            in_act = IcoBatchNorm(use_running_average=not train, name="bn_in", **bn)(
                {"stats": st, "count": cnt, "features": w0}
            )
        else:
            if phases_in:
                x = phase_merge(x)
            elif packed_in:
                x = phase_merge(tuple(
                    x[..., 3 * p : 3 * (p + 1)] for p in range(4)))
            x = IcoConvS2S(w0, s, stride=1, name="conv_in", **kw)(x)
            x = IcoBatchNorm(use_running_average=not train, name="bn_in", **bn)(x)
            x = nn.relu(x)
            in_act = None
        for k, width in enumerate(self.widths[1:]):
            x = DownBlock(
                width, s - k, axis_name=self.axis_name, name=f"down{k}",
                corner_mode=self.corner_mode, dtype=self.dtype,
                use_pallas=self.use_pallas, pallas_blocks=self.pallas_blocks,
            )(x, train=train, in_act=in_act if k == 0 else None)
        if isinstance(x, tuple):
            # phase-chain blocks hand phases along; one interleave at the
            # bottleneck (level s-3, e.g. (B, 5, 4, 8, 256) at s=5 — tiny)
            x = phase_merge(x)
        return x


class _Head(nn.Module):
    """The decoder's 1x1 conv head (reference models.py:151-155).

    Param tree + init match the nn.Dense it replaces (torch-style
    U(±1/sqrt(fan_in)) for kernel and bias, params fp32), so checkpoints
    cross-load between the XLA apply and the fused-kernel route
    (``get_params=True`` hands (kernel, bias) to ``fused_pair_head``)."""

    features: int
    fan_in: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x=None, get_params: bool = False):
        bound = 1.0 / (self.fan_in**0.5)

        def _uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", _uinit, (self.fan_in, self.features))
        bias = self.param("bias", _uinit, (self.features,))
        if get_params:
            return kernel.astype(self.dtype), bias.astype(self.dtype)
        return (
            x.astype(self.dtype) @ kernel.astype(self.dtype)
            + bias.astype(self.dtype)
        )


class _Decoder(nn.Module):
    bottleneck_subdivisions: int
    widths: tuple[int, ...]  # e.g. (256, 128, 64): outputs of each UpBlock
    out_features: int
    corner_mode: str
    dtype: Any
    axis_name: Optional[str]
    use_pallas: bool = False
    pallas_blocks: Optional[str] = None  # per-model routing default

    @nn.compact
    def __call__(self, z, train: bool = False, target=None):
        """target=(tpack, tpoles) switches to loss-fused mode: return the
        per-sample position-SSE against the packed target instead of the
        reconstruction (the AE train/eval loss path — the recon never
        reaches HBM; see fused_pair_head_mse)."""
        from geniconet_tpu.ops.pallas.phase_kernel import (
            fused_pair_head,
            fused_pair_head_mse,
            phase_chain_enabled,
        )
        from geniconet_tpu.ops.phase import phase_merge

        s = self.bottleneck_subdivisions
        x = z
        last = len(self.widths) - 1
        # phase chain (GENICONET_PHASE_CHAIN): EVERY block hands its raw
        # phases + pending affines to the next one — the residual tails run
        # as kernel prologues and no spatial tensor exists between blocks
        chain = self.use_pallas and phase_chain_enabled("dec")
        for k, width in enumerate(self.widths):
            x = UpBlock(
                width, s + k, axis_name=self.axis_name, name=f"up{k}",
                corner_mode=self.corner_mode, dtype=self.dtype,
                use_pallas=self.use_pallas, pallas_blocks=self.pallas_blocks,
                # the last block hands its raw phases + pending affines to
                # the fused head epilogue (tail+head+tanh in one kernel)
                return_phases=(self.use_pallas and (chain or k == last)),
            )(x, train=train)
        # 1x1 conv head + tanh (reference models.py:151-155)
        head = _Head(
            self.out_features, self.widths[-1], dtype=self.dtype, name="head"
        )
        if isinstance(x, tuple):  # fused route: (b0 phases, y10 phases, affines)
            from geniconet_tpu.nn.layers import pallas_block_enabled

            b0, y10, affines = x
            if not pallas_block_enabled("head", self.pallas_blocks):
                # routing probe (GENICONET_PALLAS_BLOCKS without 'head'):
                # run the last block's residual tail + head on XLA while the
                # conv blocks stay fused — the N=3 head matmuls starve the
                # MXU inside Mosaic (round-4 trace: 0.92 ms/step for
                # ~0.5 GFLOP), so XLA may schedule them better
                mul01, add01, mul10, add10 = affines
                x = phase_merge(tuple(
                    jnp.maximum(
                        a.astype(jnp.float32) * mul01 + add01
                        + b.astype(jnp.float32) * mul10 + add10,
                        0.0,
                    ).astype(self.dtype)
                    for a, b in zip(b0, y10)
                ))
            else:
                kernel, bias = head(get_params=True)
                if target is not None:
                    return fused_pair_head_mse(b0, y10, affines, kernel, bias,
                                               *target)
                outs = fused_pair_head(b0, y10, affines, kernel, bias)
                return phase_merge(outs)
        out = jnp.tanh(head(x).astype(jnp.float32))
        if target is None:
            return out
        # XLA fallback of the fused SSE — phase-sliced so the packed target
        # is consumed identically (values match the kernel bit-for-bit in
        # fp32; pinned in tests/test_round3.py)
        tpack, tpoles = target
        F = self.out_features
        sse = jnp.zeros((out.shape[0],), jnp.float32)
        for p in range(4):
            d = (out[:, :, p >> 1 :: 2, p & 1 :: 2, :]
                 - tpack[..., p * F : (p + 1) * F].astype(jnp.float32))
            sse += jnp.sum(d * d, axis=(1, 2, 3, 4))
        pn = jnp.mean(out[:, :, 0, 0, :], axis=1)
        ps = jnp.mean(out[:, :, -1, -1, :], axis=1)
        dn = pn - tpoles[:, 0:F].astype(jnp.float32)
        ds_ = ps - tpoles[:, F : 2 * F].astype(jnp.float32)
        return sse + jnp.sum(dn * dn, axis=1) + jnp.sum(ds_ * ds_, axis=1)


class IcoAE(nn.Module):
    """Deterministic icosahedral autoencoder (reference ico2ico)."""

    subdivisions: int = 5
    widths: tuple[int, int, int] = (64, 128, 256)
    corner_mode: str = "average"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    use_pallas: bool = False
    pallas_blocks: Optional[str] = None  # per-model fused-block routing

    def setup(self):
        if self.subdivisions < 3:
            raise ValueError("IcoAE needs subdivisions >= 3 (three stride-2 stages)")
        w0, w1, w2 = self.widths
        self.encoder = _Encoder(
            self.subdivisions, (w0, w1, w2, w2), self.corner_mode, self.dtype,
            self.axis_name, self.use_pallas, self.pallas_blocks,
        )
        self.decoder = _Decoder(
            self.subdivisions - 3, (w2, w1, w0), 3, self.corner_mode, self.dtype,
            self.axis_name, self.use_pallas, self.pallas_blocks,
        )

    def encode(self, x, train: bool = False):
        """grid (B, 5·2^s, 2^(s+1), 3) -> latent (B, 5·2^(s-3), 2^(s-2), w2).

        ``x`` may also be a 4-tuple of pre-split parity phases
        (B, 5, 2^(s-1), 2^s, 3) or ONE lane-packed (B, 5, 2^(s-1), 2^s, 12)
        phase array — the device-resident fast paths."""
        xc = x if (isinstance(x, (tuple, list)) or _is_packed_phases(x)
                   or _is_col_packed(x)) else split_charts(x, self.subdivisions)
        z = self.encoder(xc, train=train)
        return merge_charts(z)

    def decode(self, z, train: bool = False):
        zc = split_charts(z, self.subdivisions - 3)
        y = self.decoder(zc, train=train)
        return merge_charts(y)

    def recon_sse(self, x, tpack, tpoles, train: bool = False):
        """Per-sample position squared-error sum of the reconstruction
        against a packed target (ops/vertices.pack_target_phases) — the
        loss-fused AE path: on the fused route the reconstruction never
        reaches HBM (fused_pair_head_mse). Equals
        sum((grid_to_vertices(self(x)) - target_pos)**2) per sample.
        ``x`` may be a grid, a 4-tuple of pre-split phases, or a lane-packed
        phase array (see encode)."""
        xc = x if (isinstance(x, (tuple, list)) or _is_packed_phases(x)
                   or _is_col_packed(x)) else split_charts(x, self.subdivisions)
        z = self.encoder(xc, train=train)
        return self.decoder(z, train=train, target=(tpack, tpoles))

    def __call__(self, x, train: bool = False):
        return self.decode(self.encode(x, train=train), train=train)


class IcoVAE(nn.Module):
    """Icosahedral VAE (reference ico2ico_vae)."""

    subdivisions: int = 5
    widths: tuple[int, int, int] = (64, 128, 256)
    latent_features: int = 512
    corner_mode: str = "average"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    use_pallas: bool = False
    pallas_blocks: Optional[str] = None  # per-model fused-block routing

    def setup(self):
        if self.subdivisions < 3:
            raise ValueError("IcoVAE needs subdivisions >= 3 (three stride-2 stages)")
        w0, w1, w2 = self.widths
        self.encoder = _Encoder(
            self.subdivisions, (w0, w1, w2), self.corner_mode, self.dtype,
            self.axis_name, self.use_pallas, self.pallas_blocks,
        )
        conv_kw = dict(corner_mode=self.corner_mode, dtype=self.dtype, use_pallas=self.use_pallas)
        bn_kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        # mu / logvar heads: stride-2 conv + BN (reference models.py:268-286)
        self.mu_conv = IcoConvS2S(
            self.latent_features, self.subdivisions - 2, stride=2, name="mu_conv", **conv_kw
        )
        self.mu_bn = IcoBatchNorm(name="mu_bn", **bn_kw)
        self.logvar_conv = IcoConvS2S(
            self.latent_features, self.subdivisions - 2, stride=2, name="logvar_conv", **conv_kw
        )
        self.logvar_bn = IcoBatchNorm(name="logvar_bn", **bn_kw)
        self.decoder = _Decoder(
            self.subdivisions - 3,
            (w2, w1, w0),
            3,
            self.corner_mode,
            self.dtype,
            self.axis_name,
            self.use_pallas,
            self.pallas_blocks,
        )

    def encode_trunk(self, x, train: bool = False):
        """grid -> shared encoder features (B, 5, 2^(s-2), 2^(s-1), w2) in
        chart-split form — the conv_in/down0/down1 trunk WITHOUT the
        mu/logvar heads. Split out as a first-class method so the bs36
        split-step trainer can draw its program boundary here (the heads'
        backward rides the decoder program; artifacts/split_bisect.json:
        the full-encoder backward program crosses the backend's crash
        threshold, the trunk alone does not). ``x`` may be a grid, a
        4-tuple of pre-split phases, a lane-packed phase array, or the
        pre-gathered conv_in im2col table (see IcoAE.encode)."""
        xc = x if (isinstance(x, (tuple, list)) or _is_packed_phases(x)
                   or _is_col_packed(x)) else split_charts(x, self.subdivisions)
        return self.encoder(xc, train=train)

    def encode_heads(self, feat, train: bool = False):
        """Trunk features -> (mu, logvar) via the two stride-2 head convs
        (reference models.py:268-286)."""
        import math

        from geniconet_tpu.nn.layers import pallas_block_enabled
        from geniconet_tpu.ops.pallas.phase_kernel import (
            fused_dual_s2_conv,
            phase_vmem_ok,
        )
        from geniconet_tpu.ops.phase import phase_split

        s2 = self.subdivisions - 2
        F = self.latent_features
        if (
            self.use_pallas
            and pallas_block_enabled("heads", self.pallas_blocks)
            and s2 >= 2
            and phase_vmem_ok(feat.shape[2] // 2, feat.shape[3] // 2,
                              feat.shape[-1], F, n_sets=2)
        ):
            # mu/logvar are TWO stride-2 convs of the SAME input — exactly
            # the dual-s2 kernel's shape (a DownBlock's conv00/conv10 pair,
            # reference models.py:268-286). Round-2 VERDICT weak #4: these
            # heads were the one conv pair always routed through XLA
            # pad+conv, right where the VAE needs the fused path.
            xp = phase_split(feat.astype(self.dtype))
            t_mu, b_mu = self.mu_conv(xp[0], get_params=True)
            t_lv, b_lv = self.logvar_conv(xp[0], get_params=True)
            if train:
                y_mu, y_lv, s_mu, s_lv = fused_dual_s2_conv(
                    xp, t_mu, b_mu, t_lv, b_lv, self.corner_mode,
                    with_stats=True, fold_ok=self.pallas_blocks is None,
                )
            else:
                y_mu, y_lv = fused_dual_s2_conv(
                    xp, t_mu, b_mu, t_lv, b_lv, self.corner_mode)
                s_mu = s_lv = None
            cnt = float(math.prod(y_mu.shape[:-1]))
            mul_mu, add_mu = self.mu_bn(
                {"stats": s_mu, "count": cnt, "features": F},
                use_running_average=not train,
            )
            mul_lv, add_lv = self.logvar_bn(
                {"stats": s_lv, "count": cnt, "features": F},
                use_running_average=not train,
            )
            # BN-apply only (no ReLU on the heads) at the tiny s-3 spatial
            mu = (y_mu.astype(jnp.float32) * mul_mu + add_mu).astype(self.dtype)
            logvar = (y_lv.astype(jnp.float32) * mul_lv + add_lv).astype(self.dtype)
        else:
            mu = self.mu_bn(self.mu_conv(feat), use_running_average=not train)
            logvar = self.logvar_bn(
                self.logvar_conv(feat), use_running_average=not train)
        return merge_charts(mu), merge_charts(logvar)

    def encode(self, x, train: bool = False):
        """grid -> (mu, logvar), each (B, 5·2^(s-3), 2^(s-2), latent_features)."""
        return self.encode_heads(self.encode_trunk(x, train=train), train=train)

    def decode(self, z, train: bool = False):
        zc = split_charts(z, self.subdivisions - 3)
        y = self.decoder(zc, train=train)
        return merge_charts(y)

    def __call__(self, x, train: bool = False, sample: bool = True):
        mu, logvar = self.encode(x, train=train)
        if sample:
            z = reparameterize(self.make_rng("reparam"), mu, logvar)
        else:
            z = mu
        return self.decode(z, train=train), mu, logvar
