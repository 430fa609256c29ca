"""Training runtime: jitted fused train step, epoch loop, validation, resume.

The whole per-batch pipeline of the reference (run.py:233-278: forward →
pole reconstruction → normals/Laplacian → loss → backward → Adam → per-batch
CyclicLR) is fused into ONE jitted XLA program, executed under GSPMD data
parallelism (batch sharded over the mesh's 'data' axis, params replicated,
gradient all-reduce over ICI inserted by XLA). The LR schedule is a pure
function of the step counter, so resume needs no scheduler state.

Epoch-level behavior mirrors reference run.py:412-497: log_mesh → train →
validate → saveBestModel (EB naming + GC) → periodic saveModel → KL factor
decay, with `debug_nans` replacing torch.autograd.detect_anomaly()
(run.py:237) as the opt-in NaN sanitizer and an always-on cheap in-graph
finite check on the loss.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.losses.p2p import kl_factor_at_epoch, p2p_loss, p2pkld_loss
from geniconet_tpu.nn.models import IcoAE, IcoVAE, reparameterize
from geniconet_tpu.parallel import mesh as mesh_lib
from geniconet_tpu.train import checkpoint as ckpt
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.schedule import cyclic_triangular

__all__ = ["TrainState", "Trainer", "build_model"]


def _compiler_options() -> Optional[dict]:
    """Optional XLA compiler options applied to every trainer jit.

    ``GENICONET_COMPILER_OPTIONS="xla_tpu_scoped_vmem_limit_kib=65536,..."``
    (comma-separated key=value). This is the probe channel for XLA backend
    knobs: ``XLA_FLAGS`` cannot reach the tunneled backend's remote compiler
    — the host-side absl parser even FATALs on TPU-only flags (round-5
    sweep) — while per-jit compiler options ride the compile request.
    """
    spec = os.environ.get("GENICONET_COMPILER_OPTIONS", "")
    if not spec.strip():
        return None
    out = {}
    for item in spec.split(","):
        if item.strip():
            k, _, v = item.partition("=")
            out[k.strip()] = v.strip()
    return out or None


def _jit(fun=None, **kw):
    """jax.jit with the GENICONET_COMPILER_OPTIONS dict attached."""
    opts = _compiler_options()
    if opts:
        kw.setdefault("compiler_options", opts)
    if fun is None:
        return lambda f: jax.jit(f, **kw)
    return jax.jit(fun, **kw)


def _shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
    """Version-tolerant shard_map (jax.shard_map in new releases,
    jax.experimental.shard_map.shard_map in older ones)."""
    try:
        from jax import shard_map as sm

        try:
            return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=check_rep)
        except TypeError:
            return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=check_rep)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray   # int32 global step (drives the cyclic LR)
    rng: jax.Array      # PRNG key folded per step for VAE sampling


def _sample_channels(v: np.ndarray, groups: int = 6) -> np.ndarray:
    """Channels-last (B, H, W, C) -> (B·6, H, W, 1) image stack, sampling one
    channel out of each of six groups (reference run.py:203-211: 'one out of
    the six rotations')."""
    C = v.shape[-1]
    step = max(1, C // groups)
    idx = list(range(0, C, step))[:groups]
    imgs = v[..., idx]  # (B, H, W, 6)
    return np.moveaxis(imgs, -1, 1).reshape(-1, v.shape[1], v.shape[2], 1)


def _vae_split_mode() -> bool:
    """Round-4 VAE bs36 fast path: split the train step into three
    dispatched programs (encoder fwd / decoder+loss fwd+bwd / encoder bwd +
    Adam) so EVERY conv block stays fused while each program stays under the
    tunneled backend's program-size crash threshold (the full one-program
    fused set deterministically INTERNAL-crashes at bs36 while every 4-of-5
    subset passes — artifacts/vae36_bisect.json). Costs one extra encoder
    forward (rematerialized in the backward program) + two extra dispatches.
    DEFAULT ON since round 4: with the decoder program's loss pinned to
    the vertex-table route (allow_grid=False in _split_dec_grad — the
    grid-stencil forms push that program over the crash threshold) the
    split chain runs at ~1101-1137 meshes/s vs 951 for the fastest stable
    one-program subset (artifacts/vae36_sweep.json); sustained-run
    evidence: artifacts/sustain_vae36.json (scripts/sustain_vae36.py —
    soak.py's interleaved validate/checkpoint programs re-cross the
    crash threshold at bs36/bs40). GENICONET_VAE_SPLIT=0 opts out
    (restores the one-program all-convs-fused/heads-XLA subset)."""
    return os.environ.get("GENICONET_VAE_SPLIT", "1") == "1"


def build_model(cfg: Config, axis_name: Optional[str] = None,
                split_vae: bool = False):
    m = cfg.model
    use_pallas = m.use_pallas
    if use_pallas and jax.default_backend() != "tpu":
        print("[model] use_pallas requested but backend is not TPU; using XLA convs")
        use_pallas = False
    m = dataclasses.replace(m, use_pallas=use_pallas)
    dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32
    # VAE-bs36 crash workaround (artifacts/vae36_bisect.json): the full
    # fused VAE program deterministically crashes the tunneled v5e at
    # execution, while EVERY 4-of-5 block subset passes — route conv_in
    # (the cheapest block) + heads through XLA for that config. A model
    # ATTRIBUTE, not process state, so a second Trainer in the process
    # cannot clobber it; GENICONET_PALLAS_BLOCKS still overrides.
    pallas_blocks = None
    if m.is_vae and m.use_pallas and cfg.train.batch_size >= 24 and not split_vae:
        # round-4 sweep of every stable subset (artifacts/vae36_sweep.json):
        # all five conv blocks fused with the mu/logvar heads on XLA is the
        # fastest stable one-program config (951 vs 893 meshes/s for the
        # round-3 conv_in+heads-on-XLA workaround)
        pallas_blocks = "conv_in,down0,down1,up0,up1"
    if m.is_vae:
        return IcoVAE(
            subdivisions=m.subdivisions,
            widths=tuple(m.widths),
            latent_features=m.latent_features,
            corner_mode=m.corner_mode,
            dtype=dtype,
            use_pallas=m.use_pallas,
            axis_name=axis_name,
            pallas_blocks=pallas_blocks,
        )
    return IcoAE(
        subdivisions=m.subdivisions,
        widths=tuple(m.widths),
        corner_mode=m.corner_mode,
        dtype=dtype,
        use_pallas=m.use_pallas,
        axis_name=axis_name,
    )


class Trainer:
    """Owns model, optimizer, jitted steps and the epoch loop."""

    def __init__(self, cfg: Config, mesh=None, logger=None):
        self.cfg = cfg
        # VAE-bs36 split-step eligibility (see _vae_split_mode): decided
        # here so standalone build_model callers keep the one-program
        # 4/5-block workaround
        want_split = (
            cfg.model.is_vae
            and cfg.model.use_pallas
            and cfg.train.batch_size >= 24
            # single chip, or 1-D data-parallel mesh (round-5: the three
            # split programs run under shard_map with psum'd grads — see
            # _make_split_dp_jits); 2-D meshes keep the flattened-DP
            # monolithic route
            and (mesh is None or tuple(mesh.axis_names) == ("data",))
            and _vae_split_mode()
            # an explicit block restriction means one-program routing is
            # being probed (scripts/bisect_vae36.py, sweep_vae36.py)
            and "GENICONET_PALLAS_BLOCKS" not in os.environ
        )
        self.model = build_model(cfg, split_vae=want_split)
        self._split_step = want_split and self.model.use_pallas
        # split v3 (GENICONET_VAE_SPLIT_GRID=1): the decoder half runs as
        # TWO programs — forward + grid-stencil loss w.r.t. the outputs,
        # then a separate backward via a surrogate dot-loss — so the
        # grid-stencil loss forms (which crash the backend when combined
        # with the decoder BACKWARD in one program, artifacts/
        # vae36_sweep.json split_v2) never share a program with the
        # decoder backward. The table-route loss they replace is ~41% of
        # the v2 step's device time (round-4 VAE trace: 13.0 ms/step of
        # gather fusions).
        self._split_grid = self._split_step and mesh is None and (
            os.environ.get("GENICONET_VAE_SPLIT_GRID", "0") == "1"
        )
        self.mesh = mesh
        # GSPMD cannot partition the Pallas custom calls (side-effecting
        # custom-call sharding RET_CHECK), so fused-kernel data parallelism
        # runs the loss+grad under shard_map over the 1-D 'data' mesh with
        # explicit psums; the XLA path keeps plain GSPMD. A 2-D
        # (data, spatial) mesh spatially slices the grid, which the fused
        # kernels' in-VMEM halos do not support — fall back to XLA there.
        self._shard_map = False
        self._dp_axes = ("data",)
        if mesh is not None and self.model.use_pallas:
            axes = tuple(mesh.axis_names)
            if axes == ("data",):
                self.model = build_model(cfg, axis_name="data",
                                         split_vae=want_split)
                self._shard_map = True
            elif cfg.train.batch_size % mesh.devices.size == 0:
                # 2-D (data, spatial) mesh + fused kernels: run FLATTENED
                # data parallelism over all mesh axes instead of W-sharding
                # the grid — the fused kernels' in-VMEM halos need the full
                # W axis per device, and at s<=6 DP over N devices keeps the
                # whole ~2.3x Pallas speedup where 2-D XLA sharding loses it
                # (measured: artifacts/spatial_vs_dp.json; W-sharded XLA
                # convs pay halo collectives AND drop the fused kernels).
                # True W-sharding remains the XLA route below — the regime
                # where it wins is per-device batch < 1 (s7 memory limits).
                self._dp_axes = axes
                self.model = build_model(cfg, axis_name=axes)
                self._shard_map = True
                print("[model] use_pallas + 2-D mesh: flattened DP over "
                      f"{axes} (fused kernels keep the full grid per device)")
            else:
                print("[model] use_pallas + spatial mesh (global batch not "
                      "divisible by the device count): using XLA convs "
                      "(fused kernels need the full W axis per device)")
                cfg = dataclasses.replace(
                    cfg, model=dataclasses.replace(cfg.model, use_pallas=False)
                )
                self.cfg = cfg
                self.model = build_model(cfg)
        self.logger = logger
        o = cfg.optim
        self.lr_fn = partial(
            cyclic_triangular,
            base_lr=o.lr_base,
            max_lr=o.lr_max,
            step_size_up=o.step_size_up,
            step_size_down=o.step_size_down,
        )
        self.tx = optax.adam(
            learning_rate=lambda step: self.lr_fn(step), b1=o.b1, b2=o.b2, eps=o.eps
        )
        self.s = cfg.model.subdivisions
        self.factors = cfg.loss_factors
        self.is_vae = cfg.model.is_vae
        # AE + pos-only factors + fused kernels: route the loss through the
        # head+MSE kernel (the reconstruction never reaches HBM). Hardware-
        # validated fwd+bwd at the headline shapes (scripts/probe_phmse.py;
        # the earlier "runtime INTERNAL" was the probe jit-closing over the
        # packed target — an HLO-literal inlining crash of the tunneled
        # backend, not the kernel). GENICONET_FUSED_MSE=0 opts out.
        self._fused_mse = (
            not self.is_vae
            and self.model.use_pallas
            and self.factors.nor == 0.0
            and self.factors.lap == 0.0
            and os.environ.get("GENICONET_FUSED_MSE", "1") == "1"
        )
        self._jit_train_step = _jit(
            partial(self._train_step, with_gflow=False), donate_argnums=(0,)
        )
        # separate specialization that also materializes per-layer grad norms
        # — dispatched only on grad-flow logging steps so the hot path never
        # pays for them (reference builds its grad-flow artifact only on log
        # iterations, run.py:264-267)
        self._jit_train_step_gflow = _jit(
            partial(self._train_step, with_gflow=True), donate_argnums=(0,)
        )
        # fused-dispatch variants for device-resident datasets: the batch
        # gather happens INSIDE the jitted step, so one batch = one dispatch
        # (the separate gather/weight-put/step chain costs ~2 ms/step of host
        # dispatch latency on the tunneled backend).
        self._jit_train_step_gather = _jit(
            partial(self._train_step_gather, with_gflow=False),
            donate_argnums=(0,),
        )
        self._jit_train_step_gather_gflow = _jit(
            partial(self._train_step_gather, with_gflow=True),
            donate_argnums=(0,),
        )
        self._jit_eval_step_gather = _jit(self._eval_step_gather)
        # whole-epoch scan program (device-resident data, no mid-epoch
        # logging): ONE dispatch per epoch instead of one per step
        self._jit_train_epoch_scan = _jit(
            self._train_epoch_scan_impl, donate_argnums=(0,)
        )
        if self._split_step:
            if self._shard_map:
                self._make_split_dp_jits()
            else:
                self._jit_split_enc_fwd = _jit(self._split_enc_fwd)
                self._jit_split_dec_grad = _jit(self._split_dec_grad)
                self._jit_split_enc_bwd = _jit(
                    partial(self._split_enc_bwd, with_gflow=False),
                    donate_argnums=(0,),
                )
                self._jit_split_enc_bwd_gflow = _jit(
                    partial(self._split_enc_bwd, with_gflow=True),
                    donate_argnums=(0,),
                )
                if self._split_grid:
                    self._jit_split_dec_fwd_loss = _jit(
                        self._split_dec_fwd_loss)
                    self._jit_split_dec_bwd = _jit(self._split_dec_bwd)
        self._jit_eval_step = _jit(self._eval_step)
        self._jit_logmesh = _jit(self._logmesh_fwd)
        self._jit_encode = _jit(self._encode_fwd)
        self.last_misc = None  # VAE: last batch's (mu, logvar), run.py:274-277
        self._host_step = 0    # host-side step mirror for logging cadence

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def init_state(self, sample_input: np.ndarray, seed: int = 0) -> TrainState:
        rngs = {"params": jax.random.key(seed)}
        if self.is_vae:
            rngs["reparam"] = jax.random.key(seed + 1)
        init_model = self.model
        if getattr(init_model, "use_pallas", False):
            # init only materializes param/batch-stat VALUES, which are
            # path-independent (same init fns, same structure — pinned by
            # tests/test_model_pallas_parity.py). The XLA route skips ~14
            # batch-size-1 Mosaic kernel compiles that the fused path would
            # trigger (~2 min of the cold-compile cost on the tunneled
            # backend, where every Mosaic compile is an HTTP+subprocess
            # round trip).
            init_model = init_model.clone(use_pallas=False)
        variables = init_model.init(rngs, jnp.asarray(sample_input[:1]), train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.key(seed + 2),
        )
        return mesh_lib.replicate(state, self.mesh)

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _loss(self, params, batch_stats, rng, x, y, wt, epoch, train: bool,
              wsum=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if self.is_vae:
            apply = partial(
                self.model.apply, rngs={"reparam": rng}, train=train, sample=True
            )
            if train:
                (recon, mu, logvar), upd = apply(variables, x, mutable=["batch_stats"])
            else:
                recon, mu, logvar = apply(variables, x)
                upd = {"batch_stats": batch_stats}
            kf = kl_factor_at_epoch(
                epoch,
                step_size=self.cfg.train.factor_step_size,
                gamma=self.cfg.train.factor_gamma,
            )
            loss, metrics = p2pkld_loss(
                recon, mu, logvar, y, self.s, self.factors, kf, wt, wsum
            )
            aux = (upd["batch_stats"], metrics, (mu, logvar))
        elif self._fused_mse:
            # AE fast path: the decoder computes the per-sample position-SSE
            # in the head kernel — the reconstruction never exists in HBM
            # (pos-only factors, reference run.py:689-692). Numerics equal
            # p2p_loss's l_pos: sse/(V*3) == mean((v-t)^2, axis=(1,2)).
            from geniconet_tpu.geometry.ico import num_vertices
            from geniconet_tpu.losses.p2p import _wmean
            from geniconet_tpu.ops.vertices import pack_target_phases

            if isinstance(y, tuple):
                tpack, tpoles = y  # pre-packed by prepared_tables
            else:
                tpack, tpoles = pack_target_phases(y, self.s)
            apply = partial(
                self.model.apply, train=train, method=self.model.recon_sse
            )
            if train:
                sse, upd = apply(variables, x, tpack, tpoles,
                                 mutable=["batch_stats"])
            else:
                sse = apply(variables, x, tpack, tpoles)
                upd = {"batch_stats": batch_stats}
            V = num_vertices(self.s)
            l_pos = _wmean(sse / (V * 3.0), wt, wsum)
            loss = self.factors.pos * l_pos
            metrics = {"mse": l_pos, "cos": jnp.zeros(()), "lap": jnp.zeros(())}
            aux = (upd["batch_stats"], metrics, () if self._shard_map else None)
        else:
            if train:
                out, upd = self.model.apply(variables, x, train=True, mutable=["batch_stats"])
            else:
                out = self.model.apply(variables, x, train=False)
                upd = {"batch_stats": batch_stats}
            loss, metrics = p2p_loss(out, y, self.s, self.factors, wt, wsum)
            aux = (upd["batch_stats"], metrics, () if self._shard_map else None)
        metrics["total"] = loss
        return loss, aux

    def _dp_index(self):
        """Linearized shard index over the DP axes (inside shard_map) — the
        per-shard PRNG fold. Built by hand because older jax releases reject
        a tuple in `lax.axis_index`."""
        idx = jax.lax.axis_index(self._dp_axes[0])
        for ax in self._dp_axes[1:]:
            idx = idx * self.mesh.shape[ax] + jax.lax.axis_index(ax)
        return idx

    def _sm_value_and_grad(self, params, batch_stats, rng, x, y, wt, epoch):
        """Per-shard loss+grad under shard_map with explicit psums — exactly
        the global-batch value/gradient (each shard normalizes by the GLOBAL
        weight sum, so psum of shard gradients == global gradient). BatchNorm
        moments pmean over the DP axes inside the model (axis_name), keeping
        DP global-batch exact like the GSPMD route. ``self._dp_axes`` is
        ('data',) on the 1-D mesh or all mesh axes on the flattened-DP 2-D
        route (batch sharded over every axis)."""
        from jax.sharding import PartitionSpec as P

        axes = self._dp_axes
        rep, dat = P(), P(axes)

        def shard_fn(params, batch_stats, rng, x, y, wt, epoch):
            rng = jax.random.fold_in(rng, self._dp_index())
            wsum = jax.lax.psum(jnp.sum(wt.astype(jnp.float32)), axes)
            (loss, (bstats, metrics, misc)), grads = jax.value_and_grad(
                self._loss, has_aux=True
            )(params, batch_stats, rng, x, y, wt, epoch, True, wsum)
            # losses/metrics are local_weighted_sum / global_count — psum
            # completes the global mean; grads likewise
            loss = jax.lax.psum(loss, axes)
            grads = jax.lax.psum(grads, axes)
            metrics = jax.tree.map(lambda v: jax.lax.psum(v, axes), metrics)
            return (loss, (bstats, metrics, misc)), grads

        misc_spec = (dat, dat) if self.is_vae else ()
        fn = _shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(rep, rep, rep, dat, dat, dat, rep),
            out_specs=((rep, (rep, rep, misc_spec)), rep),
            check_rep=False,
        )
        return fn(params, batch_stats, rng, x, y, wt,
                  jnp.asarray(epoch, jnp.int32))

    def _train_step(self, state: TrainState, x, y, wt, epoch, with_gflow=False):
        rng = jax.random.fold_in(state.rng, state.step)
        if self._shard_map:
            (loss, (new_bstats, metrics, misc)), grads = self._sm_value_and_grad(
                state.params, state.batch_stats, rng, x, y, wt, epoch
            )
        else:
            (loss, (new_bstats, metrics, misc)), grads = jax.value_and_grad(
                self._loss, has_aux=True
            )(state.params, state.batch_stats, rng, x, y, wt, epoch, True)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["lr"] = self.lr_fn(state.step)
        metrics["finite"] = jnp.isfinite(loss)
        metrics["grad_norm"] = optax.global_norm(grads)
        if with_gflow:
            # per-layer grad norms (grad-flow surface, reference run.py:264-267)
            flat = jax.tree_util.tree_flatten_with_path(grads)[0]
            gflow = {}
            for path, leaf in flat:
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                gflow[name] = jnp.linalg.norm(leaf.astype(jnp.float32))
        else:
            gflow = {}
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bstats,
            opt_state=new_opt,
            step=state.step + 1,
            rng=state.rng,
        )
        return new_state, metrics, misc, gflow

    # ------------------------------------------------------------------
    # VAE split-step training (three programs; see _vae_split_mode)
    # ------------------------------------------------------------------

    def _split_enc_fwd(self, params, batch_stats, tables, idx):
        """Program 1: encoder TRUNK (conv_in/down0/down1) forward with
        BN-stats update. The mu/logvar heads ride program 2 — bisection
        (artifacts/split_bisect.json) put the full-encoder backward over
        the backend's program-size crash threshold, while the heads
        coexist fine with the decoder (vae36_sweep 'heads_fused'). Returns
        the batch_stats of the EXECUTED modules only (flax mutable
        semantics) — merged with program 2's in program 3."""
        x, _ = self._gather_batch(tables, idx)
        feat, upd = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            method="encode_trunk", train=True, mutable=["batch_stats"],
        )
        return feat, upd["batch_stats"]

    def _split_dec_grad(self, params, batch_stats, rng_key, step, feat,
                        tables, idx, wt, epoch, dp=False):
        """Program 2: mu/logvar heads + reparameterize + decoder + P2P/KLD
        loss, forward AND backward — grads w.r.t. head+decoder params and
        the trunk features.

        ``dp=True`` runs the same program per-shard under shard_map
        (``_make_split_dp_jits``): the reparam rng folds in the shard index
        (same derivation as ``_sm_value_and_grad``), each shard normalizes
        by the GLOBAL weight sum, and loss/metrics/param-grads psum to
        their global-batch values — the trunk-feature cotangent stays
        local (its features are batch-sharded)."""
        _, y = self._gather_batch(tables, idx)
        rng = jax.random.fold_in(rng_key, step)
        wsum = None
        if dp:
            rng = jax.random.fold_in(rng, self._dp_index())
            wsum = jax.lax.psum(
                jnp.sum(wt.astype(jnp.float32)), self._dp_axes)
        kf = kl_factor_at_epoch(
            epoch,
            step_size=self.cfg.train.factor_step_size,
            gamma=self.cfg.train.factor_gamma,
        )

        def loss_fn(params, feat):
            (mu, logvar), upd_h = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, feat,
                method="encode_heads", train=True, mutable=["batch_stats"],
            )
            z = reparameterize(rng, mu, logvar)
            recon, upd_d = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, z,
                method="decode", train=True, mutable=["batch_stats"],
            )
            loss, metrics = p2pkld_loss(
                recon, mu, logvar, y, self.s, self.factors, kf, wt, wsum,
                # grid-stencil forms push THIS program over the backend's
                # crash threshold (vae36_sweep: split_v2 crash vs
                # split_v2_tableloss ok) — pin the vertex-table route
                allow_grid=False,
            )
            bstats = {**upd_h["batch_stats"], **upd_d["batch_stats"]}
            return loss, (bstats, metrics, (mu, logvar))

        (loss, (bstats_dec, metrics, misc)), (g_dec, gfeat) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, feat))
        if dp:
            loss = jax.lax.psum(loss, self._dp_axes)
            metrics = jax.tree.map(
                lambda v: jax.lax.psum(v, self._dp_axes), metrics)
            g_dec = jax.lax.psum(g_dec, self._dp_axes)
        metrics["total"] = loss
        return loss, metrics, misc, bstats_dec, g_dec, gfeat

    def _split_dec_fwd_loss(self, params, batch_stats, rng_key, step, feat,
                            tables, idx, wt, epoch):
        """Split v3 program 2a: heads + reparameterize + decoder FORWARD,
        then the P2P/KLD loss on the GRID-STENCIL route, differentiated
        only w.r.t. the decoder OUTPUTS (recon, mu, logvar). No conv
        backward lives in this program, which is what keeps the grid-
        stencil forms under the backend's program-size crash threshold
        (the v2 probe crashed with loss + decoder fwd+bwd in one program).
        Returns the output cotangents for `_split_dec_bwd`."""
        _, y = self._gather_batch(tables, idx)
        rng = jax.random.fold_in(rng_key, step)
        kf = kl_factor_at_epoch(
            epoch,
            step_size=self.cfg.train.factor_step_size,
            gamma=self.cfg.train.factor_gamma,
        )
        (mu, logvar), upd_h = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, feat,
            method="encode_heads", train=True, mutable=["batch_stats"],
        )
        z = reparameterize(rng, mu, logvar)
        recon, upd_d = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, z,
            method="decode", train=True, mutable=["batch_stats"],
        )

        def loss_of(recon, mu, logvar):
            loss, metrics = p2pkld_loss(
                recon, mu, logvar, y, self.s, self.factors, kf, wt,
                allow_grid=True,
            )
            return loss, metrics

        (loss, metrics), (g_recon, g_mu, g_logvar) = jax.value_and_grad(
            loss_of, argnums=(0, 1, 2), has_aux=True)(recon, mu, logvar)
        metrics["total"] = loss
        bstats_dec = {**upd_h["batch_stats"], **upd_d["batch_stats"]}
        return (loss, metrics, (mu, logvar), bstats_dec,
                g_recon, g_mu, g_logvar)

    def _split_dec_bwd(self, params, batch_stats, rng_key, step, feat,
                       g_recon, g_mu, g_logvar):
        """Split v3 program 2b: decoder-half backward via a surrogate
        dot-loss. For fixed cotangents g, grad of <f(params, feat), g> is
        exactly the VJP of f with cotangent g, so pulling program 2a's
        output cotangents through a rematerialized heads/reparam/decoder
        forward reproduces v2's (g_dec, gfeat) — the KLD's direct mu/logvar
        partials ride the same surrogate, and the P2P loss's dependence on
        mu/logvar through z backpropagates through `reparameterize` here.
        Same rematerialization class as program 3's trunk re-forward."""
        rng = jax.random.fold_in(rng_key, step)

        def surrogate(params, feat):
            (mu, logvar), _ = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, feat,
                method="encode_heads", train=True, mutable=["batch_stats"],
            )
            z = reparameterize(rng, mu, logvar)
            recon, _ = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, z,
                method="decode", train=True, mutable=["batch_stats"],
            )
            return (
                jnp.vdot(recon.astype(jnp.float32),
                         g_recon.astype(jnp.float32))
                + jnp.vdot(mu.astype(jnp.float32),
                           g_mu.astype(jnp.float32))
                + jnp.vdot(logvar.astype(jnp.float32),
                           g_logvar.astype(jnp.float32))
            )

        g_dec, gfeat = jax.grad(surrogate, argnums=(0, 1))(params, feat)
        return g_dec, gfeat

    def _split_enc_bwd(self, state, tables, idx, gfeat, g_dec,
                       bstats_enc, bstats_dec, metrics, loss,
                       with_gflow=False, dp=False):
        """Program 3: trunk forward re-materialized + backward (pull the
        gfeat cotangent through), grad merge, Adam + CyclicLR. ``dp=True``
        (shard_map DP): the local trunk grads psum to the global gradient
        before merging with the already-global ``g_dec``; Adam then runs
        replicated on every shard."""
        x, _ = self._gather_batch(tables, idx)

        def enc_fn(params):
            feat, _ = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats}, x,
                method="encode_trunk", train=True, mutable=["batch_stats"],
            )
            return feat

        _, vjp = jax.vjp(enc_fn, state.params)
        (g_enc,) = vjp(gfeat)
        if dp:
            g_enc = jax.lax.psum(g_enc, self._dp_axes)
        grads = jax.tree.map(lambda a, b: a + b, g_enc, g_dec)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["lr"] = self.lr_fn(state.step)
        metrics["finite"] = jnp.isfinite(loss)
        metrics["grad_norm"] = optax.global_norm(grads)
        if with_gflow:
            flat = jax.tree_util.tree_flatten_with_path(grads)[0]
            gflow = {
                "/".join(str(getattr(k, "key", k)) for k in path):
                    jnp.linalg.norm(leaf.astype(jnp.float32))
                for path, leaf in flat
            }
        else:
            gflow = {}
        # executed-module union: {encoder} ∪ {mu_bn, logvar_bn, decoder}
        new_bstats = {**bstats_enc, **bstats_dec}
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bstats,
            opt_state=new_opt,
            step=state.step + 1,
            rng=state.rng,
        )
        return new_state, metrics, gflow

    def _make_split_dp_jits(self):
        """Wrap the three split-step programs in shard_map over the 1-D
        'data' mesh (round-5, VERDICT #9): the shipping VAE bs36 default
        becomes data-parallel without re-merging the programs — each stays
        under the tunneled backend's program-size crash threshold while
        XLA lowers the psums onto ICI. Batch-axis operands (idx, wt, trunk
        features and their cotangent, the (mu, logvar) misc) shard over
        'data'; params/state/tables replicate (`Batches` already rep-places
        device tables under a sharding); grads/loss/metrics psum inside
        programs 2 and 3 (see the ``dp=True`` docs on those methods), so
        the chain computes exactly the global-batch step like the
        monolithic `_sm_value_and_grad` route. BatchNorm moments pmean
        over 'data' inside the model (axis_name), keeping DP global-batch
        exact. Exercised on an 8-device virtual mesh by
        `__graft_entry__.dryrun_multichip` and tests/test_round5.py."""
        from jax.sharding import PartitionSpec as P

        rep, dat = P(), P(*self._dp_axes)
        mesh = self.mesh
        self._jit_split_enc_fwd = _jit(_shard_map(
            self._split_enc_fwd, mesh=mesh,
            in_specs=(rep, rep, rep, dat),
            out_specs=(dat, rep),
        ))
        self._jit_split_dec_grad = _jit(_shard_map(
            partial(self._split_dec_grad, dp=True), mesh=mesh,
            # (params, batch_stats, rng, step, feat, tables, idx, wt, epoch)
            in_specs=(rep, rep, rep, rep, dat, rep, dat, dat, rep),
            # (loss, metrics, (mu, logvar), bstats_dec, g_dec, gfeat)
            out_specs=(rep, rep, (dat, dat), rep, rep, dat),
        ))

        def _bwd(gflow):
            return _jit(_shard_map(
                partial(self._split_enc_bwd, with_gflow=gflow, dp=True),
                mesh=mesh,
                # (state, tables, idx, gfeat, g_dec, bstats_enc,
                #  bstats_dec, metrics, loss)
                in_specs=(rep, rep, dat, dat, rep, rep, rep, rep, rep),
                out_specs=(rep, rep, rep),
            ), donate_argnums=(0,))

        self._jit_split_enc_bwd = _bwd(False)
        self._jit_split_enc_bwd_gflow = _bwd(True)

    def _split_train_step(self, state, tables, idx, wt, epoch,
                          with_gflow=False):
        """The dispatch chain for split-step training; same return contract
        as gather_train_step's step result."""
        feat, bstats_enc = self._jit_split_enc_fwd(
            state.params, state.batch_stats, tables, idx)
        if self._split_grid:
            (loss, metrics, misc, bstats_dec, g_recon, g_mu, g_logvar) = (
                self._jit_split_dec_fwd_loss(
                    state.params, state.batch_stats, state.rng, state.step,
                    feat, tables, idx, wt, epoch))
            g_dec, gfeat = self._jit_split_dec_bwd(
                state.params, state.batch_stats, state.rng, state.step,
                feat, g_recon, g_mu, g_logvar)
        else:
            loss, metrics, misc, bstats_dec, g_dec, gfeat = (
                self._jit_split_dec_grad(
                    state.params, state.batch_stats, state.rng, state.step,
                    feat, tables, idx, wt, epoch))
        fn = (self._jit_split_enc_bwd_gflow if with_gflow
              else self._jit_split_enc_bwd)
        state, metrics, gflow = fn(
            state, tables, idx, gfeat, g_dec, bstats_enc, bstats_dec,
            metrics, loss)
        return state, metrics, misc, gflow

    def _gather_batch(self, tables, idx, split_packed=False):
        if "xcol" in tables:
            # pre-gathered conv_in im2col rows (B, 5, h, w, 84): the input
            # halo is data, so it was gathered ONCE at table-preparation
            # time (ops/phase.conv_im2col) — conv_in is plain matmuls in
            # the model, no Mosaic packed-input kernel, so this form needs
            # no split_packed scan workaround. Same HBM gather bytes as
            # xpack (both minor dims pad to the 128-lane tile). AE tables
            # carry the packed target pair; VAE tables the raw vertex
            # targets (p2pkld_loss consumes them directly).
            x = tables["xcol"][idx]
            y = ((tables["tpack"][idx], tables["tpoles"][idx])
                 if "tpack" in tables else tables["y"][idx])
            return x, y
        if "xpack" in tables:
            # lane-packed phases (B, 5, h, w, 12) + pre-packed targets
            # (fused-MSE fast path): the per-step phase slice of the raw
            # input and the target pack were done ONCE at table-preparation
            # time, and the 4 C=3 phases ride ONE array so the gather
            # doesn't pay 4x the 128-lane padding of a 3-channel minor dim
            x = tables["xpack"][idx]
            if split_packed:
                # whole-epoch scan route: the packed-input Mosaic kernel
                # inside lax.scan deterministically INTERNAL-crashes the
                # tunneled backend (per-step is fine) — hand the kernels
                # the 4-tuple form via an XLA lane slice instead
                x = tuple(x[..., 3 * i : 3 * (i + 1)] for i in range(4))
            y = (tables["tpack"][idx], tables["tpoles"][idx])
            return x, y
        if "xph" in tables:  # pre-round-3 split-table layout
            x = tuple(p[idx] for p in tables["xph"])
            y = (tables["tpack"][idx], tables["tpoles"][idx])
            return x, y
        return tables["x"][idx], tables["y"][idx]

    def _train_step_gather(self, state: TrainState, tables, idx, wt, epoch,
                           with_gflow=False, split_packed=False):
        x, y = self._gather_batch(tables, idx, split_packed)
        return self._train_step(state, x, y, wt, epoch, with_gflow=with_gflow)

    def _eval_step_gather(self, state: TrainState, tables, idx, wt, epoch):
        x, y = self._gather_batch(tables, idx)
        return self._eval_step(state, x, y, wt, epoch)

    def prepared_tables(self, batches: Batches):
        """Device tables for the in-jit gather path. For the AE fused-MSE
        config (single-chip), inputs are pre-phase-split and targets
        pre-packed ONCE so neither op runs in the hot step."""
        # cache lives on the Batches object (an id()-keyed dict could alias
        # a freed Batches with a new one at the same address), keyed by mode
        # (trainers with different loss configs may share a Batches)
        di, dt = batches.device_tables()
        # col-front is a CLOSED family (640 vs 2196 meshes/s on hardware,
        # artifacts/env_sweep.json) — quarantined behind the experimental
        # umbrella like the phase_kernel families (VERDICT r4 #6)
        col_front = (
            os.environ.get("GENICONET_EXPERIMENTAL", "0") == "1"
            and os.environ.get("GENICONET_COL_FRONT", "0") == "1"
        )
        fits = (batches.sharding is None
                and di.nbytes + dt.nbytes <= 1024**3)
        prep_mode = self._fused_mse and fits
        # VAE col-front: only the input side is prepped (the P2P/KLD loss
        # consumes raw vertex targets); shrinks the trunk programs too
        # (conv_in leaves Pallas), which matters under the bs36 backend
        # program-size crash threshold (ROADMAP 'Known issue')
        vae_col = col_front and self.is_vae and fits
        cache = getattr(batches, "_gn_prepared_tables", None)
        if cache is not None and cache[0] == (prep_mode, vae_col, self.s,
                                              col_front):
            tables = cache[1]
            relaid = getattr(self, "_gather_auto_tables", None)
            if relaid is not None and tables is getattr(
                    self, "_gather_auto_src", None):
                # retire the pre-relayout copy: keeping both the original
                # and the re-laid-out tables doubles the resident dataset's
                # HBM footprint for the process lifetime
                batches._gn_prepared_tables = (cache[0], relaid)
                self._gather_auto_src = relaid
                tables = relaid
            return tables
        if prep_mode:
            from geniconet_tpu.ops.conv import split_charts
            from geniconet_tpu.ops.phase import conv_im2col, phase_split
            from geniconet_tpu.ops.vertices import pack_target_phases

            s = self.s
            corner = self.cfg.model.corner_mode
            mdtype = self.model.dtype

            @_jit
            def prep(di, dt):
                xph = phase_split(split_charts(di, s))
                tpack, tpoles = pack_target_phases(dt, s)
                if col_front:
                    # conv_in's im2col operand, gathered once: the halo of
                    # the DATA input never changes during training, so the
                    # hot step skips phase_pad + tap shuffles entirely
                    # (models._Encoder col route). Stored in the compute
                    # dtype: the step would cast right after the gather
                    # anyway, and bf16 halves the per-step gather bytes.
                    xc = conv_im2col(xph, corner)  # (4, N, 5, h, w, 21)
                    xcol = jnp.concatenate(
                        [xc[p] for p in range(4)], axis=-1
                    ).astype(mdtype)
                    return {"xcol": xcol, "tpack": tpack, "tpoles": tpoles}
                xpack = jnp.concatenate(xph, axis=-1)  # (N, 5, h, w, 12)
                return {"xpack": xpack, "tpack": tpack, "tpoles": tpoles}

            tables = prep(di, dt)
            # the raw di/dt tables only serve the streaming `Batches.epoch()`
            # path, which a prepared-tables trainer never takes — keeping
            # them cached would ~double the resident dataset's HBM footprint
            # for the process lifetime (advisor round-3). `Batches` rebuilds
            # them lazily if some other consumer does stream.
            batches._dev = None
            del di, dt
        elif vae_col:
            from geniconet_tpu.ops.conv import split_charts
            from geniconet_tpu.ops.phase import conv_im2col, phase_split

            s = self.s
            corner = self.cfg.model.corner_mode
            mdtype = self.model.dtype

            @_jit
            def prep_vae(di):
                xc = conv_im2col(phase_split(split_charts(di, s)), corner)
                return jnp.concatenate(
                    [xc[p] for p in range(4)], axis=-1).astype(mdtype)

            tables = {"xcol": prep_vae(di), "y": dt}
            batches._dev = None  # di replaced; dt rides on as tables["y"]
            del di
        else:
            tables = {"x": di, "y": dt}
        batches._gn_prepared_tables = (
            (prep_mode, vae_col, self.s, col_front), tables)
        return tables

    def gather_train_step(self, state, tables, idx, wt, epoch,
                          with_gflow=False):
        """The hot gather step. On single-device runs the step is compiled
        with XLA-chosen (AUTO) layouts for the resident tables and the
        tables are device_put into those layouts ONCE — without this, XLA
        re-lays-out whole tables inside every step (round-3 trace: a
        0.18 ms/step relayout copy of the full 180-sample target pack).
        Returns (tables, step_result); callers should thread the returned
        tables into subsequent calls (same arrays, possibly re-laid-out)."""
        if self._split_step:
            return tables, self._split_train_step(
                state, tables, idx, wt, epoch, with_gflow=with_gflow)
        if with_gflow:  # rare logging path: plain jit, accepts any layout
            return tables, self._jit_train_step_gather_gflow(
                state, tables, idx, wt, epoch)
        if tables is getattr(self, "_gather_auto_src", None):
            tables = self._gather_auto_tables
        if tables is not getattr(self, "_gather_auto_tables", None):
            relaid = self._autolayout_gather(state, tables, idx, wt)
            if relaid is None:  # sharded or otherwise ineligible
                return tables, self._jit_train_step_gather(
                    state, tables, idx, wt, epoch)
            self._gather_auto_src = tables
            self._gather_auto_tables = relaid
            tables = relaid
        if idx.shape != self._gather_auto_key[-1]:
            # ragged tail batch: rare — take the plain jit (re-layout copy)
            return tables, self._jit_train_step_gather(
                state, tables, idx, wt, epoch)
        # dispatch through a jit that PINS the probed table layouts AND the
        # state's in/out layouts to the same formats: C++ fast dispatch (an
        # AOT Compiled.__call__ costs ~18 ms/step of Python dispatch on the
        # tunneled backend) and ONE stable cache entry — with unpinned
        # layouts the donated state's output layout differed from its input
        # layout, so every chained call re-specialized the jit (measured:
        # ~1 s/step of compile-cache loads)
        if state is not getattr(self, "_gather_auto_state", None):
            state = jax.device_put(state, self._gather_auto_state_put)
        out = self._gather_auto_jit(state, tables, idx, wt, epoch)
        self._gather_auto_state = out[0]
        return tables, out

    def _autolayout_gather(self, state, tables, idx, wt):
        """Compile the gather train step with AUTO table layouts; returns
        the tables device_put into the chosen formats (or None when the
        path doesn't apply, e.g. sharded tables)."""
        import os

        from jax.experimental.layout import Format, Layout

        if os.environ.get("GENICONET_AUTO_LAYOUT", "1") != "1":
            return None
        if self.mesh is not None:  # sharded tables: GSPMD owns placement
            return None
        leaves = jax.tree.leaves(tables)
        key = (jax.tree.structure(tables),
               tuple((a.shape, str(a.dtype)) for a in leaves), idx.shape)
        if getattr(self, "_gather_auto_key", None) != key:
            jit_auto = _jit(
                partial(self._train_step_gather, with_gflow=False),
                donate_argnums=(0,),
                in_shardings=(None, Format(Layout.AUTO), None, None, None),
            )
            sds = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tables)
            compiled = jit_auto.lower(state, sds, idx, wt, 0).compile()
            # the AOT executable is only the layout PROBE — hot dispatch
            # goes through a layout-pinned jit (see gather_train_step)
            self._gather_auto_fmts = compiled.input_formats[0][1]
            # state formats: the probe's OUTPUT formats, pinned on both the
            # input and output side so chained calls reach a fixed point.
            # Typed PRNG-key leaves stay unpinned in the jit annotations
            # (their format describes the physical uint32 array; annotating
            # the logical rank-0 aval is rejected) but ARE committed to the
            # device on entry — an uncommitted key leaf made the first
            # call's signature differ from the fixed point, costing one
            # extra full-program specialization.
            def _is_key(leaf):
                return jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)

            self._gather_auto_state_fmts = jax.tree.map(
                lambda leaf, fmt: None if _is_key(leaf) else fmt,
                state, compiled.output_formats[0],
            )
            self._gather_auto_state_put = jax.tree.map(
                lambda leaf, fmt: fmt.sharding if _is_key(leaf) else fmt,
                state, compiled.output_formats[0],
            )
            self._gather_auto_jit = _jit(
                partial(self._train_step_gather, with_gflow=False),
                donate_argnums=(0,),
                in_shardings=(self._gather_auto_state_fmts,
                              self._gather_auto_fmts, None, None, None),
                out_shardings=(self._gather_auto_state_fmts, None, None,
                               None),
            )
            # layout application must go through a COMPILED copy: device_put
            # with a layout-only-different Format is a silent no-op when the
            # sharding already matches, which left tables in prep()'s layout
            # and made the pinned jit reject its own probed formats the
            # first time a program (merged blocks) probed a layout that
            # differs from prep()'s output
            self._gather_auto_relayout = _jit(
                lambda t: t, out_shardings=self._gather_auto_fmts)
            self._gather_auto_state = None
            self._gather_auto_key = key

        def _match(a, f):
            lay = getattr(f, "layout", None)
            if lay is None:
                return True
            fmt = getattr(a, "format", None)
            return fmt is not None and fmt.layout == lay

        if getattr(self, "_gather_auto_failed", None) == self._gather_auto_key:
            return None  # memoized: probed layouts unrealizable for this key
        fmts = self._gather_auto_fmts
        pairs = list(zip(jax.tree.leaves(tables), jax.tree.leaves(fmts)))
        if not all(_match(a, f) for a, f in pairs):
            tables = self._gather_auto_relayout(tables)
            pairs = list(zip(jax.tree.leaves(tables), jax.tree.leaves(fmts)))
            if not all(_match(a, f) for a, f in pairs):
                self._gather_auto_failed = self._gather_auto_key
                return None  # cannot realize the probed layouts: plain jit
        return tables

    def _eval_step(self, state: TrainState, x, y, wt, epoch):
        rng = jax.random.fold_in(state.rng, 0x7FFFFFFF)
        if self._shard_map:
            from jax.sharding import PartitionSpec as P

            axes = self._dp_axes
            rep, dat = P(), P(axes)

            def shard_fn(params, batch_stats, rng, x, y, wt, epoch):
                wsum = jax.lax.psum(jnp.sum(wt.astype(jnp.float32)), axes)
                _, (_, metrics, _) = self._loss(
                    params, batch_stats, rng, x, y, wt, epoch, False, wsum
                )
                return jax.tree.map(lambda v: jax.lax.psum(v, axes), metrics), wsum

            fn = _shard_map(
                shard_fn, mesh=self.mesh,
                in_specs=(rep, rep, rep, dat, dat, dat, rep),
                out_specs=(rep, rep),
                check_rep=False,
            )
            return fn(state.params, state.batch_stats, rng, x, y, wt,
                      jnp.asarray(epoch, jnp.int32))
        loss, (_, metrics, _) = self._loss(
            state.params, state.batch_stats, rng, x, y, wt, epoch, False
        )
        return metrics, jnp.sum(wt)

    def _encode_fwd(self, params, batch_stats, rng, x):
        """Bottleneck forward for encoding logging (reference run.py:167-215):
        AE -> the 'enc' bottleneck; VAE -> (mu, logvar, reparameterized z)."""
        variables = {"params": params, "batch_stats": batch_stats}
        if self.is_vae:
            mu, logvar = self.model.apply(
                variables, x, train=False, method=self.model.encode
            )
            z = reparameterize(rng, mu, logvar)
            return mu, logvar, z
        return self.model.apply(variables, x, train=False, method=self.model.encode)

    def _logmesh_fwd(self, params, batch_stats, x):
        variables = {"params": params, "batch_stats": batch_stats}
        if self.is_vae:
            recon, _, _ = self.model.apply(variables, x, train=False, sample=False)
        else:
            recon = self.model.apply(variables, x, train=False)
        from geniconet_tpu.ops.vertices import grid_to_vertices

        return grid_to_vertices(recon, self.s)

    # ------------------------------------------------------------------
    # epoch loops
    # ------------------------------------------------------------------

    def _train_epoch_scan_impl(self, state, tables, order, wts, epoch):
        """One WHOLE epoch as a single jitted program: the host ships the
        (nb, bs) batch plan once and `lax.scan` runs the steps on device —
        the per-step host dispatch + idx/wt transfers of the python loop
        cost ~1.2 ms/step on the tunneled backend. The first step is
        unrolled to give the misc carry (VAE (mu, logvar)) its shapes."""
        state, m0, misc, _ = self._train_step_gather(
            state, tables, order[0], wts[0], epoch, split_packed=True)

        def body(carry, ow):
            st, _, _ = carry
            idx, wt = ow
            st, metrics, mc, _ = self._train_step_gather(
                st, tables, idx, wt, epoch, split_packed=True)
            return (st, metrics, mc), None

        # carry the LAST step's metrics instead of stacking all of them:
        # the scanned route only ever reads the final step (the log cadence
        # never fires inside a scanned epoch — _can_scan_epoch), and host-
        # slicing a stacked tree cost ~8 extra dispatches per epoch on the
        # tunneled backend (~0.5 ms/step at 10-batch epochs).
        # GENICONET_SCAN_UNROLL>1 unrolls the scan body so XLA can overlap
        # one step's boundary glue (stats-fold fusions, layout copies) with
        # the next step's kernels across the iteration edge — a program-
        # size trade probed on hardware (sweep scan_unroll*).
        unroll = int(os.environ.get("GENICONET_SCAN_UNROLL", "1"))
        (state, metrics, misc), _ = jax.lax.scan(
            body, (state, m0, misc), (order[1:], wts[1:]),
            unroll=max(1, unroll))
        return state, metrics, misc

    def _can_scan_epoch(self, batches: Batches, nb: int) -> bool:
        """Scan-mode eligibility: device-resident data and no log/grad-flow
        sync due inside the epoch (those need the per-step loop). Multi-chip
        loaders qualify when every batch is full (drop_remainder train
        loaders — `Batches.epoch_order` guards the ragged invariants): the
        scan body contains the same shard_map/GSPMD step as the per-step
        path, so the whole DP epoch becomes one dispatch (round-3 VERDICT
        #4 — per-step dispatch costs ~1.2 ms/step on tunneled backends)."""
        import os

        if os.environ.get("GENICONET_EPOCH_SCAN", "1") != "1":
            return False
        if self._split_step:
            # one scanned program would re-merge the three split programs
            # into a single dispatch — exactly the program size the split
            # exists to avoid
            return False
        if not batches.device_resident or nb < 2:
            return False
        if batches.sharding is not None and not (
            batches.drop_remainder and len(batches.ds) >= batches.batch_size
        ):
            return False
        h = self._host_step

        def due(freq):  # does any step in [h, h+nb) hit the cadence?
            r = h % freq
            return r == 0 or r + nb > freq

        # the log cadence doubles as the periodic NaN/finite guard and
        # fires with or without a logger (detect_anomaly parity) — epochs
        # containing a due step take the per-step loop so the guard syncs
        if due(max(1, self.cfg.train.log_freq)):
            return False
        if self.logger is not None:
            gf = self.cfg.train.log_grad_freq
            if gf and due(gf):
                return False
        return True

    def _train_epoch_scanned(self, state, batches, tables, epoch, t0):
        """Drive one epoch through the single-dispatch scan program. The
        relaid (layout-pinned) tables and state of the per-step fast path
        are reused when present so HBM holds ONE copy of the tables."""
        order, wts, tail = batches.epoch_order()
        if tables is getattr(self, "_gather_auto_src", None):
            tables = self._gather_auto_tables
        state, last_device, misc = self._jit_train_epoch_scan(
            state, tables, jnp.asarray(order), jnp.asarray(wts), epoch)
        self._gather_auto_state = None  # scan outputs use default formats
        n = order.shape[0]
        self._host_step += n
        if self.is_vae and misc is not None:
            self.last_misc = misc
        if tail is not None:
            idx, wt = tail
            # plain jit, NOT gather_train_step: the tail's ragged idx shape
            # must never seed the auto-layout probe/pinned-jit cache (it
            # would lock full-size batches out of the fast path)
            state, m_t, misc_t, _ = self._jit_train_step_gather(
                state, tables, idx, wt, epoch)
            self._host_step += 1
            n += 1
            if self.is_vae and misc_t is not None:
                self.last_misc = misc_t
            last_device = m_t
        dt = time.perf_counter() - t0
        if self.cfg.train.debug_timing:
            per = dt / max(n, 1)
            print(f"[debug] epoch {epoch} (scan): {n} iters in {dt:.2f}s "
                  f"({per*1000:.1f} ms/iter)")
        return state, {
            "iters": n,
            "seconds": dt,
            "last": None,
            "last_device": last_device,
        }

    def train_epoch(self, state: TrainState, batches: Batches, epoch: int):
        t0 = time.perf_counter()
        n = 0
        log_freq = max(1, self.cfg.train.log_freq)
        last_metrics = None
        gf_freq = self.cfg.train.log_grad_freq
        gather = batches.device_resident
        if gather:
            tables = self.prepared_tables(batches)
            if self._can_scan_epoch(batches, len(batches)):
                return self._train_epoch_scanned(
                    state, batches, tables, epoch, t0)
            it = batches.epoch_indices()
        else:
            it = batches.epoch()
        for i, batch in enumerate(it):
            want_gflow = (
                self.logger is not None
                and gf_freq
                and self._host_step % gf_freq == 0
            )
            if gather:
                idx, wt = batch
                tables, (state, metrics, misc, gflow) = self.gather_train_step(
                    state, tables, idx, wt, epoch, with_gflow=want_gflow)
            elif self._split_step:
                # streaming loader under split mode: wrap the batch as a
                # trivial one-batch table so the split programs apply
                x, y, wt = batch
                state, metrics, misc, gflow = self._split_train_step(
                    state, {"x": x, "y": y},
                    jnp.arange(x.shape[0], dtype=jnp.int32), wt, epoch,
                    with_gflow=want_gflow)
            else:
                x, y, wt = batch
                step_fn = (self._jit_train_step_gflow if want_gflow
                           else self._jit_train_step)
                state, metrics, misc, gflow = step_fn(state, x, y, wt, epoch)
            self._host_step += 1
            n += 1
            if self.is_vae and misc is not None:
                self.last_misc = misc
            if (self._host_step - 1) % log_freq == 0:
                # periodic hard sync doubles as the NaN guard (works with or
                # without a logger; detect_anomaly parity, run.py:237).
                # Cadenced by the GLOBAL step, not the epoch-local index —
                # an epoch-local `i % log_freq` forces a host sync at the
                # top of every epoch, which serializes short epochs.
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                last_metrics = host
                if not host.get("finite", 1.0):
                    raise FloatingPointError(
                        f"non-finite loss at epoch {epoch} iter {i}: {host}"
                    )
                if self.logger is not None:
                    gstep = int(jax.device_get(state.step))
                    self.logger.scalars("trn", host, gstep)
            if want_gflow and self.logger is not None and gflow:
                gf_host = {k: float(v) for k, v in jax.device_get(gflow).items()}
                self.logger.scalars("grad_flow", gf_host, int(jax.device_get(state.step)))
        dt = time.perf_counter() - t0
        if self.cfg.train.debug_timing:
            per = dt / max(n, 1)
            print(f"[debug] epoch {epoch}: {n} iters in {dt:.2f}s ({per*1000:.1f} ms/iter)")
        # `last` is the last HOST-SYNCED metric dict (None when the global-
        # step log cadence skipped every iter of this epoch); `last_device`
        # is the final iteration's on-device metrics — callers that want a
        # fresh loss without forcing a mid-epoch sync can device_get it.
        return state, {
            "iters": n,
            "seconds": dt,
            "last": last_metrics,
            "last_device": metrics if n else None,
        }

    def validate(self, state: TrainState, batches: Batches, epoch: int):
        # accumulate weighted metric sums ON DEVICE; one host sync at the end
        # (a per-batch device_get would serialize the eval loop on TPU)
        total, count = None, None
        if batches.device_resident:
            tables = self.prepared_tables(batches)
            it = (
                (self._jit_eval_step_gather, (state, tables, idx, wt, epoch))
                for idx, wt in batches.epoch_indices()
            )
        else:
            it = (
                (self._jit_eval_step, (state, x, y, wt, epoch))
                for x, y, wt in batches.epoch()
            )
        for fn, args in it:
            metrics, b = fn(*args)
            scaled = {k: v * b for k, v in metrics.items()}
            total = scaled if total is None else {k: total[k] + scaled[k] for k in scaled}
            count = b if count is None else count + b
        if total is None:
            return {}
        host = jax.device_get({"sums": total, "count": count})
        c = max(float(host["count"]), 1.0)
        avg = {k: float(v) / c for k, v in host["sums"].items()}
        if self.logger is not None and avg:
            self.logger.scalars("val", avg, int(jax.device_get(state.step)))
        return avg

    # ------------------------------------------------------------------
    # full experiment (reference experiment_train, run.py:412-497)
    # ------------------------------------------------------------------

    def fit(self, state: TrainState, trn: Batches, val: Batches,
            start_epoch: int = 0, best_loss: float = np.inf):
        cfg = self.cfg
        name = cfg.model.name
        ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
        history = []
        for epoch in range(start_epoch, cfg.train.train_epoch):
            if (
                self.logger is not None
                and cfg.train.log_mesh_epoch
                and epoch % cfg.train.log_mesh_epoch == 0
            ):
                self._log_meshes(state, val, epoch)
            if (
                self.logger is not None
                and cfg.train.log_encoding_epoch
                and epoch % cfg.train.log_encoding_epoch == 0
                and epoch > 0  # reference skips epoch 0 (run.py:193-194)
            ):
                self._log_encoding(state, val, epoch)
            if cfg.train.profile_dir and epoch == start_epoch + 1:
                jax.profiler.start_trace(cfg.train.profile_dir)
            state, info = self.train_epoch(state, trn, epoch)
            if cfg.train.profile_dir and epoch == start_epoch + 1:
                jax.profiler.stop_trace()
            # validate with the SAME KL factor the epoch trained with — the
            # reference decays the factor only after validation (run.py:486-493)
            avg = self.validate(state, val, epoch)
            cur = avg.get("total", np.inf)
            history.append(cur)
            if cur <= best_loss:  # reference saves on ties too (run.py:318)
                best_loss = cur
                self._save(state, ckpt_dir, name, epoch + 1, cur, best=True,
                           best_loss=best_loss)
                ckpt.gc_best_checkpoints(ckpt_dir, name)
            if (epoch + 1) % cfg.train.save_epoch_freq == 0:
                self._save(state, ckpt_dir, name, epoch + 1, cur, best=False,
                           best_loss=best_loss)
        if cfg.train.train_epoch > start_epoch:
            self._save(
                state, ckpt_dir, name, cfg.train.train_epoch,
                history[-1] if history else np.inf, best=False,
                best_loss=best_loss,
            )
        return state, history

    def _save(self, state, ckpt_dir, name, epoch, loss, best, best_loss=None):
        misc = None
        if self.last_misc is not None:
            mu, logvar = jax.device_get(self.last_misc)
            misc = {"trn_mean": np.asarray(mu), "trn_logvar": np.asarray(logvar)}
        blob = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(jax.device_get(state.step)),
            "epoch": epoch,
            "loss": float(loss),
            # the running best — lets a resume from a *periodic* checkpoint
            # keep protecting the true best EB checkpoint
            "best_loss": float(best_loss if best_loss is not None else loss),
        }
        if misc is not None:
            blob["misc"] = misc
        ckpt.save_checkpoint(ckpt.checkpoint_path(ckpt_dir, name, epoch, best), blob)

    def restore(self, state: TrainState, path: str):
        """Restore a checkpoint into a fresh state.

        Returns (state, epoch, best_loss) — best_loss feeds fit() so a
        resumed run does not overwrite the true best checkpoint (reference
        loadModel restores last_best_loss, run.py:374-376)."""
        blob = ckpt.load_checkpoint(path)
        params = flax.serialization.from_state_dict(
            jax.device_get(state.params), blob["params"]
        )
        bstats = flax.serialization.from_state_dict(
            jax.device_get(state.batch_stats), blob["batch_stats"]
        )
        opt_state = flax.serialization.from_state_dict(
            jax.device_get(state.opt_state), blob["opt_state"]
        )
        new = TrainState(
            params=params,
            batch_stats=bstats,
            opt_state=opt_state,
            step=jnp.asarray(blob["step"], jnp.int32),
            rng=state.rng,
        )
        self._host_step = int(blob["step"])
        best = float(blob.get("best_loss", blob.get("loss", np.inf)))
        return mesh_lib.replicate(new, self.mesh), int(blob["epoch"]), best

    # ------------------------------------------------------------------

    def _log_encoding(self, state, val: Batches, epoch: int, k: int = 3):
        """Encoding logging over a FIXED val subset (reference run.py:167-215;
        subset = the first 3 val samples, load_log_data run.py:83-96):
        AE -> 'enc' bottleneck histogram tagged by model name; VAE -> the
        first sample's mu/logvar/reparam. With log_encoding_hist=False, the
        VAE logs channel images sampling one of six channel groups instead
        (reference run.py:203-211)."""
        try:
            gstep = int(jax.device_get(state.step))
            name = self.cfg.model.name
            if self.is_vae:
                x = jnp.asarray(val.ds.inputs[:1])  # first sample (run.py:180)
                rng = jax.random.fold_in(state.rng, epoch)
                outs = jax.device_get(
                    self._jit_encode(state.params, state.batch_stats, rng, x)
                )
                tagged = zip(("mu", "logvar", "reparam"), outs)
                if self.cfg.train.log_encoding_hist:
                    for tag, v in tagged:
                        self.logger.histogram(tag, np.asarray(v), gstep)
                else:
                    for tag, v in tagged:
                        self.logger.images(tag, _sample_channels(np.asarray(v)), gstep)
            else:
                x = jnp.asarray(val.ds.inputs[:k])
                rng = jax.random.fold_in(state.rng, epoch)
                z = np.asarray(jax.device_get(
                    self._jit_encode(state.params, state.batch_stats, rng, x)
                ))
                if self.cfg.train.log_encoding_hist:
                    self.logger.histogram(name, z, gstep)
                else:
                    for i in range(z.shape[0]):
                        self.logger.images(
                            f"{name}_{i}", _sample_channels(z[i : i + 1]), gstep
                        )
        except Exception as e:  # logging must never kill training
            print(f"[log_encoding] skipped: {e}")

    def _log_meshes(self, state, val: Batches, epoch: int, k: int = 3):
        """TB mesh logging with distance coloring (reference run.py:97-148)."""
        try:
            x = jnp.asarray(val.ds.inputs[:k])
            y = val.ds.targets[:k]
            # one jit specialization, reused every log epoch (an un-jitted
            # apply here would retrace the whole model each time)
            v = np.asarray(self._jit_logmesh(state.params, state.batch_stats, x))
            self.logger.meshes("val_recon", v, y[..., :3], self.s, epoch)
        except Exception as e:  # logging must never kill training
            print(f"[log_mesh] skipped: {e}")
