"""Experiment CLI — the run.py equivalent.

Usage (mirrors reference README.md:65-94):

    python -m geniconet_tpu.cli --model ico2ico     --process train --dataDir <npz root>
    python -m geniconet_tpu.cli --model ico2ico_vae --process train --dataDir <npz root>
    python -m geniconet_tpu.cli --model ico2ico     --process test  --dataDir <npz root>

Extras over the reference: ``--synthetic N`` trains on generated meshes (no
dataset needed), ``--compute_dtype bfloat16`` enables the TPU fast path, and
data parallelism over all local chips is on by default (disable with
``--no_data_parallel``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from geniconet_tpu.data.datasets import IcoDataset, synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.parallel import mesh as mesh_lib
from geniconet_tpu.train import checkpoint as ckpt
from geniconet_tpu.train.config import Config, parse_args
from geniconet_tpu.train.logging import Logger
from geniconet_tpu.train.trainer import Trainer


def load_datasets(cfg: Config):
    s = cfg.model.subdivisions
    if cfg.data.synthetic:
        n = cfg.data.synthetic
        trn = synthetic_dataset(s, n, seed=cfg.data.synthetic_seed)
        val = synthetic_dataset(s, max(1, n // 5), seed=cfg.data.synthetic_seed + 1)
        return trn, val
    if not cfg.data.data_dir:
        raise SystemExit("need --dataDir or --synthetic N")
    trn = IcoDataset.from_directory(
        cfg.data.data_dir, s, cfg.data.layout_level, "trn",
        cfg.data.ext, cfg.train.quick_learn,
    )
    val = IcoDataset.from_directory(
        cfg.data.data_dir, s, cfg.data.layout_level, "val",
        cfg.data.ext, cfg.train.quick_learn,
    )
    return trn, val


def experiment_train(cfg: Config):
    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)
    trn_ds, val_ds = load_datasets(cfg)
    if cfg.train.quick_learn:
        trn_ds = val_ds  # smoke-test mode (reference run.py:416-421)

    mesh = mesh_lib.make_mesh() if cfg.train.data_parallel else None
    sharding = mesh_lib.data_sharding(mesh) if mesh is not None else None
    print(f"[train] devices: {jax.devices()}  mesh: {mesh}")

    log_dir = cfg.model_log_dir()
    logger = Logger(log_dir)
    cfg.save(os.path.join(log_dir, "config.json"))
    logger.text("config", cfg.to_json())

    trainer = Trainer(cfg, mesh=mesh, logger=logger)
    state = trainer.init_state(trn_ds.inputs[:1], seed=cfg.train.seed)
    from geniconet_tpu.train.summary import count_params, model_summary

    print(f"[train] optimizable parameters: {count_params(state.params)}")

    # model summary + graph drawing saved at train start (torchsummary
    # summary_string/draw_graph parity, reference run.py:427-430)
    try:
        from geniconet_tpu.train.summary import model_graph_dot

        rngs = {"params": jax.random.key(0)}
        if cfg.model.is_vae:
            rngs["reparam"] = jax.random.key(1)
        summ = model_summary(trainer.model, jnp.asarray(trn_ds.inputs[:1]), rngs)
        with open(os.path.join(log_dir, f"train_{cfg.model.name}_summary.txt"), "w") as f:
            f.write(summ)
        logger.text("model_summary", summ)
        dot = model_graph_dot(trainer.model, trn_ds.inputs[:1], rngs)
        with open(os.path.join(log_dir, f"train_{cfg.model.name}_graph.dot"), "w") as f:
            f.write(dot)
    except Exception as e:
        print(f"[train] summary skipped: {e}")

    start_epoch = 0
    best_loss = np.inf
    if cfg.train.load_pretrained_model:
        ckpt_dir = os.path.join(log_dir, "savedModel")
        ep = cfg.train.load_epoch
        if ep == 0:
            ep = ckpt.latest_best_epoch(ckpt_dir, cfg.model.name)
            path = ckpt.checkpoint_path(ckpt_dir, cfg.model.name, ep, best=True) if ep else None
        else:
            path = ckpt.checkpoint_path(ckpt_dir, cfg.model.name, ep, best=False)
            if not os.path.exists(path):
                path = ckpt.checkpoint_path(ckpt_dir, cfg.model.name, ep, best=True)
        if path and os.path.exists(path):
            state, start_epoch, best_loss = trainer.restore(state, path)
            print(f"[train] resumed from {path} (epoch {start_epoch}, best {best_loss:.5f})")
        else:
            print("[train] no checkpoint found to resume; starting fresh")

    resident = cfg.data.device_resident_flag()
    trn = Batches(trn_ds, cfg.train.batch_size, shuffle=True, sharding=sharding,
                  seed=cfg.train.seed, device_resident=resident)
    val = Batches(val_ds, cfg.train.batch_size, shuffle=False, sharding=sharding,
                  device_resident=resident)
    state, history = _fit_with_retry(
        cfg, trainer, state, trn, val, start_epoch, best_loss
    )
    logger.close()
    return history


def _transient_backend_error(e: BaseException) -> bool:
    """Transient accelerator-runtime failures worth an auto-resume: the
    tunneled TPU backend surfaces these as INTERNAL / FAILED_PRECONDITION
    JaxRuntimeErrors mid-run (observed killing a 120-epoch soak at round 2)."""
    s = f"{type(e).__name__}: {e}"
    return ("INTERNAL" in s or "FAILED_PRECONDITION" in s
            or "UNAVAILABLE" in s or "DEADLINE_EXCEEDED" in s)


def _fit_with_retry(cfg, trainer, state, trn, val, start_epoch, best_loss):
    """Run trainer.fit, auto-resuming from the newest checkpoint after a
    transient backend error (cfg.train.backend_retries attempts). Training
    state between checkpoints is lost; everything after the last EB/E save
    re-runs — the same manual-resume semantics the reference offers
    (run.py:459-462), automated."""
    import time as _time

    retries = cfg.train.backend_retries
    attempt = 0
    while True:
        try:
            return trainer.fit(state, trn, val, start_epoch, best_loss)
        except Exception as e:  # noqa: BLE001 — filtered just below
            if attempt >= retries or not _transient_backend_error(e):
                raise
            attempt += 1
            wait = min(60 * attempt, 300)
            print(f"[train] transient backend error ({e!r}); retry "
                  f"{attempt}/{retries} in {wait}s from the latest checkpoint")
            _time.sleep(wait)
            ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
            path = ckpt.latest_checkpoint(ckpt_dir, cfg.model.name)
            state = trainer.init_state(
                trn.ds.inputs[:1], seed=cfg.train.seed
            )
            if path:
                state, start_epoch, best_loss = trainer.restore(state, path)
                print(f"[train] resumed from {path} (epoch {start_epoch})")
            else:
                start_epoch, best_loss = 0, np.inf
                print("[train] no checkpoint found; restarting from scratch")


def experiment_encode(cfg: Config):
    """Export per-sample latent encodings as .npz (key 'arr_0' — the format
    the reference's enc datasets read back, data.py:38-44). Serves the
    reference's ico2enc flow (data.py:103-119) without split models."""
    import jax.numpy as jnp

    from geniconet_tpu.app.state import AppState

    st = AppState()
    infos = []
    for instance in ("trn", "val"):
        try:
            info = st.load(cfg, instance)
        except FileNotFoundError as e:
            print(f"[encode] {instance}: {e}")
            continue
        out_dir = os.path.join(
            cfg.out_dir or os.path.join(cfg.model_log_dir(), "data"), "enc", instance
        )
        os.makedirs(out_dir, exist_ok=True)
        for k, name in enumerate(st.dataset.names):
            z = st.latents[k]
            if st.logvars is not None:
                np.savez(os.path.join(out_dir, name + ".npz"), st.latents[k],
                         logvar=st.logvars[k])
            else:
                np.savez(os.path.join(out_dir, name + ".npz"), z)
        print(f"[encode] wrote {len(st.dataset.names)} encodings to {out_dir}")
        infos.append(info)
    return infos


def _test_dataset(cfg: Config):
    s = cfg.model.subdivisions
    instance = cfg.data_instance  # reference --data_instance (run.py:546)
    if cfg.data.synthetic:
        off = 0 if instance == "trn" else 1
        return synthetic_dataset(s, cfg.data.synthetic, seed=cfg.data.synthetic_seed + off)
    return IcoDataset.from_directory(
        cfg.data.data_dir, s, cfg.data.layout_level, instance,
        cfg.data.ext, cfg.train.quick_learn,
    )


def experiment_test(cfg: Config):
    from geniconet_tpu.eval.test_driver import run_test

    return run_test(cfg, _test_dataset(cfg))


def experiment_decode(cfg: Config):
    """Decode an enc-npz directory through the decoder half (reference
    enc2ico flow, data.py:121-148) — distances vs the val dataset when one
    is available."""
    from geniconet_tpu.eval.test_driver import run_decode

    ref = None
    if cfg.data.synthetic:
        # the same dataset --process encode encoded (AppState.load seed)
        ref = synthetic_dataset(
            cfg.model.subdivisions, cfg.data.synthetic, seed=cfg.data.synthetic_seed
        )
    elif cfg.data.data_dir:
        ref = _test_dataset(cfg)
    return run_decode(cfg, ref)


def experiment_sample(cfg: Config):
    """Draw novel meshes from the checkpoint's stored (mu, logvar) misc —
    the reference's ``enc2ico_vae.createSample`` capability (models.py:329-332)
    with its exact formula ``z = trn_mean + trn_logvar * eps`` (note: the
    reference scales by logvar itself, not exp(0.5*logvar); kept verbatim for
    parity). No dataset needed: the misc is the last training batch's
    (mu, logvar) saved with every checkpoint (reference run.py:274-277,336)."""
    from geniconet_tpu.data.offio import write_off
    from geniconet_tpu.eval.test_driver import resolve_checkpoint
    from geniconet_tpu.geometry import ico as ico_geom
    from geniconet_tpu.ops.vertices import grid_to_vertices

    path = resolve_checkpoint(cfg)
    blob = ckpt.load_checkpoint(path)
    misc = blob.get("misc")
    if not misc or "trn_mean" not in misc:
        raise SystemExit(
            f"{path} carries no (mu, logvar) misc — train a VAE first "
            "(the AE checkpoint has no latent distribution to sample)"
        )
    mu = np.asarray(misc["trn_mean"], np.float32)
    logvar = np.asarray(misc["trn_logvar"], np.float32)
    rng = np.random.RandomState(cfg.train.seed)
    idx = rng.randint(0, mu.shape[0], size=cfg.n_samples)
    z = mu[idx] + logvar[idx] * rng.randn(*mu[idx].shape).astype(np.float32)

    s = cfg.model.subdivisions
    H, W = ico_geom.grid_shape(s)
    trainer = Trainer(cfg)
    state = trainer.init_state(np.zeros((1, H, W, 3), np.float32), seed=cfg.train.seed)
    state, epoch, _ = trainer.restore(state, path)
    model = trainer.model
    variables = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats}
    )

    @jax.jit
    def _decode(vars_, zz):
        recon = model.apply(vars_, zz, train=False, method=model.decode)
        return grid_to_vertices(recon, s)

    verts = np.asarray(_decode(variables, jnp.asarray(z)))
    faces = ico_geom.get_ico_faces(s)
    out_dir = os.path.join(
        cfg.out_dir or os.path.join(cfg.model_log_dir(), "data"), "sample"
    )
    os.makedirs(out_dir, exist_ok=True)
    for k in range(verts.shape[0]):
        write_off(os.path.join(out_dir, f"sample_{k:03d}.off"), verts[k], faces)
    print(f"[sample] wrote {verts.shape[0]} sampled meshes (epoch {epoch}) to {out_dir}")
    return out_dir


def import_pt_checkpoint(cfg: Config) -> str:
    """Convert a reference PyTorch ``.pt`` checkpoint (``--load_pt``) into a
    native ``.ckpt`` under ``<logDir>/savedModel`` so every downstream
    process (train resume, test, encode, decode, sample, app) finds it
    through the normal EB resolution — the drop-in-consumer path for the
    reference's published weights (reference run.py:330-340 save format;
    torch-free reader in train/pt_import.py)."""
    import flax.serialization

    from geniconet_tpu.geometry import ico as ico_geom
    from geniconet_tpu.train.pt_import import load_reference_checkpoint

    imported = load_reference_checkpoint(cfg.load_pt, cfg.model.name)
    H, W = ico_geom.grid_shape(cfg.model.subdivisions)
    trainer = Trainer(cfg)
    state = trainer.init_state(
        np.zeros((1, H, W, 3), np.float32), seed=cfg.train.seed)
    # from_state_dict validates STRUCTURE only — check every leaf's shape
    # against the live model explicitly so a widths/subdivision mismatch
    # fails here, at the import, not later with a cryptic apply error
    params = flax.serialization.from_state_dict(
        jax.device_get(state.params), imported["params"])
    bstats = flax.serialization.from_state_dict(
        jax.device_get(state.batch_stats), imported["batch_stats"])

    def _check_shapes(live, got, what):
        bad = []
        live_f = jax.tree_util.tree_flatten_with_path(live)[0]
        got_f = jax.tree_util.tree_flatten_with_path(got)[0]
        for (pa, a), (_, b) in zip(live_f, got_f):
            if tuple(np.shape(a)) != tuple(np.shape(b)):
                name = "/".join(str(getattr(k, "key", k)) for k in pa)
                bad.append(f"{name}: model {np.shape(a)} vs "
                           f"checkpoint {np.shape(b)}")
        if bad:
            raise ValueError(
                f"imported {what} do not fit the configured model "
                f"(--model {cfg.model.name}, subdivision "
                f"{cfg.model.subdivisions}, widths {cfg.model.widths}): "
                + "; ".join(bad[:5]))

    _check_shapes(jax.device_get(state.params), params, "params")
    _check_shapes(jax.device_get(state.batch_stats), bstats, "batch_stats")
    misc = None
    raw_misc = imported.get("misc")
    if raw_misc:  # reference run.py:274-277: [{'trn_mean': .., 'trn_logvar': ..}]
        entry = raw_misc[0] if isinstance(raw_misc, (list, tuple)) else raw_misc
        if isinstance(entry, dict) and "trn_mean" in entry:
            misc = {"trn_mean": np.asarray(entry["trn_mean"], np.float32),
                    "trn_logvar": np.asarray(entry["trn_logvar"], np.float32)}
    epoch = imported["epoch"]
    blob = {
        "params": params,
        "batch_stats": bstats,
        "opt_state": jax.device_get(state.opt_state),  # fresh Adam moments
        "step": 0,
        "epoch": epoch,
        "loss": imported["loss"] if imported["loss"] is not None else np.inf,
        "best_loss": imported["loss"] if imported["loss"] is not None else np.inf,
    }
    if misc is not None:
        blob["misc"] = misc
    ckpt_dir = os.path.join(cfg.model_log_dir(), "savedModel")
    path = ckpt.checkpoint_path(ckpt_dir, cfg.model.name, epoch, best=True)
    ckpt.save_checkpoint(path, blob)
    print(f"[load_pt] imported {cfg.load_pt} -> {path} (epoch {epoch})")
    return path


def main(argv=None):
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    cfg = parse_args(argv)
    if cfg.load_pt:
        import_pt_checkpoint(cfg)
    if cfg.process == "train":
        experiment_train(cfg)
    elif cfg.process == "encode":
        experiment_encode(cfg)
    elif cfg.process == "decode":
        experiment_decode(cfg)
    elif cfg.process == "sample":
        experiment_sample(cfg)
    else:
        experiment_test(cfg)


if __name__ == "__main__":
    main()
