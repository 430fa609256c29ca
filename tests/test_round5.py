"""Round-5 items: crash-resilient bench orchestrator (VERDICT r4 #1),
honest sustain artifacts (ADVICE r4), and VAE split-step data parallelism
over the 1-D mesh (VERDICT r4 #9)."""

import importlib.util
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _bench():
    if "bench_mod" in sys.modules:
        return sys.modules["bench_mod"]
    mod = _load(os.path.join(REPO, "bench.py"), "bench_mod")
    sys.modules["bench_mod"] = mod
    return mod


class TestParsePhaseOutput:
    def test_sections_and_done(self):
        b = _bench()
        out = (
            "noise line\n"
            'BENCH_SECTION {"compile_first_step_s": 12.3}\n'
            'BENCH_SECTION {"value_scan": 2200.0}\n'
            "PHASE_DONE\n"
        )
        fresh, done = b._parse_phase_output(out)
        assert done
        assert fresh == {"compile_first_step_s": 12.3, "value_scan": 2200.0}

    def test_crash_mid_stream_keeps_completed_sections(self):
        # BENCH_r04 failure mode: epoch-loop sync raised INTERNAL after the
        # per-step section had printed — those sections must survive
        b = _bench()
        out = (
            'BENCH_SECTION {"compile_first_step_s": 572.5}\n'
            'BENCH_SECTION {"value_per_step_dispatch": 2182.7}\n'
            "Traceback (most recent call last):\n"
            "jax.errors.JaxRuntimeError: INTERNAL: TPU backend error\n"
        )
        fresh, done = b._parse_phase_output(out)
        assert not done
        assert fresh["value_per_step_dispatch"] == 2182.7

    def test_malformed_section_line_tolerated(self):
        b = _bench()
        fresh, done = b._parse_phase_output(
            "BENCH_SECTION {not json\n" 'BENCH_SECTION {"ok": 1}\n')
        assert fresh == {"ok": 1}
        assert not done


class TestHeadlineValue:
    def test_takes_best_step_measurement(self):
        b = _bench()
        v, src = b._headline_value(
            {"value_scan": 3, "epoch_loop_value": 9,
             "value_per_step_dispatch": 1})
        assert v == 3 and src == "single-dispatch scan"
        # degraded nb=5 shape: 5-step scan windows carry more per-window
        # overhead than a pipelined 30-step per-step run — the headline
        # takes whichever measured higher (same program either way)
        v, src = b._headline_value(
            {"value_scan": 2065.0, "value_per_step_dispatch": 2183.0})
        assert v == 2183.0 and src == "per-step dispatch"

    def test_epoch_loop_is_last_resort(self):
        b = _bench()
        v, src = b._headline_value({"epoch_loop_value": 2})
        assert v == 2 and "epoch loop" in src
        v, src = b._headline_value({"value_per_step_dispatch": 1})
        assert v == 1 and "per-step dispatch" in src

    def test_empty(self):
        b = _bench()
        v, _ = b._headline_value({})
        assert v is None


class TestSustainArtifact:
    """ADVICE r4: in-flight artifacts must record observed crashes (never a
    hardcoded 0) and complete=False; only the final write asserts done."""

    def _write(self, tmp_path, crashes, done):
        mod = _load(os.path.join(REPO, "scripts", "sustain_vae36.py"),
                    "sustain_mod_r5")
        mod.ARTIFACT = str(tmp_path / "sustain.json")

        class A:
            batch_size = 36

        hb = [{"t": 0.0, "steps": 400, "meshes_per_s": 1400.0,
               "loss": 0.123}]
        mode = {"split_step": True, "env": {}}
        mod._write(A(), 60.0, 400, hb, mode, crashes, done)
        return json.load(open(mod.ARTIFACT))

    def test_inflight_records_observed_crashes(self, tmp_path):
        out = self._write(tmp_path, crashes=2, done=False)
        assert out["crashes"] == 2
        assert out["complete"] is False

    def test_mode_recorded_not_assumed(self, tmp_path):
        out = self._write(tmp_path, crashes=0, done=True)
        assert out["complete"] is True
        assert "split_step" in out["mode"]
        assert out["meshes"] == 400 * 36


def test_scan_unroll_matches_default(monkeypatch):
    """GENICONET_SCAN_UNROLL=2 (XLA overlap probe for the epoch-scan
    program) must not change the trajectory."""
    from geniconet_tpu.data.datasets import synthetic_dataset
    from geniconet_tpu.data.pipeline import Batches
    from geniconet_tpu.train.config import Config
    from geniconet_tpu.train.trainer import Trainer

    def run(unroll):
        if unroll:
            monkeypatch.setenv("GENICONET_SCAN_UNROLL", unroll)
        else:
            monkeypatch.delenv("GENICONET_SCAN_UNROLL", raising=False)
        cfg = Config()
        cfg.model.name = "ico2ico"
        cfg.model.subdivisions = 3
        cfg.model.widths = (8, 12, 16)
        cfg.train.batch_size = 8
        cfg.train.log_freq = 10_000
        cfg.train.log_grad_freq = 0
        ds = synthetic_dataset(3, 32, seed=0)
        tr = Trainer(cfg)
        st = tr.init_state(ds.inputs[:1], seed=3)
        b = Batches(ds, 8, shuffle=True, seed=11)
        tr._host_step = 1
        assert tr._can_scan_epoch(b, len(b))
        st, info = tr.train_epoch(st, b, 0)
        return (float(jax.device_get(info["last_device"]["total"])),
                jax.device_get(st.params))

    l1, p1 = run(None)
    l2, p2 = run("2")
    np.testing.assert_allclose(l2, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# closed-family quarantine (VERDICT r4 #6)
# ---------------------------------------------------------------------------


class TestExperimentalQuarantine:
    """Knobs of families measured negative/crashing on hardware are inert
    unless GENICONET_EXPERIMENTAL=1 — the shipping surface is the default
    path plus live knobs only."""

    def test_knobs_inert_without_umbrella(self, monkeypatch):
        from geniconet_tpu.ops.pallas import phase_kernel as pk

        monkeypatch.delenv("GENICONET_EXPERIMENTAL", raising=False)
        monkeypatch.setenv("GENICONET_MERGED_BLOCK", "all")
        monkeypatch.setenv("GENICONET_PHASE_CHAIN", "1")
        monkeypatch.setenv("GENICONET_MERGED_BWD", "all")
        monkeypatch.setenv("GENICONET_K2_MAX", "128")
        monkeypatch.setenv("GENICONET_KERNEL_GEFF", "all")
        assert not pk.merged_block_enabled("up2")
        assert not pk._merged_bwd_enabled("upd")
        assert not pk._k2_pack(16)
        # GEFF falls back to the hardware-validated built-in default
        assert pk._kernel_geff_enabled("pcs1_front", allow=True)
        assert not pk._kernel_geff_enabled("ds2", allow=True)
        # ...but the plain opt-OUT stays live without the umbrella (GEFF
        # is the only quarantined knob whose default is ON)
        monkeypatch.setenv("GENICONET_KERNEL_GEFF", "0")
        assert not pk._kernel_geff_enabled("pcs1_front", allow=True)

    def test_knobs_live_under_umbrella(self, monkeypatch):
        from geniconet_tpu.ops.pallas import phase_kernel as pk

        monkeypatch.setenv("GENICONET_EXPERIMENTAL", "1")
        monkeypatch.setenv("GENICONET_MERGED_BLOCK", "up2")
        monkeypatch.setenv("GENICONET_MERGED_BWD", "upd")
        assert pk.merged_block_enabled("up2")
        assert not pk.merged_block_enabled("up0")
        assert pk._merged_bwd_enabled("upd")

    def test_default_path_unchanged(self, monkeypatch):
        """With no env set at all, the shipped defaults are identical with
        and without the umbrella (quarantine must not change behavior)."""
        from geniconet_tpu.ops.pallas import phase_kernel as pk

        for names in (["GENICONET_EXPERIMENTAL"], []):
            for n in names:
                monkeypatch.setenv(n, "1")
            monkeypatch.delenv("GENICONET_MERGED_BLOCK", raising=False)
            monkeypatch.delenv("GENICONET_KERNEL_GEFF", raising=False)
            assert not pk.merged_block_enabled("up2")
            assert not pk._merged_bwd_enabled("upd")
            assert pk._kernel_geff_enabled("upd", allow=True)


# ---------------------------------------------------------------------------
# VAE split-step DP over the 1-D data mesh (VERDICT r4 #9)
# ---------------------------------------------------------------------------


@pytest.fixture
def _pallas_interpret(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("GENICONET_PALLAS_INTERPRET", "1")
    yield


class TestVaeSplitDP:
    """The shipping VAE bs36 split-step default under shard_map DP must
    compute EXACTLY the global-batch step. The single-device reference
    reproduces the DP chain's per-shard reparam-rng derivation (fold step,
    then shard index; eps drawn per shard slice), so the comparison is
    exact up to psum/fusion reduction-order noise."""

    N_DEV = 8
    BS = 24

    def _dp(self):
        from geniconet_tpu.data.datasets import synthetic_dataset
        from geniconet_tpu.data.pipeline import Batches
        from geniconet_tpu.parallel import mesh as mesh_lib
        from geniconet_tpu.train.config import Config
        from geniconet_tpu.train.trainer import Trainer

        cfg = Config()
        cfg.model.name = "ico2ico_vae"
        cfg.model.subdivisions = 3
        cfg.model.widths = (8, 12, 16)
        cfg.model.latent_features = 24
        cfg.model.use_pallas = True
        cfg.train.batch_size = self.BS
        cfg.train.log_grad_freq = 0
        cfg.train.log_freq = 10_000
        ds = synthetic_dataset(3, self.BS, seed=0)
        mesh = mesh_lib.make_mesh(self.N_DEV)
        tr = Trainer(cfg, mesh=mesh)
        st = tr.init_state(ds.inputs[:1], seed=3)
        b = Batches(ds, self.BS, shuffle=False,
                    sharding=mesh_lib.data_sharding(mesh))
        return cfg, ds, tr, st, b

    def test_split_engages_under_data_mesh(self, _pallas_interpret):
        _, _, tr, _, _ = self._dp()
        assert tr._split_step and tr._shard_map
        assert tr.model.pallas_blocks is None  # all blocks fused
        assert not tr._split_grid  # v3 stays single-chip

    def test_split_dp_matches_global_batch_reference(self, _pallas_interpret):
        from geniconet_tpu.losses.p2p import kl_factor_at_epoch, p2pkld_loss
        from geniconet_tpu.nn.models import reparameterize
        from geniconet_tpu.train.trainer import build_model

        cfg, ds, tr, st, b = self._dp()
        tables = tr.prepared_tables(b)
        idx, wt0 = next(iter(b.epoch_indices()))
        # axis-free twin of the DP model (the DP model's BN pmeans over
        # 'data', which is unbound outside shard_map); identical params
        ref_model = build_model(cfg, split_vae=True)

        x = jnp.asarray(ds.inputs)
        y = jnp.asarray(ds.targets)
        wt = jnp.ones((self.BS,), jnp.float32)
        shard = self.BS // self.N_DEV

        def mono(state):
            base = jax.random.fold_in(state.rng, state.step)
            kf = kl_factor_at_epoch(0, step_size=cfg.train.factor_step_size,
                                    gamma=cfg.train.factor_gamma)

            def loss_fn(params):
                (mu, logvar), upd1 = ref_model.apply(
                    {"params": params, "batch_stats": state.batch_stats}, x,
                    method="encode", train=True, mutable=["batch_stats"])
                # per-shard eps: shard i draws from fold_in(base, i) over
                # its (BS/n, ...) slice — the DP chain's derivation
                z = jnp.concatenate([
                    reparameterize(jax.random.fold_in(base, i),
                                   mu[i * shard:(i + 1) * shard],
                                   logvar[i * shard:(i + 1) * shard])
                    for i in range(self.N_DEV)
                ])
                recon, upd2 = ref_model.apply(
                    {"params": params, "batch_stats": state.batch_stats}, z,
                    method="decode", train=True, mutable=["batch_stats"])
                loss, _ = p2pkld_loss(
                    recon, mu, logvar, y, tr.s, tr.factors, kf, wt)
                return loss, (upd1["batch_stats"], upd2["batch_stats"])

            (loss, (b1, b2)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tr.tx.update(grads, state.opt_state,
                                            state.params)
            return (loss, optax.apply_updates(state.params, updates),
                    {**b1, **b2})

        loss_ref, params_ref, bstats_ref = jax.jit(mono)(st)

        tables, (st2, m, misc, _) = tr.gather_train_step(st, tables, idx,
                                                         wt0, 0)
        np.testing.assert_allclose(float(jax.device_get(m["total"])),
                                   float(jax.device_get(loss_ref)),
                                   rtol=1e-5)
        for a, bb in zip(jax.tree.leaves(jax.device_get(params_ref)),
                         jax.tree.leaves(jax.device_get(st2.params))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-4, atol=1e-6)
        for a, bb in zip(jax.tree.leaves(jax.device_get(bstats_ref)),
                         jax.tree.leaves(jax.device_get(st2.batch_stats))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-4, atol=1e-6)
        assert set(st2.batch_stats) == set(st.batch_stats)
        assert int(jax.device_get(st2.step)) == 1
        assert misc is not None
        assert misc[0].shape[0] == self.BS  # global (mu, logvar)

    def test_split_dp_train_epoch_runs(self, _pallas_interpret):
        from geniconet_tpu.data.datasets import synthetic_dataset
        from geniconet_tpu.data.pipeline import Batches
        from geniconet_tpu.parallel import mesh as mesh_lib

        cfg, ds, tr, st, _ = self._dp()
        ds2 = synthetic_dataset(3, 2 * self.BS, seed=4)
        mesh = tr.mesh
        b = Batches(ds2, self.BS, shuffle=True,
                    sharding=mesh_lib.data_sharding(mesh), seed=9)
        tr._host_step = 1
        assert not tr._can_scan_epoch(b, max(len(b), 2))  # split never scans
        st, info = tr.train_epoch(st, b, 0)
        loss = float(jax.device_get(info["last_device"]["total"]))
        assert np.isfinite(loss)
        assert tr.last_misc is not None
