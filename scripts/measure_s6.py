"""Subdivision-6/7 scaling evidence on the single real chip (round-5,
VERDICT r4 #7; reference axis BASELINE.json configs[4] — the reference
itself never trained past s=5, run.py:557-558).

Measures on hardware:
  * s=6 AE train step (grid 320x128, 4x the s=5 pixels): fused-kernel and
    XLA-conv routes, a few batch sizes — throughput + per-step time.
  * HBM headroom: jax compiled-program memory analysis per config
    (argument + temp + output bytes vs the chip's capacity).
  * s=7 (grid 640x256): compile-only HBM estimate on the XLA route —
    the documented fallback for the regime where fused kernels cannot
    W-shard (trainer flattened-DP note; artifacts/spatial_vs_dp.json is
    SIGN-ONLY CPU evidence, never a hardware magnitude).

Each config runs in a crash-isolated subprocess (the backend's
program-size crash class is config-dependent); results append to
artifacts/s6_scaling.json, cached by name.

Usage: nohup python scripts/measure_s6.py > /tmp/s6.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "s6_scaling.json")

# (name, env, code-params dict)
CONFIGS = [
    ("s6_pallas_bs12", {"s": 6, "bs": 12, "pallas": 1, "steps": 20}),
    ("s6_pallas_bs36", {"s": 6, "bs": 36, "pallas": 1, "steps": 20}),
    ("s6_xla_bs12", {"s": 6, "bs": 12, "pallas": 0, "steps": 20}),
    ("s6_xla_bs36", {"s": 6, "bs": 36, "pallas": 0, "steps": 20}),
    # s7: compile-only memory estimate on the XLA route (steps=0). The
    # fused kernels need the full W axis per device; s7 single-chip
    # execution is expected to be HBM-bound — the estimate quantifies it.
    ("s7_xla_bs4_compile", {"s": 7, "bs": 4, "pallas": 0, "steps": 0}),
    ("s7_xla_bs12_compile", {"s": 7, "bs": 12, "pallas": 0, "steps": 0}),
    # s7 execution attempt, tiny batch (runs LAST — a backend crash here
    # must not starve the configs above of TPU time)
    ("s7_xla_bs2_exec", {"s": 7, "bs": 2, "pallas": 0, "steps": 5}),
    ("s7_pallas_bs2_exec", {"s": 7, "bs": 2, "pallas": 1, "steps": 5}),
]

_BODY = r"""
import json, os, sys, time
sys.path.insert(0, __REPO__)
import jax
import numpy as np
from geniconet_tpu import enable_compilation_cache
enable_compilation_cache()
from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer

P = __PARAMS__
s, bs, steps = P["s"], P["bs"], P["steps"]
cfg = Config()
cfg.model.name = "ico2ico"
cfg.model.subdivisions = s
cfg.train.batch_size = bs
cfg.model.compute_dtype = "bfloat16"
cfg.model.use_pallas = bool(P["pallas"])
cfg.train.log_grad_freq = 0
tr = Trainer(cfg)
ds = synthetic_dataset(s, bs, seed=0)
state = tr.init_state(ds.inputs[:1])
x = np.asarray(ds.inputs)
y = np.asarray(ds.targets)
wt = np.ones(bs, np.float32)

# compile + memory analysis of the monolithic train step
lowered = jax.jit(
    lambda st, x, y, wt: tr._train_step(st, x, y, wt, 0)
).lower(state, x, y, wt)
compiled = lowered.compile()
mem = {}
try:
    ma = compiled.memory_analysis()
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            mem[k] = int(v)
except Exception as e:  # noqa: BLE001
    mem["error"] = str(e)[:200]
print("MEM " + json.dumps(mem), flush=True)

if steps:
    # execute through the shipping hot path (gather step)
    from geniconet_tpu.data.pipeline import Batches
    batches = Batches(ds, bs, shuffle=False)
    tables = tr.prepared_tables(batches)
    idx, wt0 = next(iter(batches.epoch_indices()))
    t0 = time.perf_counter()
    tables, (state, m, _, _) = tr.gather_train_step(state, tables, idx, wt0, 0)
    print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    float(jax.device_get(m["total"]))
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            tables, (state, m, _, _) = tr.gather_train_step(
                state, tables, idx, wt0, 0)
        loss = float(jax.device_get(m["total"]))
        dt = time.perf_counter() - t0
        mps = bs * steps / dt
        best = max(best, mps)
        print(f"rep {rep}: {mps:.1f} meshes/s ({dt/steps*1000:.2f} ms/step, "
              f"loss {loss:.5f})", flush=True)
    print(f"THROUGHPUT {best:.2f}", flush=True)
print("BODY_OK", flush=True)
"""

_HEALTH = ("import jax, jax.numpy as jnp; "
           "print('HEALTH_OK', float(jnp.sum(jnp.arange(8.0))))")


def wait_healthy(max_wait=3600):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            p = subprocess.run([sys.executable, "-c", _HEALTH],
                               capture_output=True, text=True, timeout=600)
            if "HEALTH_OK" in p.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"[s6] backend not healthy; waiting 60s", flush=True)
        time.sleep(60)
    return False


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for name, params in CONFIGS:
        if name in results:
            print(f"[s6] {name}: cached", flush=True)
            continue
        if not wait_healthy():
            print("[s6] backend never recovered; aborting", flush=True)
            return 1
        print(f"[s6] running {name} ({params})", flush=True)
        code = (_BODY.replace("__REPO__", repr(REPO))
                .replace("__PARAMS__", repr(params)))
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=3000)
            ok = "BODY_OK" in p.stdout
            tail = (p.stdout + p.stderr)[-700:]
        except subprocess.TimeoutExpired:
            ok, tail = False, "timeout 3000s"
        rec = {"status": "ok" if ok else "crash", "params": params,
               "seconds": round(time.time() - t0, 1)}
        if ok:
            for line in p.stdout.splitlines():
                if line.startswith("MEM "):
                    rec["memory"] = json.loads(line[4:])
                elif line.startswith("THROUGHPUT "):
                    rec["meshes_per_s"] = float(line.split()[1])
        else:
            rec["tail"] = tail[-400:]
        results[name] = rec
        print(f"[s6] {name}: {rec}\n--- tail ---\n{tail}\n---", flush=True)
        json.dump(results, open(OUT, "w"), indent=1)
    print("[s6] done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
