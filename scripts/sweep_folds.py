"""Hardware sweep of the per-site BatchNorm stats-cotangent fold families
(GENICONET_KERNEL_GEFF) on the AE bs36 bench config (VERDICT round-3 #1:
"the per-site pcs1 fold families just committed are unmeasured — sweep them
on hardware first").

Each configuration runs in a SUBPROCESS (the family-wide 'pcs1' fold
deterministically INTERNAL-crashes the tunneled v5e at bs36, so any new
fold combination carries crash risk). A crash kills only the subprocess;
the orchestrator polls a trivial device op until the backend recovers
before moving on. Results land in artifacts/fold_sweep.json as
{config: {"status": "ok"|"crash", "meshes_per_s": float, "ms_per_step": float}}.

Usage (detached):  nohup python scripts/sweep_folds.py > /tmp/sweep_folds.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "fold_sweep.json")

# Ordered safest-first: the control, then one new up-site at a time
# (widest tensor first — largest potential win), then the full set.
CONFIGS = [
    ("default", "pcs1_front,upd"),
    ("plus_up2", "pcs1_front,upd,pcs1_up2"),
    ("plus_up1", "pcs1_front,upd,pcs1_up1"),
    ("plus_up0", "pcs1_front,upd,pcs1_up0"),
    ("plus_all_ups", "pcs1_front,upd,pcs1_up0,pcs1_up1,pcs1_up2"),
]

_BENCH = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax
from geniconet_tpu import enable_compilation_cache
enable_compilation_cache()
from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer

cfg = Config()
cfg.model.name = "ico2ico"
cfg.model.subdivisions = 5
cfg.train.batch_size = 36
cfg.model.compute_dtype = "bfloat16"
cfg.model.use_pallas = True
cfg.train.log_grad_freq = 0
tr = Trainer(cfg)
ds = synthetic_dataset(5, 36, seed=0)
state = tr.init_state(ds.inputs[:1])
batches = Batches(ds, 36, shuffle=False)
tables = tr.prepared_tables(batches)
idx, wt = next(iter(batches.epoch_indices()))
tables, (state, m, _, _) = tr.gather_train_step(state, tables, idx, wt, 0)
float(jax.device_get(m["total"]))
best = 0.0
for rep in range(3):
    t0 = time.perf_counter()
    for _ in range(30):
        tables, (state, m, _, _) = tr.gather_train_step(state, tables, idx, wt, 0)
    loss = float(jax.device_get(m["total"]))
    dt = time.perf_counter() - t0
    mps = 36 * 30 / dt
    best = max(best, mps)
    print(f"rep {{rep}}: {{mps:.1f}} meshes/s ({{dt/30*1000:.2f}} ms/step, loss {{loss:.5f}})", flush=True)
print(f"BENCH_OK {{best:.2f}}", flush=True)
"""

_HEALTH = ("import jax, jax.numpy as jnp; "
           "print('HEALTH_OK', float(jnp.sum(jnp.arange(8.0))))")


def wait_healthy(max_wait=2400):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            p = subprocess.run([sys.executable, "-c", _HEALTH],
                               capture_output=True, text=True, timeout=600)
            if "HEALTH_OK" in p.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"[sweep] backend not healthy yet "
              f"({time.time() - t0:.0f}s); waiting 60s", flush=True)
        time.sleep(60)
    return False


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for name, geff in CONFIGS:
        if name in results:
            print(f"[sweep] {name}: cached {results[name]}", flush=True)
            continue
        if not wait_healthy():
            print("[sweep] backend never recovered; aborting", flush=True)
            return 1
        env = dict(os.environ)
        env["GENICONET_EXPERIMENTAL"] = "1"  # probes reach quarantined knobs
        env["GENICONET_KERNEL_GEFF"] = geff
        print(f"[sweep] running {name} (GEFF={geff})", flush=True)
        t0 = time.time()
        code = _BENCH.format(repo=REPO)
        try:
            p = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True, timeout=3600)
            ok = "BENCH_OK" in p.stdout
            tail = (p.stdout + p.stderr)[-600:]
        except subprocess.TimeoutExpired:
            ok, tail = False, "timeout 3600s"
        if ok:
            mps = float(p.stdout.rsplit("BENCH_OK", 1)[1].strip())
            results[name] = {"status": "ok", "geff": geff,
                             "meshes_per_s": mps,
                             "ms_per_step": 36 * 1000 / mps}
        else:
            results[name] = {"status": "crash", "geff": geff}
        print(f"[sweep] {name}: {results[name]} ({time.time()-t0:.0f}s)\n"
              f"--- tail ---\n{tail}\n------------", flush=True)
        json.dump(results, open(OUT, "w"), indent=1)
    print(f"[sweep] done: {json.dumps(results, indent=1)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
