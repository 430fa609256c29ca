"""VAE bs36 fused-path throughput sweep (round-3 VERDICT #2).

The bisection (artifacts/vae36_bisect.json) proved every 4-of-5 conv-block
subset runs a bs36 VAE train step — but only the cheapest-blocks-on-XLA
subset (conv_in+heads on XLA, 869 meshes/s) was measured and shipped.
This sweep measures the throughput of EVERY stable subset, plus the two
5-block subsets the bisection never tried (heads fused / all convs fused),
and records the winner for the trainer default.

Crash-recovering subprocess harness (same pattern as sweep_folds.py).
Results: artifacts/vae36_sweep.json.

Usage:  nohup python scripts/sweep_vae36.py > /tmp/sweep_vae36.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "vae36_sweep.json")

CONFIGS = [
    # shipping round-3 workaround (control)
    ("ship_noconvin_noheads", "down0,down1,up0,up1"),
    # the other 4-of-5 conv subsets (all proven stable for 3 steps)
    ("no_down0", "conv_in,down1,up0,up1"),
    ("no_down1", "conv_in,down0,up0,up1"),
    ("no_up0", "conv_in,down0,down1,up1"),
    ("no_up1", "conv_in,down0,down1,up0"),
    # untried 5-block subsets: heads fused / all conv blocks fused
    ("heads_fused", "down0,down1,up0,up1,heads"),
    ("all_convs", "conv_in,down0,down1,up0,up1"),
    # round-4 split-step v2 (trunk partition, GENICONET_VAE_SPLIT=1):
    # every block fused, three dispatched programs (artifacts/
    # split_bisect.json: v2_full ok) — blocks=None routes via the env
    ("split_v2", None),
    # grid-stencil-loss hypothesis: the v2_full bisect passed BEFORE the
    # grid-route loss landed; GENICONET_GRID_LOSS=0 restores that program
    ("split_v2_tableloss", None),
    # round-4b (post gather-transpose loss backwards, commit 2c4cae2):
    # the table-route loss no longer emits scatter-adds, so both the
    # split and one-program loss programs changed shape — re-probe.
    ("gt_split_v2", None),                 # control: shipping default
    ("gt_one_prog", "oneprog"),            # 1 program, grid-stencil loss
    ("gt_one_prog_tableloss", "oneprog"),  # 1 program, table-route loss
    # round-4g split v3 (GENICONET_VAE_SPLIT_GRID): decoder half as TWO
    # programs — fwd + grid-stencil loss w.r.t. outputs, then backward via
    # a surrogate dot-loss — so the grid forms never share a program with
    # the decoder backward (the combination that crashed as split_v2).
    # Replaces the table-route loss: 13.0 ms/step of gather fusions in the
    # round-4 VAE trace, at the cost of one extra heads+decoder forward.
    ("split_v3_grid", "v3"),
    # DROPPED round-4h: split_v3_grid_col / gt_one_prog_col. The AE
    # hardware sweep (artifacts/env_sweep.json col_front*) measured the
    # pre-gathered conv_in im2col table at 640 meshes/s vs 2196 control —
    # the (N,5,h,w,84) table's per-step HBM gather traffic dominates
    # everything it saves, so any VAE config with COL_FRONT=1 inherits a
    # ~40 ms/step handicap. Family closed; the env gate stays for repro.
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
cfg.model.name = "ico2ico_vae"
cfg.model.subdivisions = 5
cfg.train.batch_size = 36
cfg.model.compute_dtype = "bfloat16"
cfg.model.use_pallas = True
cfg.train.log_grad_freq = 0
tr = Trainer(cfg)
ds = synthetic_dataset(5, 180, seed=0)
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
    for name, blocks in CONFIGS:
        if name in results:
            print(f"[sweep] {name}: cached {results[name]}", flush=True)
            continue
        if not wait_healthy():
            print("[sweep] backend never recovered; aborting", flush=True)
            return 1
        env = dict(os.environ)
        env["GENICONET_EXPERIMENTAL"] = "1"  # probes reach quarantined knobs
        if blocks is None:  # split-step v2: all blocks fused, 3 programs
            env.pop("GENICONET_PALLAS_BLOCKS", None)
            env["GENICONET_VAE_SPLIT"] = "1"
            if name.endswith("tableloss"):
                env["GENICONET_GRID_LOSS"] = "0"
        elif blocks == "oneprog":  # everything fused, ONE program
            env.pop("GENICONET_PALLAS_BLOCKS", None)
            env["GENICONET_VAE_SPLIT"] = "0"
            if name.endswith("tableloss"):
                env["GENICONET_GRID_LOSS"] = "0"
        elif blocks in ("v3", "v3col"):  # split v3: grid loss, 4 programs
            env.pop("GENICONET_PALLAS_BLOCKS", None)
            env["GENICONET_VAE_SPLIT"] = "1"
            env["GENICONET_VAE_SPLIT_GRID"] = "1"
            if blocks == "v3col":
                env["GENICONET_COL_FRONT"] = "1"
        elif blocks == "oneprogcol":  # 1 program, grid loss, col table
            env.pop("GENICONET_PALLAS_BLOCKS", None)
            env["GENICONET_VAE_SPLIT"] = "0"
            env["GENICONET_COL_FRONT"] = "1"
        else:
            env["GENICONET_PALLAS_BLOCKS"] = blocks
        print(f"[sweep] running {name} (blocks={blocks})", flush=True)
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
            results[name] = {"status": "ok", "blocks": blocks,
                             "meshes_per_s": mps,
                             "ms_per_step": 36 * 1000 / mps}
        else:
            results[name] = {"status": "crash", "blocks": blocks}
        print(f"[sweep] {name}: {results[name]} ({time.time()-t0:.0f}s)\n"
              f"--- tail ---\n{tail}\n------------", flush=True)
        json.dump(results, open(OUT, "w"), indent=1)
    print(f"[sweep] done: {json.dumps(results, indent=1)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
