"""Generic crash-recovering hardware sweep: AE bs36 whole-model throughput
under different kernel env knobs (merged backwards per family, fold-site
combos). One subprocess per config; INTERNAL backend crashes only kill the
subprocess and the orchestrator waits for recovery.

Results: artifacts/env_sweep.json (appended; cached by name).
Usage:  nohup python scripts/sweep_env.py > /tmp/sweep_env.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "env_sweep.json")

# (name, {env}) — safest first; known-crash controls last
CONFIGS = [
    # re-measure the up2 fold site together with the cheaper head backward
    ("fold_up2_headfix", {"GENICONET_KERNEL_GEFF": "pcs1_front,upd,pcs1_up2"}),
    ("default_headfix", {}),
    # merged single-kernel backwards, one family at a time (round-2 saw the
    # ALL-family program crash; per-family was never hardware-swept)
    ("merged_upd", {"GENICONET_MERGED_BWD": "upd"}),
    ("merged_ds2", {"GENICONET_MERGED_BWD": "ds2"}),
    ("merged_std", {"GENICONET_MERGED_BWD": "std"}),
    ("merged_pcs1", {"GENICONET_MERGED_BWD": "pcs1"}),
    ("merged_upd_ds2", {"GENICONET_MERGED_BWD": "upd,ds2"}),
    # pairwise K-packing of narrow-channel contractions (round-4): doubles
    # the MXU contraction depth at C<=64 where full im2col fails to compile
    # cin<=64 only: K=128 is exactly the MXU's full contraction depth, and
    # wider cin gains nothing (K already >=128). k2_128/k2_256 measured
    # once round-4 (crash pre-barrier); re-add here if k2_64 wins.
    ("k2_64", {"GENICONET_K2_MAX": "128"}),
    # round-4b: the scratch-bounce variants (_lane_packN) — the pad+add
    # K2 form and the plain-concat C=64 im2col both died in Mosaic layout
    # machinery; these bounce the packed operand through scoped VMEM
    ("k2_64_scratch", {"GENICONET_K2_MAX": "128"}),
    ("im2col448_scratch", {"GENICONET_IM2COL_MAX": "512",
                           "GENICONET_IM2COL_SCRATCH": "1"}),
    # round-4c: two-pass whole-UpBlock kernels (fused_up_block) — one
    # pallas_call per block instead of two, bn00 affine in-kernel.
    # The *_pad variants re-run after the c0p lane-tile fix (the unpadded
    # ANY-space y00 buffer at up2's c0=64 was an illegal sliced HBM DMA —
    # Mosaic 'slice shape along dim 4 must be aligned to tiling (128)')
    ("merged_up2", {"GENICONET_MERGED_BLOCK": "up2"}),
    ("merged_up12", {"GENICONET_MERGED_BLOCK": "up1,up2"}),
    ("merged_up_all", {"GENICONET_MERGED_BLOCK": "all"}),
    ("merged_up_all_pad", {"GENICONET_MERGED_BLOCK": "up0,up1,up2"}),
    ("merged_up2_pad", {"GENICONET_MERGED_BLOCK": "up2"}),
    ("merged_up01_pad", {"GENICONET_MERGED_BLOCK": "up0,up1"}),
    # round-4d: two-pass whole-DownBlock kernels (fused_down_block) —
    # the encoder mirror (dual s2 + in-kernel bn00 affine + spatial conv01)
    ("merged_dn01", {"GENICONET_MERGED_BLOCK": "down0,down1"}),
    ("merged_blocks_all",
     {"GENICONET_MERGED_BLOCK": "down0,down1,up0,up1,up2"}),
    # round-4e: pre-gathered conv_in im2col table (ops/phase.conv_im2col) —
    # the DATA input's halo gather runs once at table-prep time; the hot
    # step's conv_in is four (rows,21)x(21,64) XLA matmuls. Same gathered
    # HBM bytes as xpack (both minor dims pad to the 128-lane tile), bf16
    # table halves them.
    ("col_front", {"GENICONET_COL_FRONT": "1"}),
    ("col_front_ctrl", {}),
    # col_front shrinks the one-program step (conv_in leaves Pallas):
    # re-probe the fold families that crashed or regressed at the larger
    # program size (fold_sweep.json: pcs1_up0/up1 crash, ds2 noise,
    # std -47; per-site pcs1 families are 'pcs1_<block>')
    ("col_geff_all", {"GENICONET_COL_FRONT": "1",
                      "GENICONET_KERNEL_GEFF": "all"}),
    ("col_geff_ups", {"GENICONET_COL_FRONT": "1",
                      "GENICONET_KERNEL_GEFF":
                          "upd,pcs1_up0,pcs1_up1,pcs1_up2"}),
    ("col_geff_up2_ds2", {"GENICONET_COL_FRONT": "1",
                          "GENICONET_KERNEL_GEFF": "upd,pcs1_up2,ds2"}),
    # round-4f: head-kernel samples-per-program. _head_k's VMEM formula
    # chooses k=1 at bs36 (36 programs/step for the MSE head fwd AND bwd,
    # decoder.2/.3 = 0.92 ms/step in the round-4 trace) but its own
    # docstring records a MEASURED 18.75 MB/sample — ~8x below the
    # formula's estimate — so k=2..4 should fit scoped VMEM and halve or
    # quarter the per-program overhead. GENICONET_PHMSE_K was added for
    # crash bisection and overrides both directions.
    ("phmse_k2", {"GENICONET_PHMSE_K": "2"}),
    ("phmse_k3", {"GENICONET_PHMSE_K": "3"}),
    ("phmse_k4", {"GENICONET_PHMSE_K": "4"}),
    ("col_phmse_k2", {"GENICONET_COL_FRONT": "1",
                      "GENICONET_PHMSE_K": "2"}),
    # round-4i: the trace attribution (ROADMAP) shows the two EDGE kernels
    # starve the MXU: conv_in fwd+dtaps = 1.17 ms for ~2 GFLOP (K=21
    # contraction, 3-lane VPU tiles) and the fused head+MSE = 0.92 ms for
    # ~0.5 GFLOP (N=3 matmuls). Route each to XLA (never measured for the
    # AE; GENICONET_PALLAS_BLOCKS lists the blocks that KEEP kernels).
    ("ae_noconvin", {"GENICONET_PALLAS_BLOCKS":
                     "down0,down1,down2,up0,up1,up2,head"}),
    ("ae_nohead", {"GENICONET_PALLAS_BLOCKS":
                   "conv_in,down0,down1,down2,up0,up1,up2"}),
    ("ae_noedges", {"GENICONET_PALLAS_BLOCKS":
                    "down0,down1,down2,up0,up1,up2"}),
    # re-probe the standalone Pallas fold kernel (round-3: -22 at the
    # 2079-era program; the program has since changed shape twice)
    ("fold_pallas", {"GENICONET_PALLAS_FOLD": "1"}),
    # round-4j: phase chain — block-boundary joins/splits/merges absorbed
    # into the kernels (fused_up_dual_conv_pair / fused_dual_s2_conv_split).
    # First combined probe (with the ds2 fold): 1714 vs 2203 control — the
    # regression is ~4.7 ms/step, far larger than the ~1.0 ms of boundary
    # glue it removes. Attribute per half:
    ("chain_dec", {"GENICONET_PHASE_CHAIN": "dec"}),
    ("chain_enc", {"GENICONET_PHASE_CHAIN": "enc"}),
    ("chain", {"GENICONET_PHASE_CHAIN": "1"}),
    # round-4k: stack the individually-noise-positive fold sites (each
    # measured +0..+19 alone; pcs1_up0/up1 and family-wide crash)
    ("fold_stack", {"GENICONET_KERNEL_GEFF": "pcs1_front,upd,pcs1_up2,ds2"}),
    # round-4k/5: XLA scheduling knobs — the remaining glue fusions run at
    # ~46% of HBM bandwidth (fusion.29 in the round-4 trace); a larger
    # scoped-vmem budget sometimes changes kLoop fusion tiling, and the
    # latency-hiding scheduler can overlap fusion DMA with custom calls.
    # Round-5: XLA_FLAGS was the WRONG channel on this backend (host absl
    # FATALs on TPU-only flags and accepted flags never reach the remote
    # compiler) — these ride per-jit compiler_options instead
    # (trainer._jit / GENICONET_COMPILER_OPTIONS).
    ("co_vmem64", {"GENICONET_COMPILER_OPTIONS":
                   "xla_tpu_scoped_vmem_limit_kib=65536"}),
    ("co_lhs_rerun", {"GENICONET_COMPILER_OPTIONS":
                      "xla_latency_hiding_scheduler_rerun=2"}),
    # round-4l: fold_up2_headfix (2164) measured BELOW default (2196) —
    # the up2 fold flipped negative after the head-backward fix, so probe
    # the ds2-only increment and the explicit default-GEFF control side
    # by side before touching defaults
    ("fold_ds2_only", {"GENICONET_KERNEL_GEFF": "pcs1_front,upd,ds2"}),
    # latency-hiding scheduler main switch (co_lhs_rerun above only reruns it)
    ("co_lhs_on", {"GENICONET_COMPILER_OPTIONS":
                   "xla_tpu_enable_latency_hiding_scheduler=true"}),
    # k-budget re-probe at the round-4 program shape (grid-stencil loss +
    # headfix changed inter-kernel pipelining since the round-3 -28 result)
    ("kb18", {"GENICONET_K_BUDGET_MB": "18"}),
    # round-5: scan-body unrolling — the single-dispatch epoch scan is the
    # headline program (bench value_scan); unroll=k lets XLA overlap one
    # step's boundary glue (stats-fold fusions, layout copies, ~4 ms of
    # non-kernel device time) with the next step's kernels across the
    # iteration edge, at k× body program size. Measured in SCAN mode
    # (GENICONET_SWEEP_SCAN routes the sweep through the scan program).
    ("scan_ctrl", {"GENICONET_SWEEP_SCAN": "1"}),
    ("scan_unroll2", {"GENICONET_SWEEP_SCAN": "1",
                      "GENICONET_SCAN_UNROLL": "2"}),
    ("scan_unroll3", {"GENICONET_SWEEP_SCAN": "1",
                      "GENICONET_SCAN_UNROLL": "3"}),
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
ds = synthetic_dataset(5, 180, seed=0)
state = tr.init_state(ds.inputs[:1])
batches = Batches(ds, 36, shuffle=False)
tables = tr.prepared_tables(batches)
idx, wt = next(iter(batches.epoch_indices()))
tables, (state, m, _, _) = tr.gather_train_step(state, tables, idx, wt, 0)
float(jax.device_get(m["total"]))
best = 0.0
if os.environ.get("GENICONET_SWEEP_SCAN", "0") == "1":
    # scan mode: measure the single-dispatch epoch-scan program (the
    # bench headline value_scan) — a constant batch plan re-feeding one
    # batch, like bench.py phase (a2)
    import jax.numpy as jnp
    import numpy as np
    nb = len(batches)
    order = np.broadcast_to(np.asarray(idx), (nb,) + np.asarray(idx).shape)
    wts = np.broadcast_to(np.asarray(wt), (nb,) + np.asarray(wt).shape)
    rtabs = getattr(tr, "_gather_auto_tables", None) or tables
    state, lm, _ = tr._jit_train_epoch_scan(
        state, rtabs, jnp.asarray(order), jnp.asarray(wts), 0)
    float(jax.device_get(lm["total"]))
    for rep in range(4):
        t0 = time.perf_counter()
        for _ in range(3):
            state, lm, _ = tr._jit_train_epoch_scan(
                state, rtabs, jnp.asarray(order), jnp.asarray(wts), 0)
        loss = float(jax.device_get(lm["total"]))
        dt = time.perf_counter() - t0
        mps = 36 * nb * 3 / dt
        best = max(best, mps)
        print(f"rep {{rep}}: {{mps:.1f}} meshes/s (scan, loss {{loss:.5f}})", flush=True)
else:
    for rep in range(4):
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


def wait_healthy(max_wait=2700):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            p = subprocess.run([sys.executable, "-c", _HEALTH],
                               capture_output=True, text=True, timeout=600)
            if "HEALTH_OK" in p.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"[sweep] backend not healthy ({time.time()-t0:.0f}s); "
              f"waiting 60s", flush=True)
        time.sleep(60)
    return False


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for name, envs in CONFIGS:
        if name in results:
            print(f"[sweep] {name}: cached {results[name]}", flush=True)
            continue
        if not wait_healthy():
            print("[sweep] backend never recovered; aborting", flush=True)
            return 1
        env = dict(os.environ)
        # closed-family knobs are quarantined behind the umbrella
        # (phase_kernel._exp_env) — probes must still reach them
        env["GENICONET_EXPERIMENTAL"] = "1"
        env.update(envs)
        print(f"[sweep] running {name} ({envs})", flush=True)
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
            results[name] = {"status": "ok", "env": envs,
                             "meshes_per_s": mps,
                             "ms_per_step": 36 * 1000 / mps}
        else:
            results[name] = {"status": "crash", "env": envs}
        print(f"[sweep] {name}: {results[name]} ({time.time()-t0:.0f}s)\n"
              f"--- tail ---\n{tail}\n------------", flush=True)
        json.dump(results, open(OUT, "w"), indent=1)
    print(f"[sweep] done: {json.dumps(results, indent=1)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
