"""Trace N train steps on the live backend and attribute device time per op.

Usage: python scripts/profile_step.py [--steps 10] [--out /tmp/gn_trace]

Prints a per-op-category table (ms/step) and the top individual ops —
the round-2 successor of the round-1 trace that produced ROADMAP.md's
attribution table.
"""

import argparse
import collections
import glob
import gzip
import sys
import time

import jax


def build():
    sys.path.insert(0, ".")
    from bench import build as bench_build

    return bench_build()


def run_trace(out_dir, steps):
    trainer, state, batches = build()
    global _USE_PALLAS
    _USE_PALLAS = bool(trainer.model.use_pallas)
    tables = trainer.prepared_tables(batches)
    idx, wt = next(iter(batches.epoch_indices()))
    # warmup/compile — the same fused-gather hot step bench.py times
    tables, (state, metrics, _, _) = trainer.gather_train_step(
        state, tables, idx, wt, 0)
    float(jax.device_get(metrics["total"]))
    t0 = time.perf_counter()
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        tables, (state, metrics, _, _) = trainer.gather_train_step(
            state, tables, idx, wt, 0)
    float(jax.device_get(metrics["total"]))
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"{steps} traced steps in {dt:.3f}s ({1e3*dt/steps:.2f} ms/step)",
          file=sys.stderr)
    return dt


import re as _re

_USE_PALLAS = True  # set by run_trace from the built model


def categorize(name: str, use_pallas: bool = True) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas kernels"
    # device ops named by their module scope (up0.3, down1.5, conv_in.2,
    # conv01.9, ...) are the Pallas custom calls in this codebase — but only
    # when the Pallas route is actually on; on the XLA fallback the same
    # scopes name plain fusions (advisor round-2 finding)
    if use_pallas and (
        _re.match(r"(up|down)\d+\.\d+$", n) or _re.match(r"conv(_in|\d+)\.\d+$", n)
    ):
        return "pallas kernels"
    if "convert_reduce" in n:
        return "BN stats (convert_reduce)"
    if n.startswith("copy") or ".copy" in n or "copy-start" in n or "copy-done" in n:
        return "layout copies"
    if "convert" in n and "reduce" in n:
        return "BN stats (convert_reduce)"
    if n.startswith("reduce") or ".reduce" in n:
        return "reductions"
    if "convolution" in n or n.startswith("conv"):
        return "XLA convs"
    if "dot" in n:
        return "XLA dots"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collectives"
    if "dynamic-update" in n or "dynamic-slice" in n:
        return "dynamic slices"
    if "fusion" in n or "add" in n or "multiply" in n or "select" in n or "tanh" in n:
        return "elementwise fusions"
    if "transpose" in n or "reshape" in n or "bitcast" in n or "concatenate" in n:
        return "transpose/reshape"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "host transfer"
    return "other"


def summarize(out_dir, steps):
    import json

    paths = sorted(glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace.json.gz found", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU / device
    proc = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in proc.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    thread = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")

    per_op = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        tname = thread.get((ev["pid"], ev.get("tid")), "")
        if tname != "XLA Ops":  # skip step/module envelope lanes
            continue
        per_op[ev["name"]] += int(ev.get("dur", 0) * 1e6)  # us -> ps

    if not per_op:
        print("no device op events found; processes were:", file=sys.stderr)
        for p, n in proc.items():
            print(f"  pid {p}: {n}", file=sys.stderr)
        return

    cats = collections.Counter()
    for name, ps in per_op.items():
        cats[categorize(name, _USE_PALLAS)] += ps
    total = sum(cats.values())
    print(f"\ndevice time: {total/1e9/steps:.3f} ms/step over {steps} steps")
    print(f"{'category':<28} {'ms/step':>9}  {'%':>5}")
    for cat, ps in cats.most_common():
        print(f"{cat:<28} {ps/1e9/steps:9.3f}  {100*ps/total:5.1f}")
    print("\ntop 25 ops (ms/step):")
    for name, ps in per_op.most_common(25):
        print(f"  {ps/1e9/steps:8.3f}  {name[:110]}")


def main():
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/gn_trace")
    a = ap.parse_args()
    run_trace(a.out, a.steps)
    summarize(a.out, a.steps)


if __name__ == "__main__":
    main()
