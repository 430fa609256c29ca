"""Sustained-throughput run of the shipping VAE bs36 fast path.

Drives EXACTLY the program the vae36 sweep validated (split-step v2,
all blocks fused, table-route loss, bs36, device-resident gather steps
via `Trainer.gather_train_step`) for --minutes, shuffling the batch
index each step, with heartbeats every ~15 s. This is the sustained
evidence for the split-step default; unlike scripts/soak.py it does NOT
interleave the per-epoch validation/checkpoint programs — soak.py at
bs36/bs40 adds programs that re-cross the tunneled backend's
program-size crash threshold (round-4 log: FAILED_PRECONDITION/INTERNAL
at first step), which is exactly the fragility the split-step default
avoids by keeping every dispatched program under it.

Usage:  GENICONET_VAE_SPLIT=1 python scripts/sustain_vae36.py --minutes 30
Writes artifacts/sustain_vae36.json + heartbeat lines on stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=30.0)
    p.add_argument("--batch_size", type=int, default=36)
    a = p.parse_args()

    import jax
    import numpy as np

    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()

    from geniconet_tpu.data.datasets import synthetic_dataset
    from geniconet_tpu.data.pipeline import Batches
    from geniconet_tpu.train.config import Config
    from geniconet_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.name = "ico2ico_vae"
    cfg.model.subdivisions = 5
    cfg.train.batch_size = a.batch_size
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.use_pallas = True
    cfg.train.log_grad_freq = 0
    tr = Trainer(cfg)
    ds = synthetic_dataset(5, 180, seed=0)
    state = tr.init_state(ds.inputs[:1], seed=0)
    batches = Batches(ds, a.batch_size, shuffle=False)
    tables = tr.prepared_tables(batches)
    idx0, wt = next(iter(batches.epoch_indices()))
    rng = np.random.RandomState(0)
    n = len(ds)

    print(f"devices: {jax.devices()}  split={tr._split_step}", flush=True)
    tables, (state, m, _, _) = tr.gather_train_step(state, tables, idx0, wt, 0)
    loss0 = float(jax.device_get(m["total"]))
    print(f"compiled; first loss {loss0:.5f}", flush=True)

    t_end = time.time() + a.minutes * 60
    t0 = time.time()
    steps = 0
    window = 400  # ~13 s per window at 33 ms/step
    hb = []
    while time.time() < t_end:
        tw = time.perf_counter()
        for _ in range(window):
            idx = jax.numpy.asarray(
                rng.randint(0, n, size=a.batch_size), jax.numpy.int32)
            tables, (state, m, _, _) = tr.gather_train_step(
                state, tables, idx, wt, 0)
        loss = float(jax.device_get(m["total"]))  # hard sync
        dt = time.perf_counter() - tw
        steps += window
        mps = a.batch_size * window / dt
        hb.append({"t": time.time(), "steps": steps,
                   "meshes_per_s": round(mps, 1), "loss": round(loss, 5)})
        print(f"[sustain] {hb[-1]}", flush=True)
        # rewrite the artifact after EVERY window so an interrupted run
        # still leaves evidence of everything sustained so far
        _write(a, time.time() - t0, steps, hb, done=False)
    _write(a, time.time() - t0, steps, hb, done=True)


def _write(a, wall, steps, hb, done):
    import json
    import os

    meshes = steps * a.batch_size
    out = {
        "minutes": round(wall / 60, 2),
        "steps": steps,
        "meshes": meshes,
        "meshes_per_s_sustained": round(meshes / max(wall, 1e-9), 1),
        "final_loss": hb[-1]["loss"] if hb else None,
        "crashes": 0,
        "complete": done,
        "config": "ico2ico_vae s5 bs36 bf16 split-step v2 (all blocks "
                  "fused, grid-stencil loss + scatter-free loss backwards "
                  "— the gt_split_v2 default), device-resident gather steps",
        "heartbeats": hb,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "sustain_vae36_gt.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    if done:
        print(f"[sustain] DONE {out['meshes']} meshes in {out['minutes']} "
              f"min ({out['meshes_per_s_sustained']} meshes/s sustained)",
              flush=True)


if __name__ == "__main__":
    main()
