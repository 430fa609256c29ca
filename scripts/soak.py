"""Multi-hour Pallas soak (VERDICT round-2 #9): loop real train epochs on
the disk dataset for --hours, auto-resuming from the newest EB checkpoint
after transient backend errors (INTERNAL / FAILED_PRECONDITION — the
failure mode that killed round-2's 120-epoch bs12 run mid-training).

Exercises the full hot path: fused kernels at bs36, device-resident gather
tables with XLA-chosen layouts, single-dispatch scan epochs, per-epoch
validation, best-checkpoint GC.

Usage (detached):
    nohup python scripts/soak.py --data /tmp/gico_npz --hours 2 \
        > /tmp/soak.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/gico_npz")
    p.add_argument("--hours", type=float, default=2.0)
    p.add_argument("--log_dir", default="/tmp/gico_soak")
    p.add_argument("--batch_size", type=int, default=36)
    p.add_argument("--model", default="ico2ico",
                   choices=["ico2ico", "ico2ico_vae"])
    a = p.parse_args()

    import jax

    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()

    from geniconet_tpu.data.datasets import IcoDataset
    from geniconet_tpu.data.pipeline import Batches
    from geniconet_tpu.train import checkpoint as ckpt
    from geniconet_tpu.train.config import Config
    from geniconet_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.name = a.model
    cfg.model.subdivisions = 5
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.use_pallas = True
    cfg.train.batch_size = a.batch_size
    cfg.train.log_grad_freq = 0
    cfg.train.log_freq = 1000
    cfg.data.data_dir = a.data
    ckpt_dir = os.path.join(a.log_dir, "savedModel")
    os.makedirs(ckpt_dir, exist_ok=True)
    hb_path = os.path.join(a.log_dir, "soak_heartbeat.jsonl")

    trn_ds = IcoDataset.from_directory(a.data, 5, 2, "trn", ".npz", 0)
    val_ds = IcoDataset.from_directory(a.data, 5, 2, "val", ".npz", 0)

    def build():
        tr = Trainer(cfg)
        st = tr.init_state(trn_ds.inputs[:1], seed=0)
        trn = Batches(trn_ds, a.batch_size, shuffle=True, seed=0)
        val = Batches(val_ds, a.batch_size, shuffle=False)
        return tr, st, trn, val

    trainer, state, trn, val = build()
    # resume if a previous soak left a checkpoint
    start_epoch, best = 0, float("inf")
    latest = ckpt.latest_checkpoint(ckpt_dir, cfg.model.name)
    if latest:
        state, start_epoch, best = trainer.restore(state, latest)
        print(f"[soak] resumed from {latest} (epoch {start_epoch})", flush=True)

    t_end = time.time() + a.hours * 3600
    ep = start_epoch
    meshes = 0
    crashes = 0
    t0 = time.time()
    while time.time() < t_end:
        try:
            state, info = trainer.train_epoch(state, trn, ep)
            avg = trainer.validate(state, val, ep)
            v = float(avg.get("total", float("nan")))
            meshes += len(trn_ds)  # every epoch sees the whole dataset
            ep += 1
            if v < best:
                best = v
                trainer._save(state, ckpt_dir, cfg.model.name, ep, v,
                              best=True, best_loss=best)
                ckpt.gc_best_checkpoints(ckpt_dir, cfg.model.name)
            if ep % 200 == 0:
                rate = meshes / max(time.time() - t0, 1e-9)
                line = {"t": time.time(), "epoch": ep, "val": v,
                        "best": best, "meshes": meshes,
                        "meshes_per_s": round(rate, 1), "crashes": crashes}
                with open(hb_path, "a") as f:
                    f.write(json.dumps(line) + "\n")
                print(f"[soak] {line}", flush=True)
        except Exception as e:  # noqa: BLE001 — transient-filtered below
            s = f"{type(e).__name__}: {e}"
            transient = ("INTERNAL" in s or "FAILED_PRECONDITION" in s
                         or "UNAVAILABLE" in s or "DEADLINE_EXCEEDED" in s)
            if not transient:
                raise
            crashes += 1
            print(f"[soak] transient backend error #{crashes}: {s[:200]}; "
                  f"rebuilding + resuming", flush=True)
            time.sleep(120)
            for _ in range(20):
                try:
                    trainer, state, trn, val = build()
                    latest = ckpt.latest_checkpoint(ckpt_dir, cfg.model.name)
                    if latest:
                        state, ep, best = trainer.restore(state, latest)
                    else:
                        # no checkpoint yet: build() gave fresh random
                        # weights, so the pre-crash `best` is unreachable —
                        # reset it (and the epoch counter) or the run never
                        # writes another best checkpoint (advisor round-3)
                        ep, best = start_epoch, float("inf")
                    break
                except Exception:  # backend still wedged
                    time.sleep(60)
    dt = (time.time() - t0) / 3600
    print(f"[soak] DONE: {ep - start_epoch} epochs, {meshes} meshes in "
          f"{dt:.2f} h ({meshes / (dt * 3600):.0f} meshes/s sustained), "
          f"best val {best:.6f}, {crashes} transient crash(es) auto-recovered",
          flush=True)
    with open(os.path.join(a.log_dir, "soak_summary.json"), "w") as f:
        json.dump({"epochs": ep - start_epoch, "meshes": meshes,
                   "hours": round(dt, 2), "best_val": best,
                   "crashes_recovered": crashes}, f)


if __name__ == "__main__":
    main()
