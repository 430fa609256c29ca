"""Loss-curve parity: fp32/XLA vs bf16/fused-Pallas on identical data+seed.

The north-star requires the fast path to reproduce the reference-style loss
curves (BASELINE.json). This script trains the AE (and optionally the VAE)
under both numerics configs with the same data order, seeds and hyperparams,
and writes per-epoch train/val curves + divergence stats to
``artifacts/parity_curves.json``.

Run on TPU:  PYTHONPATH=. python scripts/parity_check.py [--epochs 15]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer


def run(model_name: str, dtype: str, use_pallas: bool, epochs: int, ds, val_ds):
    cfg = Config()
    cfg.model.name = model_name
    cfg.model.subdivisions = 5
    cfg.model.compute_dtype = dtype
    cfg.model.use_pallas = use_pallas
    cfg.train.batch_size = 36
    cfg.train.log_grad_freq = 0
    # reference optimizer settings (run.py:632-671); shorter cycle so the
    # LR actually moves within the check
    cfg.optim.step_size_up = 50
    cfg.optim.step_size_down = 50
    trainer = Trainer(cfg)
    state = trainer.init_state(ds.inputs[:1], seed=0)
    trn = Batches(ds, 36, shuffle=True, seed=123)
    val = Batches(val_ds, 36, shuffle=False)
    trn_curve, val_curve = [], []
    for epoch in range(epochs):
        losses = []
        for x, y, wt in trn.epoch():
            state, m, _, _ = trainer._jit_train_step(state, x, y, wt, epoch)
            losses.append(m["total"])
        trn_curve.append(float(np.mean([float(jax.device_get(l)) for l in losses])))
        avg = trainer.validate(state, val, epoch + 1)
        val_curve.append(avg["total"])
        print(f"  {model_name} {dtype}{'+pallas' if use_pallas else ''} "
              f"epoch {epoch}: trn {trn_curve[-1]:.5f} val {val_curve[-1]:.5f}",
              flush=True)
    return {"trn": trn_curve, "val": val_curve}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--vae", action="store_true", help="also run the VAE")
    a = p.parse_args()

    ds = synthetic_dataset(5, 144, seed=0)
    val_ds = synthetic_dataset(5, 36, seed=1)

    out = {}
    for model in (["ico2ico", "ico2ico_vae"] if a.vae else ["ico2ico"]):
        ref = run(model, "float32", False, a.epochs, ds, val_ds)
        fast = run(model, "bfloat16", True, a.epochs, ds, val_ds)
        rel = [
            abs(x - y) / max(abs(y), 1e-9) for x, y in zip(fast["val"], ref["val"])
        ]
        out[model] = {
            "reference_f32_xla": ref,
            "fast_bf16_pallas": fast,
            "val_rel_divergence": rel,
            "max_val_rel_divergence": max(rel),
        }
        print(f"{model}: max relative val-loss divergence = {max(rel):.4f}")

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/parity_curves.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote artifacts/parity_curves.json")


if __name__ == "__main__":
    main()
