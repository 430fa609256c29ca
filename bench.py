"""Headline benchmark: meshes/sec/chip training the ico2ico AE at I5, batch 36.

Runs on whatever accelerator `jax.devices()` provides (the real TPU chip
under the driver). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline anchor is
this framework's first recorded measurement (stored in BASELINE.md); until a
reference-GPU measurement exists, vs_baseline is reported against the
round-1 anchor below.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Round-1 anchor (meshes/sec/chip, ico2ico I5 train bs=36, fp32), measured
# 2026-08-16 on one TPU v5e chip via tunnel; see BASELINE.md.
BASELINE_MESHES_PER_SEC = 491.19  # round-1 fp32/XLA anchor (see BASELINE.md)


def build():
    from geniconet_tpu.data.datasets import synthetic_dataset
    from geniconet_tpu.data.pipeline import Batches
    from geniconet_tpu.train.config import Config
    from geniconet_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.name = "ico2ico"
    cfg.model.subdivisions = 5
    cfg.train.batch_size = 36  # README train command (reference README.md:67-69)
    # fast path: bf16 compute + fused Pallas conv kernels. Verified to track
    # the fp32/XLA loss trajectory on the same data (see BASELINE.md).
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.use_pallas = True
    cfg.train.log_grad_freq = 0
    ds = synthetic_dataset(5, 36, seed=0)
    trainer = Trainer(cfg)
    state = trainer.init_state(ds.inputs[:1])
    batches = Batches(ds, 36, shuffle=False)
    x, y, wt = next(iter(batches.epoch()))
    return trainer, state, (x, y, wt)


def main():
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    trainer, state, (x, y, wt) = build()

    # warmup / compile. NOTE: sync via device_get — block_until_ready does
    # not reliably wait on tunneled backends.
    t0 = time.perf_counter()
    state, metrics, _, _ = trainer._jit_train_step(state, x, y, wt, 0)
    float(jax.device_get(metrics["total"]))
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # timed steps: dispatch a pipelined window, hard-sync on the final loss
    steps = 30
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics, _, _ = trainer._jit_train_step(state, x, y, wt, 0)
    loss = float(jax.device_get(metrics["total"]))
    dt = time.perf_counter() - t0
    meshes_per_sec = 36 * steps / dt
    print(
        f"{steps} steps in {dt:.3f}s -> {meshes_per_sec:.1f} meshes/s (loss {loss:.5f})",
        file=sys.stderr,
    )

    vs = 1.0 if BASELINE_MESHES_PER_SEC is None else meshes_per_sec / BASELINE_MESHES_PER_SEC
    print(
        json.dumps(
            {
                "metric": "meshes/sec/chip train (ico2ico I5, bs36)",
                "value": round(meshes_per_sec, 2),
                "unit": "meshes/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
