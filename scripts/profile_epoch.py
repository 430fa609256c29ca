"""Trace the whole-epoch scan program (trainer.train_epoch) and attribute
device time per op — the epoch-loop counterpart of profile_step.py.

The scan program differs from the per-step hot jit: batch gathers come from
the precomputed epoch order (dynamic-slice), and the packed-input kernels
take the split_packed lane-slice workaround (ROADMAP 'Known issue').

Usage: nohup python scripts/profile_epoch.py > /tmp/profile_epoch.log 2>&1 &
"""

import sys
import time

import jax


def main():
    sys.path.insert(0, ".")
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    from bench import build

    import scripts.profile_step as ps

    trainer, state, batches = build()
    ps._USE_PALLAS = bool(trainer.model.use_pallas)
    # warm both epoch programs (per-step epoch 0, scan thereafter)
    state, _ = trainer.train_epoch(state, batches, 0)
    state, _ = trainer.train_epoch(state, batches, 0)
    epochs, spe = 4, len(batches)
    t0 = time.perf_counter()
    jax.profiler.start_trace("/tmp/gn_trace_scan")
    for _ in range(epochs):
        state, info = trainer.train_epoch(state, batches, 0)
    float(jax.device_get(state.step))
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    steps = epochs * spe
    print(
        f"{epochs} epochs ({steps} steps) in {dt:.3f}s -> "
        f"{dt/steps*1e3:.2f} ms/step wall, "
        f"{epochs*len(batches.ds)/dt:.1f} meshes/s",
        flush=True,
    )
    ps.summarize("/tmp/gn_trace_scan", steps)


if __name__ == "__main__":
    main()
