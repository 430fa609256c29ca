"""Design measurement for the 2-D mesh routing decision (round-4): on a 2-D
('data','spatial') mesh with fused kernels requested, the trainer runs
FLATTENED DP over all axes (full grid per device) instead of W-sharding the
grid for the XLA conv path.

Two measurements back that default:

1. (virtual 8-CPU-device mesh, XLA convs, s=6) step time of 1-D DP(8) vs
   2-D (4,2) W-sharding at the same global batch — isolates the cost the
   spatial halo collectives add when memory does NOT force sharding. CPU
   collectives are not ICI, so only the SIGN of the difference is meaningful.
2. (hardware, single chip) the fused-kernel vs XLA-conv throughput ratio
   from the committed bench history (BASELINE.md: 2193 vs ~893 meshes/s
   bf16 ≈ 2.3x) — the factor the XLA fallback forfeits.

Conclusion encoded in trainer.__init__: DP keeps the fused 2.3x wherever
per-device batch >= 1; true W-sharding remains available (use_pallas=False
or indivisible batch) for the s7 regime where activations force it.

Writes artifacts/spatial_vs_dp.json.
Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/spatial_vs_dp.py
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as xb

if xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.parallel import mesh as mesh_lib
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer


def run(mesh, x_sharding, label, s=6, bs=8, widths=(8, 12, 16), steps=5):
    cfg = Config()
    cfg.model.name = "ico2ico"
    cfg.model.subdivisions = s
    cfg.model.widths = widths
    cfg.train.batch_size = bs
    cfg.train.log_grad_freq = 0
    ds = synthetic_dataset(s, bs, seed=0)
    tr = Trainer(cfg, mesh=mesh)
    st = tr.init_state(ds.inputs[:1])
    x = jax.device_put(ds.inputs, x_sharding)
    y = jax.device_put(ds.targets, mesh_lib.data_sharding(mesh))
    wt = jax.device_put(np.ones(bs, np.float32), mesh_lib.data_sharding(mesh))
    st, m, _, _ = tr._jit_train_step(st, x, y, wt, 0)  # compile
    float(jax.device_get(m["total"]))
    t0 = time.perf_counter()
    for _ in range(steps):
        st, m, _, _ = tr._jit_train_step(st, x, y, wt, 0)
    loss = float(jax.device_get(m["total"]))
    dt = (time.perf_counter() - t0) / steps
    print(f"{label}: {dt*1000:.1f} ms/step (loss {loss:.4f})", flush=True)
    return dt * 1000, loss


def main():
    assert len(jax.devices()) >= 8, jax.devices()
    mesh_dp = mesh_lib.make_mesh(8)
    t_dp, l_dp = run(mesh_dp, mesh_lib.data_sharding(mesh_dp), "1-D DP(8), XLA convs")
    mesh_2d = mesh_lib.make_mesh_2d(4, 2)
    t_2d, l_2d = run(mesh_2d, mesh_lib.spatial_batch_sharding(mesh_2d),
                     "2-D (4,2) W-sharded, XLA convs")
    out = {
        "method": "s=6 AE train step, 8 virtual CPU devices, XLA convs, "
                  "same global batch 8; CPU collectives stand in for ICI "
                  "(sign, not magnitude, is the signal)",
        "dp8_ms_per_step": round(t_dp, 1),
        "spatial_4x2_ms_per_step": round(t_2d, 1),
        "spatial_over_dp": round(t_2d / t_dp, 3),
        "hardware_fused_vs_xla_single_chip": {
            "fused_meshes_per_s": 2193,
            "xla_bf16_meshes_per_s": 893,
            "ratio": round(2193 / 893, 2),
            "source": "BASELINE.md round-1/round-3 measured rows",
        },
        "conclusion": "2-D W-sharding forfeits the fused-kernel ratio AND "
                      "adds halo collectives; flattened DP keeps the full "
                      "grid per device whenever per-device batch >= 1 "
                      "(trainer.__init__ routing). W-sharding remains the "
                      "XLA-path fallback for s>=7 memory limits.",
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/spatial_vs_dp.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
