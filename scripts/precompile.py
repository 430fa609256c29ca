"""Pre-seed the persistent compilation cache for the standard programs.

Cold-compiling the s=5 fused train step costs minutes on the tunneled TPU
backend: every Mosaic kernel inside one XLA program is an HTTP round trip to
the remote compile helper, serialized (~40 kernels in the bs36 train step —
BENCH_r02 measured 404.6s cold). This script warms the cache as a BUILD STEP
so interactive runs and the driver benchmark pay the warm-path ~15s instead:

- each listed program is compiled AOT (`jit(...).lower(args).compile()`) in
  its OWN subprocess, so independent programs overlap their tunnel round
  trips (`--jobs`), and a compiler crash can't take down the seeding run;
- nothing is ever executed on the device — compile-only, no wedge risk.

Usage:
    python scripts/precompile.py                # all standard programs
    python scripts/precompile.py --jobs 4
    python scripts/precompile.py --programs ae_train,decode

Programs cover the benchmark + reference training regimes (README.md:67-73):
AE/VAE train+eval at I5 bs36 (bf16 fused path), the single-mesh decode jit
(the app's generative path), and the fused-MSE AE train variant.
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np
from geniconet_tpu import enable_compilation_cache
enable_compilation_cache()
from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer

prog = {prog!r}
cfg = Config()
cfg.model.name = "ico2ico_vae" if prog.startswith("vae") else "ico2ico"
cfg.model.subdivisions = 5
cfg.train.batch_size = 36
cfg.model.compute_dtype = "bfloat16"
cfg.model.use_pallas = True
cfg.train.log_grad_freq = 0
if prog == "ae_train_fused_mse":
    os.environ["GENICONET_FUSED_MSE"] = "1"

trainer = Trainer(cfg)
ds = synthetic_dataset(5, 36, seed=0)
state = trainer.init_state(ds.inputs[:1])
x = jnp.asarray(ds.inputs[:36])
y = jnp.asarray(ds.targets[:36])
wt = jnp.ones((36,), jnp.float32)

t0 = time.perf_counter()
if prog in ("ae_train", "vae_train", "ae_train_fused_mse"):
    trainer._jit_train_step.lower(state, x, y, wt, 0).compile()
elif prog in ("ae_eval", "vae_eval"):
    trainer._jit_eval_step.lower(state, x, y, wt, 0).compile()
elif prog == "decode":
    model = trainer.model
    variables = {{"params": state.params, "batch_stats": state.batch_stats}}
    s = trainer.s
    z = jax.ShapeDtypeStruct(
        (1, 5 * 2 ** (s - 3), 2 ** (s - 2), model.widths[-1]), jnp.float32
    )
    fn = jax.jit(lambda v, zz: model.apply(v, zz, train=False,
                                           method=model.decode))
    fn.lower(variables, z).compile()
else:
    raise SystemExit(f"unknown program {{prog}}")
dt = time.perf_counter() - t0
print(f"[precompile] {{prog}}: compiled in {{dt:.1f}}s", flush=True)
"""

STANDARD = ["ae_train", "ae_eval", "ae_train_fused_mse", "vae_train",
            "vae_eval", "decode"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", default=",".join(STANDARD),
                    help=f"comma list from {STANDARD}")
    ap.add_argument("--jobs", type=int, default=3,
                    help="concurrent compile subprocesses")
    a = ap.parse_args()
    progs = [p.strip() for p in a.programs.split(",") if p.strip()]

    t0 = time.perf_counter()
    pending = list(progs)
    running = {}
    failed = []
    while pending or running:
        while pending and len(running) < a.jobs:
            prog = pending.pop(0)
            code = _WORKER.format(repo=REPO, prog=prog)
            running[prog] = subprocess.Popen([sys.executable, "-c", code])
            print(f"[precompile] launched {prog}", flush=True)
        time.sleep(2.0)
        for prog, proc in list(running.items()):
            rc = proc.poll()
            if rc is None:
                continue
            del running[prog]
            if rc != 0:
                failed.append(prog)
                print(f"[precompile] {prog} FAILED (rc={rc})", flush=True)
    dt = time.perf_counter() - t0
    print(f"[precompile] {len(progs) - len(failed)}/{len(progs)} programs "
          f"warmed in {dt:.1f}s" + (f"; failed: {failed}" if failed else ""),
          flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
