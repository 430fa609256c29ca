"""Bisect the VAE bs36 split-step crash (round-4): which of the three split
programs (enc fwd / dec grad / enc bwd+Adam) crosses the tunneled backend's
crash threshold, and whether the default stats-cotangent folds are implicated
inside the new, smaller programs.

Crash-recovering subprocess harness (pattern of bisect_vae36.py).
Results: artifacts/split_bisect.json.

Usage:  nohup python scripts/bisect_split.py > /tmp/bisect_split.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "split_bisect.json")

# (name, stage, GENICONET_KERNEL_GEFF or None for default)
# v1 results (encode/decode partition): p1 ok, p2 ok (±folds), p3 (full
# encoder bwd+Adam) crash WITH default folds, ok with GEFF=0 — the folds,
# not raw program size, crossed the threshold in that program. v2 moves
# the heads' backward into p2 (trunk partition).
CONFIGS = [
    ("v2_p1_trunkfwd", "p1", None),
    ("v2_p2_headsdecgrad", "p2", None),
    ("v2_p3_trunkbwd", "p3", None),
    ("v2_p3_trunkbwd_nofold", "p3", "0"),
    ("v2_full", "full", None),
    ("v2_full_nofold", "full", "0"),
]

_BODY = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
import numpy as np
from geniconet_tpu import enable_compilation_cache
enable_compilation_cache()
from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer

stage = {stage!r}
cfg = Config()
cfg.model.name = "ico2ico_vae"
cfg.model.subdivisions = 5
cfg.train.batch_size = 36
cfg.model.compute_dtype = "bfloat16"
cfg.model.use_pallas = True
cfg.train.log_grad_freq = 0
tr = Trainer(cfg)
assert tr._split_step
ds = synthetic_dataset(5, 36, seed=0)
state = tr.init_state(ds.inputs[:1])
batches = Batches(ds, 36, shuffle=False)
tables = tr.prepared_tables(batches)
idx, wt = next(iter(batches.epoch_indices()))
idx = jnp.asarray(idx); wt = jnp.asarray(wt)

for i in range(3):
    if stage == "full":
        tables, (state, m, _, _) = tr.gather_train_step(state, tables, idx, wt, 0)
        print(f"step {{i}}: loss={{float(jax.device_get(m['total'])):.5f}}", flush=True)
        continue
    feat, bse = tr._jit_split_enc_fwd(state.params, state.batch_stats, tables, idx)
    if stage == "p1":
        print(f"p1 {{i}}: feat_sum={{float(jax.device_get(jnp.sum(feat.astype(jnp.float32)))):.4f}}", flush=True)
        continue
    if stage == "p2":
        loss, m, misc, bsd, gd, gfeat = tr._jit_split_dec_grad(
            state.params, state.batch_stats, state.rng, state.step,
            feat, tables, idx, wt, 0)
        print(f"p2 {{i}}: loss={{float(jax.device_get(loss)):.5f}}", flush=True)
        continue
    if stage == "p3":
        # synthetic cotangents so p3 runs without p2
        gfeat = jnp.ones_like(feat) * 1e-3
        gd = jax.tree.map(jnp.zeros_like, state.params)
        m0 = {{"total": jnp.zeros(()), "mse": jnp.zeros(())}}
        state, m, _ = tr._jit_split_enc_bwd(
            state, tables, idx, gfeat, gd, bse, {{}}, m0, jnp.zeros(()))
        print(f"p3 {{i}}: gn={{float(jax.device_get(m['grad_norm'])):.5f}}", flush=True)
        continue
print("STAGE_OK", flush=True)
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
        print(f"[bisect] backend not healthy ({time.time()-t0:.0f}s); "
              f"waiting 60s", flush=True)
        time.sleep(60)
    return False


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for name, stage, geff in CONFIGS:
        if name in results:
            print(f"[bisect] {name}: cached {results[name]}", flush=True)
            continue
        if not wait_healthy():
            print("[bisect] backend never recovered; aborting", flush=True)
            return 1
        env = dict(os.environ)
        env["GENICONET_EXPERIMENTAL"] = "1"  # probes reach quarantined knobs
        env["GENICONET_VAE_SPLIT"] = "1"  # the split chain is opt-in
        if geff is not None:
            env["GENICONET_KERNEL_GEFF"] = geff
        else:
            env.pop("GENICONET_KERNEL_GEFF", None)
        print(f"[bisect] running {name} (stage={stage}, GEFF={geff})",
              flush=True)
        t0 = time.time()
        code = _BODY.format(repo=REPO, stage=stage)
        try:
            p = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True, timeout=3600)
            ok = "STAGE_OK" in p.stdout
            tail = (p.stdout + p.stderr)[-500:]
        except subprocess.TimeoutExpired:
            ok, tail = False, "timeout 3600s"
        results[name] = "ok" if ok else "crash"
        print(f"[bisect] {name}: {results[name]} ({time.time()-t0:.0f}s)\n"
              f"--- tail ---\n{tail}\n------------", flush=True)
        json.dump(results, open(OUT, "w"), indent=1)
    print(f"[bisect] done: {results}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
