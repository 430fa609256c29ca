"""Autonomous bisection of the VAE-bs36 Pallas crash (ROADMAP 'Known issue';
VERDICT round-2 #2).

Runs one VAE bs36 train step per configuration in a SUBPROCESS, with the
fused path restricted to a subset of blocks via GENICONET_PALLAS_BLOCKS
(nn/layers.pallas_block_enabled). A crash (INTERNAL backend error) kills
only the subprocess; the orchestrator then polls a trivial device op until
the tunneled backend recovers (5-30 min) before the next configuration.

Results land in artifacts/vae36_bisect.json as {config: "ok"|"crash"}.

Usage (detached, hours):
    nohup python scripts/bisect_vae36.py > /tmp/bisect_vae36.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "vae36_bisect.json")

# s=5 VAE fused blocks: encoder conv_in/down0/down1, decoder up0/up1
# (the mu/logvar stride-2 heads and the 1x1 output head are XLA).
CONFIGS = [
    ("encoder_only", "conv_in,down0,down1"),
    ("decoder_only", "up0,up1"),
    ("down_only", "down0,down1"),
    ("conv_in_only", "conv_in"),
    ("up0_only", "up0"),
    ("up1_only", "up1"),
    ("down0_only", "down0"),
    ("down1_only", "down1"),
    # control: the known-crashing full set, named EXPLICITLY — an empty env
    # would fall back to the Trainer's 4/5-block workaround default
    ("all", "conv_in,down0,down1,up0,up1,heads"),
    # Round-3 phase 1 verdict: every single block and each half passes;
    # only the full set crashes -> threshold/interaction, not a kernel.
    # Phase 2: all-minus-one — if some pass, the removed block is
    # load-bearing; if all crash, it is purely a program-size threshold.
    ("all_minus_convin", "down0,down1,up0,up1"),
    ("all_minus_down0", "conv_in,down1,up0,up1"),
    ("all_minus_down1", "conv_in,down0,up0,up1"),
    ("all_minus_up0", "conv_in,down0,down1,up1"),
    ("all_minus_up1", "conv_in,down0,down1,up0"),
]

_STEP = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
from geniconet_tpu import enable_compilation_cache
enable_compilation_cache()
from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer

cfg = Config()
cfg.model.name = "ico2ico_vae"
cfg.model.subdivisions = 5
cfg.train.batch_size = 36
cfg.model.compute_dtype = "bfloat16"
cfg.model.use_pallas = True
cfg.train.log_grad_freq = 0
trainer = Trainer(cfg)
ds = synthetic_dataset(5, 36, seed=0)
state = trainer.init_state(ds.inputs[:1])
x = jnp.asarray(ds.inputs[:36]); y = jnp.asarray(ds.targets[:36])
wt = jnp.ones((36,), jnp.float32)
for i in range(3):
    state, metrics, _, _ = trainer._jit_train_step(state, x, y, wt, 0)
    loss = float(jax.device_get(metrics["total"]))
    print(f"step {{i}}: loss={{loss:.5f}}", flush=True)
print("STEP_OK", flush=True)
"""

_HEALTH = ("import jax, jax.numpy as jnp; "
           "print('HEALTH_OK', float(jnp.sum(jnp.arange(8.0))))")


def wait_healthy(max_wait=2400):
    """Poll a trivial device op until the backend answers (or give up)."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        p = subprocess.run([sys.executable, "-c", _HEALTH],
                           capture_output=True, text=True, timeout=600)
        if "HEALTH_OK" in p.stdout:
            return True
        print(f"[bisect] backend not healthy yet "
              f"({time.time() - t0:.0f}s); waiting 60s", flush=True)
        time.sleep(60)
    return False


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    results = {}
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    for name, blocks in CONFIGS:
        if name in results:
            print(f"[bisect] {name}: cached {results[name]}", flush=True)
            continue
        if not wait_healthy():
            print("[bisect] backend never recovered; aborting", flush=True)
            return 1
        env = dict(os.environ)
        if blocks:
            env["GENICONET_PALLAS_BLOCKS"] = blocks
        else:
            env.pop("GENICONET_PALLAS_BLOCKS", None)
        print(f"[bisect] running {name} (blocks={blocks or 'ALL'})",
              flush=True)
        t0 = time.time()
        code = _STEP.format(repo=REPO)
        try:
            p = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True, timeout=3600)
            ok = "STEP_OK" in p.stdout
            tail = (p.stdout + p.stderr)[-400:]
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
