"""Benchmark sweep: train/infer throughput across models, dtypes, kernels.

Produces a markdown table (stdout + artifacts/BENCHMARKS.md). All timings use
pipelined dispatch with a hard `device_get` sync at the window end
(`block_until_ready` does not wait over tunneled backends).

Run on TPU:  PYTHONPATH=. python scripts/benchmarks.py [--steps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer


def bench_train(model, s, bs, dtype, pallas, steps, widths=None):
    cfg = Config()
    cfg.model.name = model
    cfg.model.subdivisions = s
    if widths:
        cfg.model.widths = widths
    cfg.train.batch_size = bs
    cfg.model.compute_dtype = dtype
    cfg.model.use_pallas = pallas
    cfg.train.log_grad_freq = 0
    ds = synthetic_dataset(s, bs, seed=0)
    tr = Trainer(cfg)
    state = tr.init_state(ds.inputs[:1])
    # the same hot path bench.py times: in-jit gather from resident tables
    # + XLA-chosen table/state layouts (trainer.gather_train_step)
    batches = Batches(ds, bs, shuffle=False)
    tables = tr.prepared_tables(batches)
    idx, wt = next(iter(batches.epoch_indices()))
    tables, (state, m, _, _) = tr.gather_train_step(state, tables, idx, wt, 0)
    float(jax.device_get(m["total"]))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(steps):
        tables, (state, m, _, _) = tr.gather_train_step(
            state, tables, idx, wt, 0)
    loss = float(jax.device_get(m["total"]))
    dt = time.perf_counter() - t0
    return bs * steps / dt, dt / steps * 1000, loss, tr, state, ds


def bench_decode(tr, state, s, bs, steps):
    model = tr.model
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    hz, wz = 5 * 2 ** (s - 3), 2 ** (s - 2)
    cz = tr.cfg.model.latent_features if tr.is_vae else tr.cfg.model.widths[-1]
    z = jnp.zeros((bs, hz, wz, cz), jnp.float32)
    dec = jax.jit(lambda z: model.apply(variables, z, method="decode"))
    float(jax.device_get(jnp.sum(dec(z))))
    t0 = time.perf_counter()
    for _ in range(steps):
        r = dec(z)
    float(jax.device_get(jnp.sum(r)))
    dt = time.perf_counter() - t0
    return dt / steps * 1000


def main():
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--only", type=str, default="",
                   help="substring filter over config labels")
    p.add_argument("--append", action="store_true",
                   help="append rows to artifacts/BENCHMARKS.md instead of rewriting")
    a = p.parse_args()
    rows = []
    print(f"devices: {jax.devices()}", file=sys.stderr)

    configs = [
        # (label, model, s, bs, dtype, pallas, widths, env)
        ("AE s5 bs36 fp32 XLA", "ico2ico", 5, 36, "float32", False, None, {}),
        ("AE s5 bs36 bf16 XLA", "ico2ico", 5, 36, "bfloat16", False, None, {}),
        ("AE s5 bs36 bf16 Pallas", "ico2ico", 5, 36, "bfloat16", True, None, {}),
        ("VAE s5 bs36 bf16 XLA", "ico2ico_vae", 5, 36, "bfloat16", False, None, {}),
        ("VAE s5 bs12 bf16 Pallas", "ico2ico_vae", 5, 12, "bfloat16", True, None, {}),
        # the one-program bs36 default: all five conv blocks fused, mu/logvar
        # heads on XLA (fastest stable subset, artifacts/vae36_sweep.json;
        # the fully-fused one-program set crashes the tunneled backend)
        ("VAE s5 bs36 bf16 Pallas all-convs (heads XLA; default)",
         "ico2ico_vae", 5, 36, "bfloat16", True, None, {}),
        # round-4 split-step v2: every block fused across three dispatched
        # programs (GENICONET_VAE_SPLIT=1; artifacts/split_bisect.json)
        ("VAE s5 bs36 bf16 Pallas split-step v2 (all fused)",
         "ico2ico_vae", 5, 36, "bfloat16", True, None,
         {"GENICONET_VAE_SPLIT": "1"}),
        ("AE s6 bs8 bf16 Pallas", "ico2ico", 6, 8, "bfloat16", True, None, {}),
    ]
    for label, model, s, bs, dtype, pallas, widths, env in configs:
        if a.only and a.only not in label:
            continue
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            mps, ms, loss, tr, state, ds = bench_train(
                model, s, bs, dtype, pallas, a.steps, widths
            )
            d1 = bench_decode(tr, state, s, 1, 50)
            dB = bench_decode(tr, state, s, bs, 20)
            rows.append((label, mps, ms, d1, dB / bs, loss))
            print(f"{label}: {mps:.0f} meshes/s  {ms:.1f} ms/step  "
                  f"decode {d1:.2f} ms (batched {dB/bs:.3f} ms/mesh)", file=sys.stderr)
        except Exception as e:
            print(f"{label}: FAILED {e}", file=sys.stderr)
            rows.append((label, None, None, None, None, None))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    notes = (
        "\nNotes: the fully-fused one-program VAE bs36 configuration crashes "
        "the tunneled backend at execution (ROADMAP probe matrix); the "
        "bisection (artifacts/vae36_bisect.json) shows every 4-of-5 "
        "fused-block subset passes, and the round-4 sweep "
        "(artifacts/vae36_sweep.json) picked all-convs-fused/heads-on-XLA "
        "as the fastest stable one-program default (the `pallas_blocks` "
        "model attribute set in build_model). Split-step v2 "
        "(GENICONET_VAE_SPLIT=1) keeps every block fused across three "
        "dispatched programs. AE rows use the gather fast path + "
        "XLA-chosen layouts (the bench.py headline methodology).\n"
    )
    lines = [
        "# BENCHMARKS (generated by scripts/benchmarks.py)",
        "",
        f"Device: {jax.devices()[0]}. {a.steps}-step pipelined windows, hard sync.",
        "",
        "| config | train meshes/s | ms/step | decode 1 mesh (ms) | decode batched (ms/mesh) | loss after window |",
        "|---|---|---|---|---|---|",
    ]
    for label, mps, ms, d1, db, loss in rows:
        if mps is None:
            lines.append(f"| {label} | FAILED | | | | |")
        else:
            lines.append(
                f"| {label} | {mps:.0f} | {ms:.1f} | {d1:.2f} | {db:.3f} | {loss:.5f} |"
            )
    os.makedirs("artifacts", exist_ok=True)
    if a.append and os.path.exists("artifacts/BENCHMARKS.md"):
        lines = lines[6:]  # rows only
        mode = "a"
    else:
        lines.append(notes)
        mode = "w"
    out = "\n".join(lines) + "\n"
    print(out)
    with open("artifacts/BENCHMARKS.md", mode) as f:
        f.write(out)


if __name__ == "__main__":
    main()
