"""K2 microbenchmark: is K=128 packing worth plumbing scratch refs?

The fused kernels contract 7 taps at K=cin each. At cin=64 that is 7
matmuls at half the MXU's contraction depth. K2 packs tap pairs to
K=128 — but inside the real kernels the pack (lane pad+add of halo-buffer
views) trips Mosaic layout propagation ("result/input offset mismatch"),
and the fix is bouncing operands through VMEM scratch (the packed-phase
precedent at phase_kernel.py:_unpack_phases).

Before paying that plumbing, this standalone probe measures the ceiling:
identical matmul work from CLEAN refs (offset-0 layouts), baseline
(7 x K=64) vs packed (3 x K=128 + 1 x K=64) vs scratch-bounced pack
(the shape the in-kernel fix would take). All shapes mirror the decoder
C=64 block at s=5: rows = 2*5*16*32 (k=2 phase rows), cout=64.

Usage: python scripts/probe_k2_micro.py   (on the TPU)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 2 * 5 * 16 * 32  # k=2, 5 phases, h=16, w=32
CIN = 64
COUT = 64
REPS = int(os.environ.get("K2_MICRO_REPS", "40"))


def k_baseline(a_refs, w_ref, o_ref):
    acc = jnp.zeros((ROWS, COUT), jnp.float32)
    for r in range(REPS):
        for t in range(7):
            acc += jnp.dot(a_refs[t][...], w_ref[t],
                           preferred_element_type=jnp.float32)
    o_ref[...] = acc


def k_packed(a_refs, w_ref, o_ref):
    # pack from refs: clean offset-0 operands, pure lane concat
    acc = jnp.zeros((ROWS, COUT), jnp.float32)
    for r in range(REPS):
        for t0 in range(0, 6, 2):
            a2 = jnp.concatenate([a_refs[t0][...], a_refs[t0 + 1][...]],
                                 axis=1)
            w2 = jnp.concatenate([w_ref[t0], w_ref[t0 + 1]], axis=0)
            acc += jnp.dot(a2, w2, preferred_element_type=jnp.float32)
        acc += jnp.dot(a_refs[6][...], w_ref[6],
                       preferred_element_type=jnp.float32)
    o_ref[...] = acc


def k_scratch(a_refs, w_ref, o_ref, s_ref):
    # the in-kernel fix shape: bounce each pair through a VMEM scratch
    # (store both halves, load the packed row back)
    acc = jnp.zeros((ROWS, COUT), jnp.float32)
    for r in range(REPS):
        for t0 in range(0, 6, 2):
            s_ref[:, :CIN] = a_refs[t0][...]
            s_ref[:, CIN:] = a_refs[t0 + 1][...]
            w2 = jnp.concatenate([w_ref[t0], w_ref[t0 + 1]], axis=0)
            acc += jnp.dot(s_ref[...], w2, preferred_element_type=jnp.float32)
        acc += jnp.dot(a_refs[6][...], w_ref[6],
                       preferred_element_type=jnp.float32)
    o_ref[...] = acc


def run(kernel, with_scratch, label, dtype):
    a = [jnp.asarray(np.random.RandomState(t).randn(ROWS, CIN), dtype)
         for t in range(7)]
    w = jnp.asarray(np.random.RandomState(99).randn(7, CIN, COUT), dtype)

    def kfn(*refs):
        if with_scratch:
            *ins, o, s = refs
            kernel(ins[:-1], ins[-1], o, s)
        else:
            *ins, o = refs
            kernel(ins[:-1], ins[-1], o)

    call = pl.pallas_call(
        kfn,
        in_specs=[pl.BlockSpec((ROWS, CIN), lambda: (0, 0))] * 7
        + [pl.BlockSpec((7, CIN, COUT), lambda: (0, 0, 0))],
        out_specs=pl.BlockSpec((ROWS, COUT), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS, COUT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS, 2 * CIN), dtype)]
        if with_scratch else [],
    )
    f = jax.jit(lambda *xs: call(*xs))
    try:
        out = f(*a, w)
        float(jax.device_get(out[0, 0]))
    except Exception as e:  # noqa: BLE001
        print(f"{label}: COMPILE/RUN FAILED: {str(e)[:300]}", flush=True)
        return None, None
    t0 = time.perf_counter()
    N = int(os.environ.get("K2_MICRO_N", "50"))
    for _ in range(N):
        out = f(*a, w)
    float(jax.device_get(out[0, 0]))
    dt = (time.perf_counter() - t0) / N
    flops = 2 * REPS * 7 * ROWS * CIN * COUT
    print(f"{label}: {dt*1e6:.1f} us/call  {flops/dt/1e12:.2f} TFLOP/s",
          flush=True)
    return dt, flops


def main():
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)
    res = {}
    for dname, dtype in [("bf16", jnp.bfloat16)]:
        for label, kern, ws in [
            ("baseline_7xK64", k_baseline, False),
            ("packed_3xK128", k_packed, False),
            ("scratch_3xK128", k_scratch, True),
        ]:
            dt, flops = run(kern, ws, f"{label}_{dname}", dtype)
            res[f"{label}_{dname}"] = (
                None if dt is None else
                {"us_per_call": round(dt * 1e6, 1),
                 "tflops": round(flops / dt / 1e12, 2)})
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "k2_micro.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
