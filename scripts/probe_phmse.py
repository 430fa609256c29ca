"""Standalone hardware probe for the fused head+MSE kernel pair
(`fused_pair_head_mse` fwd + custom-VJP bwd) at the headline shapes
(ico2ico I5 bs36: phase grids (36,5,16,32,64), F=3).

Run detached on the tunneled TPU (never under a tight timeout — a SIGTERM
mid remote Mosaic compile wedges the backend):
    nohup python scripts/probe_phmse.py > /tmp/probe_phmse.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from geniconet_tpu import enable_compilation_cache
    from geniconet_tpu.ops.pallas import phase_kernel as pk

    enable_compilation_cache()
    B = int(os.environ.get("PROBE_BS", "36"))
    s = int(os.environ.get("PROBE_S", "5"))
    cin = int(os.environ.get("PROBE_CIN", "64"))
    F = 3
    h, w = (1 << s) // 2, (1 << (s + 1)) // 2
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    mk = lambda i, *shape: jax.random.normal(ks[i], shape, jnp.float32)

    b0 = tuple(mk(p, B, 5, h, w, cin).astype(dt) for p in range(4))
    y10 = tuple(mk(4 + p, B, 5, h, w, cin).astype(dt) for p in range(4))
    affines = tuple(mk(8 + i, cin) * 0.1 + (1.0 if i % 2 == 0 else 0.0)
                    for i in range(4))
    Wh = (mk(12, cin, F) * 0.05).astype(dt)
    bh = mk(13, F) * 0.05
    tpack = mk(14, B, 5, h, w, 4 * F) * 0.3
    tpoles = mk(15, B, 2 * F) * 0.3

    # tpack/tpoles MUST be arguments: a jit-closed-over multi-MB array is
    # inlined as an HLO literal, which the tunneled backend accepts at
    # compile but kills the device at execution (INTERNAL) — this probe's
    # original closure was itself the "phmse runtime crash" under
    # investigation (micro-bisect: the kernel body, specs, cost estimate,
    # and jit context all pass individually).
    def loss(b0, y10, affines, Wh, bh, tpack, tpoles):
        sse = pk.fused_pair_head_mse(b0, y10, affines, Wh, bh, tpack, tpoles)
        return jnp.sum(sse)

    print("fwd compile+run...", flush=True)
    v = float(jax.device_get(
        jax.jit(loss)(b0, y10, affines, Wh, bh, tpack, tpoles)))
    assert np.isfinite(v), v
    print(f"fwd OK: sse_total={v:.3f}", flush=True)

    print("bwd compile+run...", flush=True)
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
        b0, y10, affines, Wh, bh, tpack, tpoles
    )
    vals = [float(jnp.sum(jnp.abs(l.astype(jnp.float32))))
            for l in jax.device_get(jax.tree.leaves(g))]
    assert all(np.isfinite(x) for x in vals), vals
    print(f"bwd OK: grad |sum|={sum(vals):.3f}", flush=True)
    print(f"probe phmse B={B} s={s} cin={cin}: OK", flush=True)


if __name__ == "__main__":
    main()
