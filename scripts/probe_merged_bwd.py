"""Hardware probes for the merged single-kernel backwards.

Round-2 observed: the merged backward kernels pass interpret-mode
verification but the whole-model program crashed the tunneled v5e at step 1
(INTERNAL). This probe isolates them: run ONE family's merged backward
standalone at the real model shapes (bs36 bf16) on the live backend, one
process per probe so a wedge doesn't take the bisection down with it.

Usage:
  python scripts/probe_merged_bwd.py pcs1 16 32 64 64     # family h w cin cout
  python scripts/probe_merged_bwd.py ds2  16 32 64 128
  python scripts/probe_merged_bwd.py upd  8 16 256 128
  python scripts/probe_merged_bwd.py model               # whole train step
"""

import os
import sys

os.environ.setdefault("GENICONET_EXPERIMENTAL", "1")  # quarantined family
os.environ.setdefault("GENICONET_MERGED_BWD", "all")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    fam = sys.argv[1]
    B = int(os.environ.get("PROBE_BS", "36"))
    with_stats = os.environ.get("PROBE_STATS", "1") == "1"
    dt = jnp.bfloat16

    if fam == "model":
        sys.path.insert(0, ".")
        from bench import build

        trainer, state, batches = build()
        x, y, wt = next(iter(batches.epoch()))
        state, m, _, _ = trainer._jit_train_step(state, x, y, wt, 0)
        print("model step loss:", float(jax.device_get(m["total"])))
        for _ in range(5):
            state, m, _, _ = trainer._jit_train_step(state, x, y, wt, 0)
        print("5 more steps ok, loss:", float(jax.device_get(m["total"])))
        return

    h, w, cin, cout = map(int, sys.argv[2:6])
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, dt)
    phases = tuple(mk(B, 5, h, w, cin) for _ in range(4))
    taps = mk(7, cin, cout)
    bias = mk(cout)

    from geniconet_tpu.ops.pallas import phase_kernel as pk

    if fam == "pcs1":
        def f(phases, taps, bias):
            r = pk.fused_phase_conv_s1(
                phases, taps, bias, "average", with_stats=with_stats
            )
            out, st = r if with_stats else (r, 0.0)
            return (sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out)
                    + jnp.sum(st))
    elif fam == "ds2":
        taps_b = mk(7, cin, cout)
        bias_b = mk(cout)

        def f(phases, taps, bias):
            r = pk.fused_dual_s2_conv(
                phases, taps, bias, taps_b, bias_b, "average",
                with_stats=with_stats,
            )
            (ya, yb, sa, sb) = r if with_stats else (*r, 0.0, 0.0)
            return (jnp.sum(ya.astype(jnp.float32) ** 2)
                    + jnp.sum(yb.astype(jnp.float32) ** 2)
                    + jnp.sum(sa) + jnp.sum(sb))
    elif fam == "upd":
        x = mk(B, 5, h, w, cin)
        taps_b = mk(7, cin, cout)
        bias_b = mk(cout)

        def f(x, taps, bias):
            r = pk.fused_up_dual_conv(
                x, taps, bias, taps_b, bias_b, "average", with_stats=with_stats
            )
            (ya, yb, sa, sb) = r if with_stats else (*r, 0.0, 0.0)
            return (sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in ya)
                    + sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in yb)
                    + jnp.sum(sa) + jnp.sum(sb))
        phases = x
    else:
        raise SystemExit(f"unknown family {fam}")

    g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))
    out = g(phases, taps, bias)
    leaves = jax.tree.leaves(out)
    vals = [float(jnp.sum(jnp.abs(l.astype(jnp.float32)))) for l in
            jax.device_get(leaves)]
    assert all(np.isfinite(v) for v in vals), vals
    print(f"probe {fam} h={h} w={w} cin={cin} cout={cout} bs={B} "
          f"stats={with_stats}: OK (grad |sum|={sum(vals):.3f})")


if __name__ == "__main__":
    main()
