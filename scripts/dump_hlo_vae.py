"""Dump the compiled HLO of the three VAE split-step programs and print
the definitions of named fusions, so the round-4 trace's 13 ms/step of
`fusion.10`/`fusion.11`-style XLA elementwise work can be attributed to
model code.

Usage: GENICONET_BENCH_MODEL=ico2ico_vae python scripts/dump_hlo_vae.py \
           [--outdir /tmp/gn_hlo_vae] [op names...]
"""

import argparse
import os
import sys

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/gn_hlo_vae")
    ap.add_argument("ops", nargs="*", help="op names to print definitions for")
    a = ap.parse_args()
    os.makedirs(a.outdir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    from bench import build

    trainer, state, batches = build()
    assert trainer._split_step, "expected the VAE split-step trainer"
    tables = trainer.prepared_tables(batches)
    idx, wt = next(iter(batches.epoch_indices()))

    # lower the SAME three programs the split step dispatches
    feat_shape = jax.eval_shape(
        trainer._split_enc_fwd, state.params, state.batch_stats, tables, idx
    )[0]
    feat = jax.numpy.zeros(feat_shape.shape, feat_shape.dtype)
    progs = {
        "p1_enc_fwd": trainer._jit_split_enc_fwd.lower(
            state.params, state.batch_stats, tables, idx),
        "p2_dec_grad": trainer._jit_split_dec_grad.lower(
            state.params, state.batch_stats, state.rng, state.step,
            feat, tables, idx, wt, 0),
    }
    texts = {}
    for name, lowered in progs.items():
        txt = lowered.compile().as_text()
        path = os.path.join(a.outdir, f"{name}.hlo.txt")
        with open(path, "w") as f:
            f.write(txt)
        texts[name] = txt
        print(f"wrote {len(txt)} bytes to {path}", file=sys.stderr)

    for name in a.ops:
        for prog, txt in texts.items():
            for line in txt.splitlines():
                ls = line.strip()
                if ls.startswith(f"%{name} = ") or ls.startswith(f"{name} = "):
                    print(f"--- {prog} {name}:")
                    print(ls[:2400])
                    break


if __name__ == "__main__":
    main()
