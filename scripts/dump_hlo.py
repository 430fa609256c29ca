"""Dump the compiled train-step HLO (on the live backend) and print the
definitions of named ops, so trace entries like `fusion.672` / `copy.233`
can be attributed to model code.

Usage: python scripts/dump_hlo.py [--out /tmp/gn_hlo.txt] [op names...]
"""

import argparse
import sys

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gn_hlo.txt")
    ap.add_argument("ops", nargs="*", help="op names to print definitions for")
    a = ap.parse_args()

    sys.path.insert(0, ".")
    from geniconet_tpu import enable_compilation_cache

    enable_compilation_cache()
    from bench import build

    trainer, state, batches = build()
    # lower the SAME program the bench/profiler time: the in-jit-gather step
    tables = trainer.prepared_tables(batches)
    idx, wt = next(iter(batches.epoch_indices()))
    lowered = trainer._jit_train_step_gather.lower(state, tables, idx, wt, 0)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(a.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {a.out}", file=sys.stderr)
    for name in a.ops:
        for line in txt.splitlines():
            ls = line.strip()
            if ls.startswith(f"%{name} ") or ls.startswith(f"{name} ") or (
                f" {name} = " in ls or ls.startswith(f"%{name}.") is False and f"%{name} = " in ls
            ):
                print(f"--- {name}:")
                print(ls[:2000])
                break


if __name__ == "__main__":
    main()
