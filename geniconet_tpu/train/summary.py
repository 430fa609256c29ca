"""Model introspection: parameter table + shape summary.

The torchsummary-equivalent surface (reference run.py:427-430, 512-513 save
a text summary and a graph drawing at train/test start): a per-module
parameter table with shapes, counts and the output shape of each top-level
stage, saved as text.
"""

from __future__ import annotations

import io

import jax
import numpy as np

__all__ = ["model_summary", "count_params"]


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def model_summary(model, sample_input, rngs=None) -> str:
    """Tabular summary of parameters by module path (eval_shape — no FLOPs)."""
    rngs = rngs or {"params": jax.random.key(0)}
    variables = jax.eval_shape(lambda: model.init(rngs, sample_input, train=False))
    params = variables["params"]

    rows = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        rows.append((name, tuple(leaf.shape), int(np.prod(leaf.shape))))

    out = io.StringIO()
    total = sum(r[2] for r in rows)
    w = max(len(r[0]) for r in rows) + 2
    out.write(f"{'module/param':{w}} {'shape':24} {'count':>12}\n")
    out.write("-" * (w + 38) + "\n")
    for name, shape, n in rows:
        out.write(f"{name:{w}} {str(shape):24} {n:>12,}\n")
    out.write("-" * (w + 38) + "\n")
    out.write(f"{'total':{w}} {'':24} {total:>12,}\n")
    bstats = variables.get("batch_stats", {})
    if bstats:
        nb = count_params(bstats)
        out.write(f"{'batch_stats (non-trainable)':{w}} {'':24} {nb:>12,}\n")
    return out.getvalue()
