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

__all__ = ["model_summary", "model_graph_dot", "count_params"]


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


def model_graph_dot(model, sample_input, rngs=None) -> str:
    """Graphviz DOT drawing of the module hierarchy (the torchsummary
    ``draw_graph`` surface, reference run.py:427-430): one node per module,
    containment edges parent->child, dashed sequential edges between
    numbered sibling stages (down0->down1, up0->up1, ...), leaf nodes
    annotated with their parameter shapes/counts. Render with
    ``dot -Tpng model_graph.dot``."""
    rngs = rngs or {"params": jax.random.key(0)}
    variables = jax.eval_shape(lambda: model.init(rngs, sample_input, train=False))
    params = variables["params"]

    # module tree from param paths: every proper prefix is a module node;
    # the final component is the parameter leaf
    modules: dict = {}  # path tuple -> {param name: (shape, count)}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        mod, pname = keys[:-1] or ("(root)",), keys[-1]
        modules.setdefault(mod, {})[pname] = (tuple(leaf.shape), int(np.prod(leaf.shape)))
        for d in range(1, len(mod)):
            modules.setdefault(mod[:d], modules.get(mod[:d], {}))

    def nid(mod):
        return "n_" + "_".join(mod).replace("(", "").replace(")", "")

    out = io.StringIO()
    out.write("digraph model {\n  rankdir=TB;\n  node [shape=box, fontsize=10];\n")
    out.write(f'  root [label="{type(model).__name__}\\ninput {tuple(np.shape(sample_input))}"];\n')
    for mod in sorted(modules):
        ps = modules[mod]
        lines = [mod[-1]] + [f"{k} {list(s)} ({n:,})" for k, (s, n) in sorted(ps.items())]
        out.write(f'  {nid(mod)} [label="' + "\\n".join(lines) + '"];\n')
    for mod in sorted(modules):
        parent = "root" if len(mod) == 1 else nid(mod[:-1])
        out.write(f"  {parent} -> {nid(mod)};\n")
    # sequential flow between numbered sibling stages (down0 -> down1, ...)
    import re

    by_parent: dict = {}
    for mod in modules:
        by_parent.setdefault(mod[:-1], []).append(mod)
    for sibs in by_parent.values():
        staged = sorted(
            [m for m in sibs if re.search(r"\d+$", m[-1])],
            key=lambda m: (re.sub(r"\d+$", "", m[-1]), int(re.search(r"\d+$", m[-1]).group())),
        )
        for a, b in zip(staged, staged[1:]):
            if re.sub(r"\d+$", "", a[-1]) == re.sub(r"\d+$", "", b[-1]):
                out.write(f"  {nid(a)} -> {nid(b)} [style=dashed, color=gray];\n")
    out.write("}\n")
    return out.getvalue()
