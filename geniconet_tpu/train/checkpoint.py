"""Checkpointing: save/restore with best-model naming, GC and partial loads.

Behavioral contract of reference run.py:317-409:

* files carry ``{params, batch_stats, opt_state, step, epoch, loss, misc}``
  (torch kept ``{model_state_dict, optimizer_state_dict, epoch, loss, misc}``;
  ``step`` replaces torch scheduler state — the cyclic LR is a pure function
  of it, and ``misc`` carries the last batch's (mu, logvar) for VAE sampling,
  run.py:274-277).
* best checkpoints are named ``<model>_EB<epoch>.ckpt`` and only the last
  5 (+1 protected oldest) are kept (run.py:317-328).
* periodic checkpoints are ``<model>_E<epoch>.ckpt``.
* ``load_epoch=0`` auto-picks the newest ``EB*`` checkpoint (run.py:343-349).
* `restore_filtered` loads the intersection of stored and target trees —
  the capability behind the reference's split-model loading (run.py:360-367).

Serialization is flax msgpack — framework-native, no torch dependency.
"""

from __future__ import annotations

import os
import re

import flax.serialization
import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "latest_best_epoch",
    "latest_checkpoint",
    "available_epochs",
    "checkpoint_path",
    "gc_best_checkpoints",
    "restore_filtered",
    "merge_checkpoints",
]

def _best_epochs(ckpt_dir: str, model_name: str) -> list:
    """Epoch numbers of this model's EB checkpoints. The filename is matched
    exactly (``<model>_EB<n>.ckpt``) so e.g. model 'ico2ico' never picks up
    'ico2ico_vae_EB3.ckpt' when two models share a ckpt_dir."""
    pat = re.compile(re.escape(model_name) + r"_EB(\d+)\.ckpt")
    out = []
    for f in os.listdir(ckpt_dir):
        m = pat.fullmatch(f)
        if m:
            out.append(int(m.group(1)))
    return out


def checkpoint_path(ckpt_dir: str, model_name: str, epoch: int, best: bool) -> str:
    tag = "EB" if best else "E"
    return os.path.join(ckpt_dir, f"{model_name}_{tag}{epoch}.ckpt")


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _backend() -> str:
    """'msgpack' (default, single-file) or 'orbax' (directory-per-checkpoint
    via orbax.checkpoint — the async/multi-host-capable backend). Selected
    with GENICONET_CKPT_BACKEND; loading auto-detects either format, so
    runs can switch backends mid-experiment."""
    return os.environ.get("GENICONET_CKPT_BACKEND", "msgpack")


def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    global _OCP
    if "_OCP" not in globals():
        _OCP = ocp.StandardCheckpointer()
    return _OCP


def save_checkpoint(path: str, state: dict):
    """state: dict with params/batch_stats/opt_state/step/epoch/loss/misc."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # to_state_dict turns tuple pytrees (optax states) into nested dicts
    tree = flax.serialization.to_state_dict(_to_host(state))
    if _backend() == "orbax":
        # orbax writes a DIRECTORY at `path`; scalars ride as 0-d arrays
        tree = jax.tree.map(np.asarray, tree)
        cp = _orbax_checkpointer()
        cp.save(os.path.abspath(path), tree, force=True)
        cp.wait_until_finished()
        return
    blob = flax.serialization.msgpack_serialize(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    if os.path.isdir(path):  # orbax checkpoint directory
        return _orbax_checkpointer().restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def latest_best_epoch(ckpt_dir: str, model_name: str):
    """Newest EB epoch number or None (reference run.py:343-349 semantics)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = _best_epochs(ckpt_dir, model_name)
    return max(best) if best else None


def available_epochs(ckpt_dir: str, model_name: str) -> dict:
    """All restorable epochs: {'best': [...], 'periodic': [...]} sorted
    ascending — backs the app's checkpoint-epoch dropdown (reference
    `update_epoch_list`, app.py:54-96)."""
    if not os.path.isdir(ckpt_dir):
        return {"best": [], "periodic": []}
    pat = re.compile(re.escape(model_name) + r"_(EB?)(\d+)\.ckpt")
    out = {"best": [], "periodic": []}
    for f in os.listdir(ckpt_dir):
        m = pat.fullmatch(f)
        if m:
            out["best" if m.group(1) == "EB" else "periodic"].append(
                int(m.group(2)))
    out["best"].sort()
    out["periodic"].sort()
    return out


def latest_checkpoint(ckpt_dir: str, model_name: str):
    """Path of the newest checkpoint of ANY kind (EB best or E periodic),
    preferring the higher epoch — the crash-recovery resume point."""
    if not os.path.isdir(ckpt_dir):
        return None
    pat = re.compile(re.escape(model_name) + r"_(EB?)(\d+)\.ckpt")
    cands = []
    for f in os.listdir(ckpt_dir):
        m = pat.fullmatch(f)
        if m:
            # at equal epoch prefer the periodic save (strictly newer state:
            # the EB was written before the epoch's final periodic save)
            cands.append((int(m.group(2)), m.group(1) == "E", f))
    if not cands:
        return None
    return os.path.join(ckpt_dir, max(cands)[2])


def gc_best_checkpoints(ckpt_dir: str, model_name: str, keep: int = 6):
    """Keep the newest `keep` EB checkpoints. Called after saving a new best,
    this matches the reference exactly (run.py:317-328: delete all but the
    newest 5 existing EB files, then save the new one — i.e. 6 newest)."""
    if not os.path.isdir(ckpt_dir):
        return
    epochs = sorted(_best_epochs(ckpt_dir, model_name))
    for e in epochs[:-keep]:
        p = checkpoint_path(ckpt_dir, model_name, e, best=True)
        try:
            if os.path.isdir(p):  # orbax directory checkpoint
                import shutil

                shutil.rmtree(p)
            else:
                os.remove(p)
        except OSError:
            pass


def restore_filtered(target_tree, stored_tree):
    """Copy stored leaves into target where paths+shapes match; count hits.

    Returns (merged_tree, n_matched, n_target_leaves). Mirrors the
    reference's filtered state-dict load (run.py:360-367) which enables
    loading encoder/decoder halves from a full-model checkpoint.
    """
    matched = 0

    def merge(path, tgt):
        nonlocal matched
        node = stored_tree
        for k in path:
            key = getattr(k, "key", getattr(k, "idx", None))
            if isinstance(node, dict) and str(key) in node:
                node = node[str(key)]
            elif isinstance(node, dict) and key in node:
                node = node[key]
            else:
                return tgt
        if hasattr(node, "shape") and tuple(node.shape) == tuple(tgt.shape):
            matched += 1
            return np.asarray(node).astype(tgt.dtype) if hasattr(tgt, "dtype") else node
        return tgt

    merged = jax.tree_util.tree_map_with_path(merge, target_tree)
    n_leaves = len(jax.tree.leaves(target_tree))
    return merged, matched, n_leaves


def merge_checkpoints(target_tree, paths):
    """Merge the param trees of several checkpoints into one target
    (reference `loadMultiModel`, run.py:383-409: e.g. an encoder-half and a
    decoder-half checkpoint restored into one full model). Later paths win
    on overlapping keys; returns (merged, total_matched, n_target_leaves).
    """
    merged = target_tree
    total = 0
    n_leaves = len(jax.tree.leaves(target_tree))
    for p in paths:
        blob = load_checkpoint(p)
        merged, matched, _ = restore_filtered(merged, blob.get("params", blob))
        total += matched
    return merged, total, n_leaves
