"""Device mesh helpers for data / spatial parallelism.

The framework parallelizes with GSPMD: one jitted train step, inputs arriving
batch-sharded over the mesh's ``'data'`` axis, parameters replicated. XLA
inserts the gradient all-reduce over ICI automatically — the TPU-native
replacement for the DDP/NCCL layer the reference never had (SURVEY §2.5:
the reference is strictly single-device; DP is an added capability here).

BatchNorm statistics are *global-batch exact* under this scheme: the moment
reductions over the sharded batch axis become cross-replica collectives in
XLA, so an N-chip run matches a single-chip run at the same global batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicate", "shard_batch", "data_sharding", "replicated_sharding"]


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D 'data' mesh over the first n (default: all) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def make_mesh_2d(dp: int, sp: int, devices=None) -> Mesh:
    """2-D ('data', 'spatial') mesh: batch DP × spatial sharding of the grid
    W axis — the halo-exchange analogue of context parallelism for the
    subdivision-6/7 stretch configs (SURVEY §5: shard the chart axis past
    HBM-friendly I5; GSPMD inserts the border collectives)."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * sp, (dp, sp, devices)
    return Mesh(
        np.asarray(devices[: dp * sp]).reshape(dp, sp), axis_names=("data", "spatial")
    )


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) grids: batch over 'data', W over 'spatial'."""
    return NamedSharding(mesh, P("data", None, "spatial", None))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Optional[Mesh]):
    """Place every leaf replicated over the mesh (no-op without a mesh)."""
    if mesh is None:
        return tree
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_batch(tree, mesh: Optional[Mesh]):
    """Shard leading (batch) axis over the 'data' axis."""
    if mesh is None:
        return tree
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
