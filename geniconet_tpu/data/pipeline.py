"""Host input pipeline: shuffled batches, device placement, DP sharding.

Replaces the reference's torch DataLoader (run.py:52, worker processes) with
a TPU-idiomatic host loop: the packed dataset lives in host RAM, each batch is a
zero-copy numpy slice that gets `device_put` with a `NamedSharding` so each
chip receives only its shard of the batch; a one-deep prefetch overlaps the
host->HBM transfer of batch k+1 with the device compute of batch k.

Device-resident mode: when the packed dataset fits a budget (default 2 GiB —
all of ModelNet10 at I5 is ~2.4 GB fp32, each class split far under it), the
whole dataset is `device_put` ONCE and every batch becomes an on-device
gather driven by a tiny host index array. This removes the per-batch
host→HBM transfer from the hot loop entirely — on the tunneled single-chip
setup that transfer costs ~20x the step's compute. The reference eager-loads
into host RAM (data.py:79-80); the TPU-native analogue is eager-loading into
HBM. Disable with ``device_resident=False`` (or the auto budget) for
datasets that must stream.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Optional

import jax
import numpy as np

from geniconet_tpu.data.datasets import IcoDataset

__all__ = ["Batches", "pad_to_multiple"]

_RESIDENT_BUDGET = 2 * 1024**3  # bytes of (inputs + targets) kept in HBM


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class Batches:
    """Iterable over (inputs, targets) device batches.

    Args:
      dataset: packed IcoDataset.
      batch_size: *global* batch size.
      shuffle: reshuffle each epoch (train) or iterate in order (eval).
      drop_remainder: drop the ragged tail (train default False like torch
        DataLoader; the tail batch triggers one extra jit specialization that
        is then cached).
      sharding: optional NamedSharding for DP placement. When set, ragged
        train batches are truncated to a device-count multiple (zero-padding
        would pollute BatchNorm batch statistics) and ragged eval batches are
        zero-weight padded.
      seed: shuffle seed.
    """

    def __init__(
        self,
        dataset: IcoDataset,
        batch_size: int,
        shuffle: bool = True,
        drop_remainder: Optional[bool] = None,
        sharding=None,
        seed: int = 0,
        device_resident: Optional[bool] = None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sharding = sharding
        if sharding is not None and batch_size % self.n_devices != 0:
            raise ValueError(
                f"global batch_size {batch_size} must be divisible by the "
                f"{self.n_devices} devices of the data mesh (per-device batch "
                f"must be uniform); pick e.g. {pad_to_multiple(batch_size, self.n_devices)}"
            )
        if drop_remainder is None:
            # sharded training drops the ragged tail (zero-padding it would
            # pollute BatchNorm batch statistics); unsharded keeps it like a
            # torch DataLoader. Eval loaders pass drop_remainder=False and
            # get zero-weight padding (BN stats are frozen there).
            drop_remainder = shuffle and sharding is not None
        self.drop_remainder = drop_remainder
        self._rng = np.random.RandomState(seed)
        self._epoch = 0
        if device_resident is None:
            device_resident = (
                dataset.inputs.nbytes + dataset.targets.nbytes <= _RESIDENT_BUDGET
            )
        self.device_resident = device_resident
        self._dev = None  # lazy (dev_inputs, dev_targets, gather_fn)

    def _device_tables(self):
        """One-time HBM placement of the packed dataset + the jitted gather."""
        if self._dev is None:
            if self.sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(self.sharding.mesh, PartitionSpec())
                di = jax.device_put(self.ds.inputs, rep)
                dt = jax.device_put(self.ds.targets, rep)
                out_s = self.sharding
                gather = jax.jit(
                    lambda a, b, idx: (a[idx], b[idx]),
                    out_shardings=(out_s, out_s),
                )
            else:
                di = jax.device_put(self.ds.inputs)
                dt = jax.device_put(self.ds.targets)
                gather = jax.jit(lambda a, b, idx: (a[idx], b[idx]))
            self._dev = (di, dt, gather)
        return self._dev

    def __len__(self):
        n = len(self.ds)
        if self.drop_remainder and n >= self.batch_size:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def n_devices(self) -> int:
        if self.sharding is None:
            return 1
        return self.sharding.mesh.devices.size

    def _place(self, arr: np.ndarray):
        if self.sharding is None:
            return jax.device_put(arr)
        return jax.device_put(arr, self.sharding)

    def epoch_indices(self) -> Iterator[tuple]:
        """Yield (idx, wt) HOST arrays for one epoch.

        The fused-dispatch path: a trainer that holds the device tables
        (``device_tables()``) gathers ``inputs[idx]`` INSIDE its jitted step,
        so one batch = one dispatch (the 3-dispatch gather/put/step chain
        costs ~2 ms/step of host latency on the tunneled backend).
        """
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        nb = len(self)
        for i in range(nb):
            idx = order[i * bs : (i + 1) * bs]
            if len(idx) < bs and self.sharding is not None:
                if self.shuffle:
                    # training: truncate the ragged batch to a device-count
                    # multiple — zero-padding would pollute the BatchNorm
                    # batch statistics (loss weights cannot mask BN moments)
                    keep = (len(idx) // self.n_devices) * self.n_devices
                    if keep == 0:
                        raise ValueError(
                            f"dataset slice of {len(idx)} samples cannot feed "
                            f"{self.n_devices} devices; add data or shrink the mesh"
                        )
                    idx = idx[:keep]
            wt = np.ones(len(idx), np.float32)
            if len(idx) < bs and self.sharding is not None and not self.shuffle:
                # eval: zero-weight padding is safe (BN stats frozen)
                target = pad_to_multiple(len(idx), self.n_devices)
                pad = target - len(idx)
                if pad:
                    # padded rows repeat sample 0; wt=0 masks them in the loss
                    idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
                    wt = np.concatenate([wt, np.zeros(pad, np.float32)])
            yield idx, wt

    def epoch_order(self):
        """One epoch's batch plan as dense arrays: (order (nb, bs) int32,
        wts (nb, bs) f32, tail) — the device-resident scan path ships the
        whole plan to the device in ONE transfer and runs the epoch as a
        single dispatch (`Trainer._train_epoch_scan`). `tail` is the ragged
        final (idx, wt) pair when the dataset is not a batch multiple (run
        via the per-step path), else None. Consumes the SAME shuffle stream
        as `epoch_indices`, so the two paths see identical batch orders.

        Sharded loaders may only take this path when every batch is full
        (train loaders with drop_remainder, dataset >= one batch): the dense
        plan does not replicate `epoch_indices`' device-count
        truncation/padding of ragged batches (advisor round-3 — callers are
        guarded here, not just in the Trainer)."""
        if self.sharding is not None and not (
            self.drop_remainder and len(self.ds) >= self.batch_size
        ):
            raise ValueError(
                "epoch_order() does not implement the sharded ragged-batch "
                "truncation/padding invariants; use epoch_indices() "
                "(sharded scans require drop_remainder and a dataset of at "
                "least one full batch)"
            )
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        nb_full = n // bs
        full = order[: nb_full * bs].reshape(nb_full, bs).astype(np.int32)
        wts = np.ones((nb_full, bs), np.float32)
        tail = None
        rest = order[nb_full * bs :]
        if len(rest) and len(self) > nb_full:
            tail = (rest.astype(np.int32), np.ones(len(rest), np.float32))
        return full, wts, tail

    def device_tables(self):
        """(dev_inputs, dev_targets) for in-jit gathering (device-resident)."""
        di, dt, _ = self._device_tables()
        return di, dt

    def epoch(self) -> Iterator[tuple]:
        """Yield (inputs, targets, weights) for one epoch.

        weights is (B,) float32 — 1.0 for real samples, 0.0 for padding
        (padding only appears in the tail batch under sharding).
        """

        def make(pair):
            idx, wt = pair
            if self.device_resident:
                di, dt, gather = self._device_tables()
                x, y = gather(di, dt, idx)  # on-device gather; only idx moves
                return x, y, self._place(wt)
            x = self.ds.inputs[idx]
            y = self.ds.targets[idx]
            return self._place(x), self._place(y), self._place(wt)

        # one-deep prefetch
        it = self.epoch_indices()
        nxt = next(it, None)
        while nxt is not None:
            cur = make(nxt)
            nxt = next(it, None)
            yield cur
