"""Torch-free importer for the reference's PyTorch ``.pt`` checkpoints.

The reference ships trained models as ``torch.save({'model_state_dict': ...,
'optimizer_state_dict': ..., 'epoch': N, 'loss': v, 'misc': ...})`` archives
(reference run.py:330-340, torch 1.7 → the zip serialization format), e.g.
``log/ae/savedModel/ico2ico_EB696.pt`` and
``log/vae/savedModel/ico2ico_vae_EB579.pt`` (LFS blobs in this environment,
so only synthetic round-trip fixtures are testable here — see
tests/test_pt_import.py).

This module reads those archives WITHOUT torch:

- ``read_pt(path)``: a restricted unpickler over the zip payload. Only the
  handful of globals a torch checkpoint legitimately needs are resolved
  (``collections.OrderedDict``, ``torch._utils._rebuild_tensor_v2`` /
  ``_rebuild_parameter``, the ``torch.*Storage`` dtype markers); anything
  else raises — a ``.pt`` file is an arbitrary-code pickle and this reader
  treats it as untrusted input. Tensor storages are decoded straight out of
  the zip's ``data/<key>`` entries into numpy (strided views copied to
  contiguous arrays).
- ``import_state_dict(sd, model_name)``: maps the reference's parameter
  names (reference models.py:101-232 — ``encoder.N``/``decoder.N``
  Sequential indices, block-internal ``conv00/icobn00/...``,
  ``mu.0``/``logvar.0``, ``enc2icoConv.0``/``final_layer.0``) onto this
  framework's flax tree (nn/models.py: ``encoder/conv_in``,
  ``encoder/down{k}/conv00``, ``decoder/up{k}``, ``mu_conv``,
  ``decoder/head``...), converting each leaf:

  * Ico conv weights -> the (7, Cin, Cout) ``taps`` parameter. The
    icocnn weight layout is shape-sniffed: an OIHW ``(O, I, 3, 3)`` masked
    kernel goes through ``ops.conv.kernel_to_taps`` (corner taps must be
    zero and are dropped); an ``(O, I, 7)``-class layout is transposed to
    ``(7, I, O)`` with a configurable ``tap_order`` permutation (identity =
    this repo's row-major stencil order, ops/conv.py HEX_TAP_OFFSETS).
  * ``BatchNorm2d``: ``weight``/``bias`` -> ``scale``/``bias`` params,
    ``running_mean``/``running_var`` -> batch_stats ``mean``/``var``
    (``num_batches_tracked`` is dropped — flax BN keeps no step counter).
  * The 1x1 head ``Conv2d``: OIHW ``(3, 64, 1, 1)`` -> dense ``kernel``
    ``(64, 3)``.

  Filtering follows the reference's own ``loadModel`` semantics
  (run.py:357-367): only keys that map onto the target tree are consumed;
  unknown keys (e.g. the conv modules' registered index buffers) are
  reported, not fatal.
"""

from __future__ import annotations

import collections
import io
import pickle
import zipfile
from typing import Any

import numpy as np

from geniconet_tpu.ops.conv import kernel_to_taps

__all__ = ["read_pt", "import_state_dict", "load_reference_checkpoint"]


# ---------------------------------------------------------------------------
# restricted .pt (zip + pickle) reader
# ---------------------------------------------------------------------------

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}


def _bfloat16_dtype():
    import ml_dtypes  # jax dependency, always present here

    return np.dtype(ml_dtypes.bfloat16)


class _StorageType:
    """Marker for ``torch.XStorage`` globals inside the pickle."""

    def __init__(self, name: str):
        self.name = name

    @property
    def dtype(self) -> np.dtype:
        if self.name == "BFloat16Storage":
            return _bfloat16_dtype()
        try:
            return _STORAGE_DTYPES[self.name]
        except KeyError:
            raise ValueError(f"unsupported torch storage type {self.name}")


class _RestrictedUnpickler(pickle.Unpickler):
    """Unpickler that resolves only what a torch checkpoint payload needs."""

    def __init__(self, file, zf: zipfile.ZipFile, root: str):
        super().__init__(file)
        self._zf = zf
        self._root = root
        self._storage_cache: dict[str, np.ndarray] = {}

    # ---- globals ----
    def find_class(self, module: str, name: str):
        if (module, name) == ("collections", "OrderedDict"):
            return collections.OrderedDict
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2",
            "_rebuild_parameter",
        ):
            return (self._rebuild_tensor if name == "_rebuild_tensor_v2"
                    else self._rebuild_parameter)
        if module in ("torch", "torch.storage") and name.endswith("Storage"):
            return _StorageType(name)
        if (module, name) == ("torch", "Size"):
            return tuple
        if (module, name) == ("torch.serialization", "_get_layout"):
            return lambda *a, **k: None
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name} — not part of a "
            f"plain state-dict checkpoint"
        )

    # ---- storages ----
    def persistent_load(self, pid: Any) -> np.ndarray:
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        _, stype, key, _location, numel = pid
        if key not in self._storage_cache:
            raw = self._zf.read(f"{self._root}/data/{key}")
            arr = np.frombuffer(raw, dtype=stype.dtype)
            if arr.size < numel:
                raise pickle.UnpicklingError(
                    f"storage {key}: {arr.size} elements on disk, "
                    f"{numel} expected")
            self._storage_cache[key] = arr
        return self._storage_cache[key]

    # ---- tensor reconstruction ----
    @staticmethod
    def _rebuild_tensor(storage: np.ndarray, offset: int, size, stride,
                        *_unused) -> np.ndarray:
        size = tuple(int(s) for s in size)
        stride = tuple(int(s) for s in stride)
        offset = int(offset)
        # bounds-check the view against the backing storage BEFORE
        # as_strided: size/stride/offset come straight from the pickle and
        # are otherwise unvalidated — a malformed file must raise, not
        # read out-of-bounds process memory (untrusted-input contract)
        if offset < 0 or any(s < 0 for s in size) or any(
                st < 0 for st in stride):
            raise pickle.UnpicklingError(
                f"tensor view with negative offset/size/stride "
                f"({offset}, {size}, {stride})")
        if not size:
            if offset >= storage.size:
                raise pickle.UnpicklingError(
                    f"scalar tensor offset {offset} beyond storage "
                    f"({storage.size} elements)")
            return storage[offset:offset + 1].copy().reshape(())
        last = offset
        if all(size):
            last = offset + sum((s - 1) * st for s, st in zip(size, stride))
        if last >= storage.size and all(size):
            raise pickle.UnpicklingError(
                f"tensor view (offset {offset}, size {size}, stride "
                f"{stride}) reaches element {last} of a "
                f"{storage.size}-element storage")
        view = np.lib.stride_tricks.as_strided(
            storage[offset:],
            shape=size,
            strides=tuple(s * storage.itemsize for s in stride),
        )
        return np.ascontiguousarray(view)

    @staticmethod
    def _rebuild_parameter(data: np.ndarray, _requires_grad=None,
                           _hooks=None) -> np.ndarray:
        return data


def read_pt(path: str) -> dict:
    """Read a torch-saved checkpoint dict into plain python + numpy.

    Returns the reference's top-level dict: ``model_state_dict`` (flat
    ``{torch_key: np.ndarray}``), ``epoch``, ``loss``, ``misc``,
    ``optimizer_state_dict`` (tensors also as numpy).
    """
    with zipfile.ZipFile(path) as zf:
        pkls = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkls:
            raise ValueError(
                f"{path}: no data.pkl — not a torch>=1.6 zip checkpoint "
                f"(the reference used torch 1.7, reference Dockerfile:41)")
        root = pkls[0][: -len("/data.pkl")]
        with zf.open(pkls[0]) as f:
            data = f.read()
        up = _RestrictedUnpickler(io.BytesIO(data), zf, root)
        return up.load()


# ---------------------------------------------------------------------------
# reference key -> flax tree mapping
# ---------------------------------------------------------------------------

# block-internal names are shared by Down and Up blocks
# (reference models.py:22-63 -> nn/models.py DownBlock/UpBlock)
_BLOCK_LEAVES = {
    "conv00": ("conv00", "conv"),
    "conv01": ("conv01", "conv"),
    "conv10": ("conv10", "conv"),
    "icobn00": ("bn00", "bn"),
    "icobn01": ("bn01", "bn"),
    "icobn10": ("bn10", "bn"),
}


def _model_map(model_name: str) -> dict:
    """torch Sequential prefix -> (flax path tuple, kind).

    kind: 'conv' (ico conv -> taps/bias), 'bn' (BatchNorm2d),
    'head' (1x1 Conv2d -> dense kernel), 'block' (expand _BLOCK_LEAVES).
    """
    if model_name in ("ico2ico", "ico2enc", "enc2ico"):
        m = {
            "encoder.0": (("encoder", "conv_in"), "conv"),
            "encoder.1": (("encoder", "bn_in"), "bn"),
            "encoder.3": (("encoder", "down0"), "block"),
            "encoder.4": (("encoder", "down1"), "block"),
            "encoder.5": (("encoder", "down2"), "block"),
            "decoder.0": (("decoder", "up0"), "block"),
            "decoder.1": (("decoder", "up1"), "block"),
            "decoder.2": (("decoder", "up2"), "block"),
            "enc2icoConv.0": (("decoder", "head"), "head"),
        }
        return m
    if model_name in ("ico2ico_vae", "ico2enc_vae", "enc2ico_vae"):
        return {
            "encoder.0": (("encoder", "conv_in"), "conv"),
            "encoder.1": (("encoder", "bn_in"), "bn"),
            "encoder.3": (("encoder", "down0"), "block"),
            "encoder.4": (("encoder", "down1"), "block"),
            "mu.0": (("mu_conv",), "conv"),
            "mu.1": (("mu_bn",), "bn"),
            "logvar.0": (("logvar_conv",), "conv"),
            "logvar.1": (("logvar_bn",), "bn"),
            "decoder.0": (("decoder", "up0"), "block"),
            "decoder.1": (("decoder", "up1"), "block"),
            "decoder.2": (("decoder", "up2"), "block"),
            "final_layer.0": (("decoder", "head"), "head"),
        }
    raise ValueError(f"no reference key map for model {model_name!r}")


def _weight_to_taps(w: np.ndarray, tap_order) -> np.ndarray:
    """Shape-sniff an ico-conv weight into the (7, Cin, Cout) taps param."""
    w = np.asarray(w)
    if w.ndim == 4 and w.shape[2:] == (3, 3):
        # OIHW masked 3x3 kernel: corners must carry no weight
        corners = np.abs(w[:, :, [0, 2], [0, 2]]).max() if w.size else 0.0
        if corners > 1e-6 * max(np.abs(w).max(), 1.0):
            raise ValueError(
                "3x3 ico-conv weight has non-zero corner taps — not a "
                "hexagonal stencil")
        taps = kernel_to_taps(np.transpose(w, (2, 3, 1, 0)))  # -> HWIO
    elif w.ndim == 4 and 7 in w.shape[2:] and 1 in w.shape[2:]:
        taps = np.transpose(w.reshape(w.shape[0], w.shape[1], 7), (2, 1, 0))
    elif w.ndim == 3 and w.shape[2] == 7:
        taps = np.transpose(w, (2, 1, 0))  # (O, I, 7) -> (7, I, O)
    else:
        raise ValueError(f"unrecognized ico-conv weight shape {w.shape}")
    if tap_order is not None:
        taps = taps[np.asarray(tap_order)]
    return np.ascontiguousarray(taps.astype(np.float32))


def _set(tree: dict, path: tuple, value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_state_dict(sd: dict, model_name: str = "ico2ico",
                      tap_order=None) -> tuple[dict, dict, list]:
    """Map a reference state dict onto (params, batch_stats) numpy trees.

    ``tap_order``: optional permutation applied to 7-tap weights whose
    stencil order differs from ops/conv.py HEX_TAP_OFFSETS (identity by
    default; the real icocnn order can be set here the day real reference
    weights are available to validate against).

    Returns ``(params, batch_stats, skipped_keys)`` — skipped keys are
    buffers / unknown entries, mirroring the reference's filtered load
    (run.py:364: "Selected %d dict keys out of %d keys").
    """
    prefix_map = _model_map(model_name)
    # expand blocks into per-leaf-module entries
    modmap: dict[str, tuple[tuple, str]] = {}
    for pref, (path, kind) in prefix_map.items():
        if kind == "block":
            for tname, (fname, k) in _BLOCK_LEAVES.items():
                modmap[f"{pref}.{tname}"] = (path + (fname,), k)
        else:
            modmap[pref] = (path, kind)

    # group state-dict keys by their owning torch module prefix
    by_mod: dict[str, dict[str, np.ndarray]] = {}
    skipped = []
    for key, val in sd.items():
        mod, _, leaf = key.rpartition(".")
        if mod in modmap:
            by_mod.setdefault(mod, {})[leaf] = np.asarray(val)
        else:
            skipped.append(key)

    params: dict = {}
    stats: dict = {}
    for mod, leaves in by_mod.items():
        path, kind = modmap[mod]
        if kind == "conv":
            _set(params, path + ("taps",),
                 _weight_to_taps(leaves["weight"], tap_order))
            if "bias" in leaves:
                _set(params, path + ("bias",),
                     leaves["bias"].astype(np.float32))
            # registered buffers (icocnn pad/index tables) are not params
            skipped.extend(f"{mod}.{x}" for x in leaves
                           if x not in ("weight", "bias"))
        elif kind == "bn":
            bnp = path + ("BatchNorm_0",)
            _set(params, bnp + ("scale",), leaves["weight"].astype(np.float32))
            _set(params, bnp + ("bias",), leaves["bias"].astype(np.float32))
            _set(stats, bnp + ("mean",),
                 leaves["running_mean"].astype(np.float32))
            _set(stats, bnp + ("var",),
                 leaves["running_var"].astype(np.float32))
            for extra in leaves:
                if extra not in ("weight", "bias", "running_mean",
                                 "running_var"):
                    skipped.append(f"{mod}.{extra}")
        elif kind == "head":
            w = leaves["weight"]  # OIHW (3, 64, 1, 1)
            if w.ndim != 4 or w.shape[2:] != (1, 1):
                raise ValueError(f"head conv weight shape {w.shape}")
            _set(params, path + ("kernel",),
                 np.ascontiguousarray(w[:, :, 0, 0].T.astype(np.float32)))
            _set(params, path + ("bias",), leaves["bias"].astype(np.float32))
            skipped.extend(f"{mod}.{x}" for x in leaves
                           if x not in ("weight", "bias"))
        else:  # pragma: no cover
            raise AssertionError(kind)
    return params, stats, skipped


def load_reference_checkpoint(path: str, model_name: str = "ico2ico",
                              tap_order=None) -> dict:
    """One-call import: ``.pt`` file -> this framework's checkpoint dict
    (same layout as train/checkpoint.py save_checkpoint: params,
    batch_stats, epoch, loss, misc)."""
    ckpt = read_pt(path)
    sd = ckpt.get("model_state_dict", ckpt)
    params, stats, skipped = import_state_dict(sd, model_name, tap_order)
    n_total = len(sd)
    n_mapped = n_total - len(skipped)
    print(f"[pt_import] mapped {n_mapped}/{n_total} reference "
          f"keys onto the {model_name} tree"
          + (f"; skipped buffers/unknown: {sorted(skipped)[:6]}..."
             if skipped else ""))
    # fail fast instead of returning a near-empty tree: a checkpoint whose
    # keys carry an unexpected prefix (e.g. torch DataParallel's
    # 'module.encoder.0...') maps nothing and would otherwise surface much
    # later as a shape error in whatever consumes the import
    if not params or n_mapped == 0:
        sample = sorted(sd)[:4]
        raise ValueError(
            f"no reference parameters mapped from {path!r} (model "
            f"{model_name}); first keys: {sample} — if they carry a "
            "prefix (e.g. 'module.'), strip it before importing")
    return {
        "params": params,
        "batch_stats": stats,
        "epoch": int(ckpt.get("epoch", 0)),
        "loss": float(ckpt["loss"]) if "loss" in ckpt else None,
        "misc": ckpt.get("misc"),
        "skipped_keys": skipped,
    }
