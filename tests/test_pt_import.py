"""Reference .pt checkpoint importer round-trip (VERDICT r4 #4).

The real reference checkpoints (log/ae/savedModel/ico2ico_EB696.pt,
log/vae/savedModel/ico2ico_vae_EB579.pt) are LFS pointers in this
environment, so the importer is validated the way the verdict prescribed:
write a SYNTHETIC reference-shaped state dict with real torch.save (torch
cpu is available in this image; the reference used torch 1.7 whose zip
format torch 2.x still writes), read it back torch-free, map it onto the
flax tree, run the model, and check the first conv against a masked-3x3
numpy oracle built from the original torch OIHW weight.
"""

import collections
import io
import os
import pickle
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from geniconet_tpu.geometry import ico
from geniconet_tpu.nn.models import IcoAE, IcoVAE
from geniconet_tpu.ops.conv import ico_conv_s2s, split_charts
from geniconet_tpu.ops.pad import ico_pad
from geniconet_tpu.train.pt_import import (
    import_state_dict,
    load_reference_checkpoint,
    read_pt,
)

RNG = np.random.RandomState(7)


def _masked33(cout, cin):
    w = (RNG.standard_normal((cout, cin, 3, 3)) * 0.05).astype(np.float32)
    w[:, :, 0, 0] = 0.0  # hex stencil: no (-1,-1) / (+1,+1) corners
    w[:, :, 2, 2] = 0.0
    return w


def _conv(prefix, cin, cout, sd):
    sd[f"{prefix}.weight"] = torch.from_numpy(_masked33(cout, cin))
    sd[f"{prefix}.bias"] = torch.from_numpy(
        (RNG.standard_normal(cout) * 0.05).astype(np.float32))


def _bn(prefix, c, sd):
    sd[f"{prefix}.weight"] = torch.from_numpy(
        (1.0 + 0.1 * RNG.standard_normal(c)).astype(np.float32))
    sd[f"{prefix}.bias"] = torch.from_numpy(
        (0.1 * RNG.standard_normal(c)).astype(np.float32))
    sd[f"{prefix}.running_mean"] = torch.from_numpy(
        (0.1 * RNG.standard_normal(c)).astype(np.float32))
    sd[f"{prefix}.running_var"] = torch.from_numpy(
        (1.0 + 0.1 * RNG.standard_normal(c)).astype(np.float32) ** 2)
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(123)


def _block(prefix, cin, cout, sd):
    # reference BasicIcoS2SDown/UpBlock internals (models.py:22-63)
    _conv(f"{prefix}.conv00", cin, cout, sd)
    _bn(f"{prefix}.icobn00", cout, sd)
    _conv(f"{prefix}.conv01", cout, cout, sd)
    _bn(f"{prefix}.icobn01", cout, sd)
    _conv(f"{prefix}.conv10", cin, cout, sd)
    _bn(f"{prefix}.icobn10", cout, sd)


def _ae_state_dict():
    sd = collections.OrderedDict()
    _conv("encoder.0", 3, 64, sd)
    _bn("encoder.1", 64, sd)
    _block("encoder.3", 64, 128, sd)
    _block("encoder.4", 128, 256, sd)
    _block("encoder.5", 256, 256, sd)
    _block("decoder.0", 256, 256, sd)
    _block("decoder.1", 256, 128, sd)
    _block("decoder.2", 128, 64, sd)
    sd["enc2icoConv.0.weight"] = torch.from_numpy(
        (RNG.standard_normal((3, 64, 1, 1)) * 0.05).astype(np.float32))
    sd["enc2icoConv.0.bias"] = torch.from_numpy(
        (RNG.standard_normal(3) * 0.05).astype(np.float32))
    # a conv-module index buffer like icocnn registers — must be skipped
    sd["encoder.0.pad_index"] = torch.arange(10, dtype=torch.int64)
    return sd


def _vae_state_dict():
    sd = collections.OrderedDict()
    _conv("encoder.0", 3, 64, sd)
    _bn("encoder.1", 64, sd)
    _block("encoder.3", 64, 128, sd)
    _block("encoder.4", 128, 256, sd)
    _conv("mu.0", 256, 512, sd)
    _bn("mu.1", 512, sd)
    _conv("logvar.0", 256, 512, sd)
    _bn("logvar.1", 512, sd)
    _block("decoder.0", 512, 256, sd)
    _block("decoder.1", 256, 128, sd)
    _block("decoder.2", 128, 64, sd)
    sd["final_layer.0.weight"] = torch.from_numpy(
        (RNG.standard_normal((3, 64, 1, 1)) * 0.05).astype(np.float32))
    sd["final_layer.0.bias"] = torch.from_numpy(
        (RNG.standard_normal(3) * 0.05).astype(np.float32))
    return sd


def _save(tmp_path, sd, name, misc=None):
    path = os.path.join(tmp_path, name)
    torch.save(
        {"model_state_dict": sd, "optimizer_state_dict": {},
         "epoch": 696, "loss": 0.01234, "misc": misc},
        path,
    )
    return path


def _paths_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def test_read_pt_roundtrip_values(tmp_path):
    sd = _ae_state_dict()
    path = _save(tmp_path, sd, "ico2ico_EB696.pt")
    ckpt = read_pt(path)
    assert ckpt["epoch"] == 696
    assert abs(ckpt["loss"] - 0.01234) < 1e-9
    got = ckpt["model_state_dict"]
    assert set(got) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(np.asarray(got[k]), v.numpy())


def test_read_pt_refuses_arbitrary_globals(tmp_path):
    """A .pt is an arbitrary-code pickle; the reader must only accept the
    state-dict vocabulary."""

    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    path = os.path.join(tmp_path, "evil.pt")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    open(path, "wb").write(buf.getvalue())
    with pytest.raises(pickle.UnpicklingError):
        read_pt(path)


def test_ae_import_matches_flax_tree_and_runs(tmp_path):
    s = 3  # param shapes are subdivision-independent; s=3 keeps CPU fast
    sd = _ae_state_dict()
    path = _save(tmp_path, sd, "ico2ico_EB696.pt")
    ckpt = load_reference_checkpoint(path, "ico2ico")
    assert ckpt["epoch"] == 696
    assert any(k.endswith("pad_index") for k in ckpt["skipped_keys"])
    assert any(k.endswith("num_batches_tracked")
               for k in ckpt["skipped_keys"])

    model = IcoAE(subdivisions=s)  # default widths = reference widths
    H, W = ico.grid_shape(s)
    x = jnp.asarray(RNG.randn(2, H, W, 3).astype(np.float32))
    ref = model.init({"params": jax.random.key(0)}, x, train=False)
    # exact structural match: same paths, same shapes, nothing missing
    assert _paths_shapes(jax.tree.map(np.asarray, dict(ref["params"]))) == \
        _paths_shapes(ckpt["params"])
    assert _paths_shapes(jax.tree.map(np.asarray, dict(ref["batch_stats"]))) \
        == _paths_shapes(ckpt["batch_stats"])

    out = model.apply(
        {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]},
        x, train=False)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # encode/decode round-trip on the imported weights
    z = model.apply(
        {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]},
        x, method="encode")
    y = model.apply(
        {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]},
        z, method="decode")
    assert y.shape == x.shape


def test_imported_conv_matches_numpy_torch_conv_oracle(tmp_path):
    """The verdict's oracle: a masked-3x3 conv computed in numpy straight
    from the torch OIHW weight must match `ico_conv_s2s` on the imported
    taps, fp32."""
    s = 3
    sd = _ae_state_dict()
    path = _save(tmp_path, sd, "ico2ico_EB696.pt")
    ckpt = load_reference_checkpoint(path, "ico2ico")
    taps = ckpt["params"]["encoder"]["conv_in"]["taps"]
    bias = ckpt["params"]["encoder"]["conv_in"]["bias"]

    H, W = ico.grid_shape(s)
    x = RNG.randn(2, H, W, 3).astype(np.float32)
    xs = split_charts(jnp.asarray(x), s)
    got = np.asarray(ico_conv_s2s(xs, jnp.asarray(taps), jnp.asarray(bias),
                                  s, stride=1))

    # numpy oracle: VALID 3x3 conv over the haloed tensor with the ORIGINAL
    # torch weight (OIHW), exactly what torch F.conv2d computes
    w33 = sd["encoder.0.weight"].numpy()  # (64, 3, 3, 3)
    padded = np.asarray(ico_pad(xs, s))  # (B, 5, h+2, w+2, 3)
    h, w = padded.shape[2] - 2, padded.shape[3] - 2
    pat = np.stack(
        [padded[:, :, di:di + h, dj:dj + w, :]
         for di in range(3) for dj in range(3)], axis=-2)  # (B,5,h,w,9,Cin)
    w9 = w33.transpose(2, 3, 1, 0).reshape(9, 3, 64)  # HWIO flattened
    oracle = np.einsum("bchwki,kio->bchwo", pat, w9) + sd[
        "encoder.0.bias"].numpy()
    np.testing.assert_allclose(got, oracle, rtol=2e-5, atol=2e-5)


def test_seven_tap_weight_layout(tmp_path):
    """(O, I, 1, 7) icocnn-style weights import to the same taps as the
    equivalent masked 3x3 kernel."""
    w33 = _masked33(8, 4)
    taps_expected, _, _ = import_state_dict(
        {"encoder.0.weight": w33,
         "encoder.0.bias": np.zeros(8, np.float32)}, "ico2ico")
    t = taps_expected["encoder"]["conv_in"]["taps"]
    w7 = np.ascontiguousarray(
        np.transpose(t, (2, 1, 0)).reshape(8, 4, 1, 7))
    taps7, _, _ = import_state_dict(
        {"encoder.0.weight": w7,
         "encoder.0.bias": np.zeros(8, np.float32)}, "ico2ico")
    np.testing.assert_array_equal(
        taps7["encoder"]["conv_in"]["taps"], t)


def test_nonzero_corner_rejected():
    w = np.ones((8, 4, 3, 3), np.float32)  # corners carry weight: not hex
    with pytest.raises(ValueError, match="corner"):
        import_state_dict(
            {"encoder.0.weight": w, "encoder.0.bias": np.zeros(8)},
            "ico2ico")


@pytest.mark.slow
def test_cli_load_pt_end_to_end(tmp_path):
    """--load_pt converts the .pt into <logDir>/savedModel and the test
    process consumes it through the normal EB resolution — the drop-in
    story for the reference's published weights."""
    from geniconet_tpu import cli

    sd = _ae_state_dict()
    path = _save(str(tmp_path), sd, "ico2ico_EB696.pt")
    logdir = str(tmp_path / "log")
    cli.main([
        "--model", "ico2ico", "--process", "test", "--synthetic", "6",
        "--subdivision", "3", "--batch_size", "8", "--logDir", logdir,
        "--load_pt", path,
    ])
    assert os.path.exists(
        os.path.join(logdir, "ae", "savedModel", "ico2ico_EB696.ckpt"))
    assert os.path.exists(
        os.path.join(logdir, "ae", "ico2ico_point2mesh.csv"))


def test_vae_import_matches_flax_tree_and_runs(tmp_path):
    s = 3
    sd = _vae_state_dict()
    misc = [{"trn_mean": torch.zeros(4), "trn_logvar": torch.zeros(4)}]
    path = _save(tmp_path, sd, "ico2ico_vae_EB579.pt", misc=misc)
    ckpt = load_reference_checkpoint(path, "ico2ico_vae")
    assert isinstance(ckpt["misc"], list)
    assert np.asarray(ckpt["misc"][0]["trn_mean"]).shape == (4,)

    model = IcoVAE(subdivisions=s)
    H, W = ico.grid_shape(s)
    x = jnp.asarray(RNG.randn(2, H, W, 3).astype(np.float32))
    ref = model.init(
        {"params": jax.random.key(0), "reparam": jax.random.key(1)}, x)
    assert _paths_shapes(jax.tree.map(np.asarray, dict(ref["params"]))) == \
        _paths_shapes(ckpt["params"])
    assert _paths_shapes(jax.tree.map(np.asarray, dict(ref["batch_stats"]))) \
        == _paths_shapes(ckpt["batch_stats"])

    mu, logvar = model.apply(
        {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]},
        x, method="encode")
    assert np.isfinite(np.asarray(mu)).all()
    y = model.apply(
        {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]},
        mu, method="decode")
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_rebuild_tensor_bounds_checked():
    """Round-5 review: size/stride/offset come straight from the pickle —
    a view that reaches past the storage must raise, never read
    out-of-bounds process memory (untrusted-input contract)."""
    import pickle

    from geniconet_tpu.train.pt_import import _RestrictedUnpickler

    storage = np.zeros(4, np.float32)
    rebuild = _RestrictedUnpickler._rebuild_tensor
    # in-bounds view is fine
    assert rebuild(storage, 0, (2, 2), (2, 1)).shape == (2, 2)
    with pytest.raises(pickle.UnpicklingError):
        rebuild(storage, 0, (100000,), (1,))
    with pytest.raises(pickle.UnpicklingError):
        rebuild(storage, 3, (2,), (1,))
    with pytest.raises(pickle.UnpicklingError):
        rebuild(storage, 0, (2,), (-1,))
    with pytest.raises(pickle.UnpicklingError):
        rebuild(storage, 10, (), ())


def test_unmapped_prefix_fails_fast(tmp_path):
    """A state dict whose keys carry an unexpected prefix (torch
    DataParallel's 'module.') maps nothing — the importer must raise with
    a hint, not return a near-empty tree."""
    from geniconet_tpu.train.pt_import import load_reference_checkpoint

    sd = {f"module.{k}": v for k, v in _ae_state_dict().items()}
    path = _save(str(tmp_path), sd, "ico2ico_prefixed.pt")
    with pytest.raises(ValueError, match="prefix"):
        load_reference_checkpoint(path, "ico2ico")


def test_cli_load_pt_shape_mismatch_fails_at_import(tmp_path):
    """--load_pt with a config whose widths disagree with the checkpoint
    must fail AT THE IMPORT with a clear message (from_state_dict alone
    validates structure only, not shapes)."""
    from geniconet_tpu import cli

    sd = _ae_state_dict()  # reference widths 64/128/256
    path = _save(str(tmp_path), sd, "ico2ico_EB696.pt")
    logdir = str(tmp_path / "log")
    with pytest.raises(ValueError, match="do not fit"):
        cli.main([
            "--model", "ico2ico", "--process", "test", "--synthetic", "6",
            "--subdivision", "3", "--batch_size", "8", "--logDir", logdir,
            "--widths", "8", "12", "16", "--load_pt", path,
        ])
