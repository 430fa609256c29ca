"""The CLI surface end-to-end (argparse -> train -> test -> encode)."""

import json
import os

import numpy as np
import pytest

from geniconet_tpu import cli


def test_cli_train_test_encode_roundtrip(tmp_path):
    log_dir = str(tmp_path / "log")
    base = [
        "--model", "ico2ico", "--subdivision", "3", "--batch_size", "8",
        "--synthetic", "12", "--logDir", log_dir, "--no_data_parallel",
        "--widths", "8", "12", "16",
    ]
    cli.main(base + ["--process", "train", "--train_epoch", "2"])
    assert os.path.exists(os.path.join(log_dir, "ae", "config.json"))
    assert os.path.exists(os.path.join(log_dir, "ae", "train_ico2ico_summary.txt"))
    ckpts = os.listdir(os.path.join(log_dir, "ae", "savedModel"))
    assert any("_EB" in f for f in ckpts)

    cli.main(base + ["--process", "test"])
    csv = os.path.join(log_dir, "ae", "ico2ico_point2mesh.csv")
    assert os.path.exists(csv)
    rows = open(csv).read().strip().splitlines()
    assert rows[0] == "Name,Distance" and len(rows) == 13

    cli.main(base + ["--process", "encode"])
    enc = os.path.join(log_dir, "ae", "data", "enc", "trn")
    assert len(os.listdir(enc)) == 12
    z = np.load(os.path.join(enc, "synth_0.npz"))["arr_0"]
    assert z.shape == (5, 2, 16)  # s=3 AE latent at --widths 8 12 16

    # decode process: enc-npz directory -> decoder -> meshes + distances
    # (reference createenc2icoDataset flow, data.py:121-148)
    cli.main(base + ["--process", "decode"])
    dec_csv = os.path.join(log_dir, "ae", "ico2ico_decode_point2mesh.csv")
    assert os.path.exists(dec_csv)
    dec_rows = open(dec_csv).read().strip().splitlines()
    assert dec_rows[0] == "Name,Distance" and len(dec_rows) == 13
    assert os.path.exists(os.path.join(log_dir, "ae", "data", "dec", "synth_0.off"))

    # decode(encode(x)) must reproduce the full-model reconstruction: the
    # file-roundtripped latent path and the direct forward give the same
    # per-mesh distances on the SAME dataset
    from geniconet_tpu.data.datasets import synthetic_dataset
    from geniconet_tpu.eval.test_driver import run_decode, run_test
    from geniconet_tpu.train.config import parse_args

    cfg = parse_args(base + ["--process", "decode"])
    cfg.test_mode = "point2point"
    ds = synthetic_dataset(3, 12, seed=0)
    pairs_full, _ = run_test(cfg, ds, write_meshes=False)
    pairs_dec, _ = run_decode(cfg, ds, write_meshes=False)
    d_full = dict(pairs_full)
    for name, d in pairs_dec:
        assert abs(d - d_full[name]) < 1e-5, (name, d, d_full[name])

    # resume path through the CLI
    cli.main(base + ["--process", "train", "--train_epoch", "3", "--load_epoch", "2"])

    # config snapshot is valid json with the right knobs
    cfgd = json.load(open(os.path.join(log_dir, "ae", "config.json")))
    assert cfgd["model"]["subdivisions"] == 3
    assert cfgd["train"]["batch_size"] == 8


def test_cli_rejects_bad_process(tmp_path):
    with pytest.raises(SystemExit):
        cli.main(["--model", "ico2ico", "--process", "bogus"])
    with pytest.raises(SystemExit):
        cli.main(["--model", "nope", "--process", "train"])
    # train without data source exits with a clear message
    with pytest.raises(SystemExit, match="dataDir"):
        cli.main(["--model", "ico2ico", "--process", "train",
                  "--logDir", str(tmp_path)])
