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
