"""Typed configuration tree + CLI.

Replaces the reference's nested ``params`` dict assembled in ``run.py:616-716``
(and kills the anti-pattern where the app re-creates config by text-scraping
run.py, reference app.py:1517-1538): one importable, serializable dataclass
tree with per-model presets and an argparse front-end exposing the same knobs
as reference ``run.py:538-587``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional

__all__ = ["ModelConfig", "OptimConfig", "DataConfig", "TrainConfig", "Config", "parse_args"]


def _git_sha() -> str:
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            capture_output=True, text=True, timeout=5,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


@dataclass
class ModelConfig:
    name: str = "ico2ico"  # 'ico2ico' (AE) | 'ico2ico_vae' (VAE)
    subdivisions: int = 5
    widths: tuple = (64, 128, 256)
    latent_features: int = 512  # VAE only
    corner_mode: str = "average"
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    use_pallas: bool = False  # fused Pallas conv kernels for stride-1 convs

    @property
    def is_vae(self) -> bool:
        return self.name.endswith("_vae")


@dataclass
class OptimConfig:
    # reference run.py:632-671: Adam + per-batch CyclicLR(triangular)
    lr: float = 1e-6
    lr_base: float = 1e-9
    lr_max: float = 1e-3
    step_size_up: int = 2000  # torch CyclicLR defaults
    step_size_down: int = 2000
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


@dataclass
class DataConfig:
    data_dir: str = ""
    layout_level: int = 2  # 1 = flat (SHREC), 2 = class/{train,test} (ModelNet)
    ext: str = ".npz"
    synthetic: int = 0  # >0: use a synthetic dataset of this size (no files)
    synthetic_seed: int = 0
    # HBM-resident dataset mode: 'auto' (fits-budget heuristic), 'on', 'off'
    device_resident: str = "auto"

    def device_resident_flag(self):
        """Map the tri-state knob to Batches' device_resident argument."""
        return {"auto": None, "on": True, "off": False}[self.device_resident]


@dataclass
class TrainConfig:
    batch_size: int = 12
    train_epoch: int = 600
    save_epoch_freq: int = 100
    log_freq: int = 10
    log_mesh_epoch: int = 50
    quick_learn: int = 0
    seed: int = 0
    load_pretrained_model: bool = False
    load_epoch: int = 0
    # VAE loss factor schedule (reference run.py:651-654)
    factor_step_size: int = 25
    factor_gamma: float = 0.9
    debug_nans: bool = False
    data_parallel: bool = True  # shard batch over all local devices
    log_grad_freq: int = 1000   # per-layer grad-norm logging period (0 = off)
    # encoding-logging period (0 = off): AE logs the 'enc' bottleneck
    # histogram of a fixed 3-sample val subset; VAE logs mu/logvar/reparam
    # of the first val sample (reference run.py:167-215, 83-96)
    log_encoding_epoch: int = 0
    # True: histograms (reference VAE default, run.py:665); False: channel
    # images sampling one of six channel groups (reference run.py:203-211)
    log_encoding_hist: bool = True
    profile_dir: str = ""       # jax.profiler trace output (epoch 1 traced)
    debug_timing: bool = False  # print per-epoch step timing (--debug)
    # auto-resume from the newest checkpoint after a transient backend error
    # (INTERNAL/FAILED_PRECONDITION/...); 0 disables
    backend_retries: int = 2


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    log_dir: str = "log"
    process: str = "train"  # 'train' | 'test' | 'encode' | 'decode' | 'sample'
    test_epoch: str = "0"   # 0 = latest best, 'B<ep>' or int for specific
    test_mode: str = "point2mesh"  # 'point2mesh' | 'point2point' | 'none'
    data_instance: str = "val"  # dataset split for test/encode (reference --data_instance)
    write_output_mesh: bool = False  # test: dump reconstructed .off (reference flag)
    n_samples: int = 8      # sample process: meshes drawn from checkpoint misc
    out_dir: str = ""
    enc_dir: str = ""       # decode process: directory of latent .npz files
    # reference .pt checkpoint to convert into <logDir>/savedModel before the
    # process runs (torch-free importer, train/pt_import.py)
    load_pt: str = ""
    # optional per-term loss-factor overrides (None -> per-model defaults,
    # reference run.py:689-696)
    f_pos: Optional[float] = None
    f_nor: Optional[float] = None
    f_lap: Optional[float] = None
    f_kl: Optional[float] = None

    @property
    def loss_factors(self):
        from geniconet_tpu.losses.p2p import LossFactors

        # reference run.py:689-696
        base = LossFactors.vae() if self.model.is_vae else LossFactors.ae()
        if (self.f_pos, self.f_nor, self.f_lap, self.f_kl) == (None,) * 4:
            return base
        return LossFactors(
            pos=base.pos if self.f_pos is None else self.f_pos,
            nor=base.nor if self.f_nor is None else self.f_nor,
            lap=base.lap if self.f_lap is None else self.f_lap,
            kl=base.kl if self.f_kl is None else self.f_kl,
        )

    def model_log_dir(self) -> str:
        sub = "vae" if self.model.is_vae else "ae"
        return os.path.join(self.log_dir, sub)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["git_sha"] = _git_sha()  # reference records repo SHAs (run.py:715-716)
        return json.dumps(d, indent=2, default=str)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())


def apply_model_presets(cfg: Config):
    """Per-model hyperparameter blocks (reference run.py:632-671)."""
    if cfg.model.is_vae:
        cfg.train.save_epoch_freq = 50
        cfg.train.log_freq = 20
        cfg.train.log_mesh_epoch = 25
        cfg.train.log_encoding_epoch = 50
    else:
        cfg.train.save_epoch_freq = 100
        cfg.train.log_freq = 10
        cfg.train.log_mesh_epoch = 50
        # reference AE default: encoding logging off (run.py:643); the AE
        # 'enc' bottleneck capability (run.py:177-178) enables via
        # --log_encoding_epoch
        cfg.train.log_encoding_epoch = 0
    return cfg


def parse_args(argv=None) -> Config:
    """CLI mirroring reference run.py:538-587."""
    p = argparse.ArgumentParser(description="GenIcoNet-TPU experiment runner")
    p.add_argument("--model", choices=["ico2ico", "ico2ico_vae"], required=True)
    p.add_argument("--process",
                   choices=["train", "test", "encode", "decode", "sample"],
                   required=True)
    p.add_argument("--data_instance", choices=["trn", "val"], default="val",
                   help="dataset split for test/encode (reference run.py:546)")
    p.add_argument("--test_mode", choices=["point2mesh", "point2point", "none"],
                   default=None,
                   help="test metric; 'none' skips distances (reference run.py:565)")
    p.add_argument("--write_output_mesh", action="store_true",
                   help="test: write reconstructed .off meshes (reference run.py:567)")
    p.add_argument("--corner_mode", choices=["average", "zeros"], default=None,
                   help="pole-corner synthesis mode (reference run.py:683)")
    p.add_argument("--n_samples", type=int, default=8,
                   help="sample process: meshes drawn from the checkpoint's misc")
    p.add_argument("--backend_retries", type=int, default=None,
                   help="auto-resume attempts after transient backend errors")
    p.add_argument("--log_encoding_epoch", type=int, default=None,
                   help="encoding-logging period (reference run.py:643,664)")
    p.add_argument("--log_encoding_images", action="store_true",
                   help="log channel images instead of histograms "
                        "(reference run.py:203-211)")
    p.add_argument("--deviceResident", choices=["auto", "on", "off"],
                   default="auto",
                   help="keep the packed dataset HBM-resident (auto = fits-budget)")
    # optimizer block (reference run.py:632-671: Adam + per-batch CyclicLR)
    p.add_argument("--lr_base", type=float, default=None)
    p.add_argument("--lr_max", type=float, default=None)
    p.add_argument("--step_size_up", type=int, default=None)
    p.add_argument("--step_size_down", type=int, default=None)
    # loss-factor block (reference run.py:689-696)
    p.add_argument("--f_pos", type=float, default=None)
    p.add_argument("--f_nor", type=float, default=None)
    p.add_argument("--f_lap", type=float, default=None)
    p.add_argument("--f_kl", type=float, default=None)
    p.add_argument("--encDir", type=str, default="",
                   help="decode process: directory of latent .npz files "
                        "(default <outDir>/enc/val as written by --process encode)")
    p.add_argument("--dataDir", type=str, default="")
    p.add_argument("--logDir", type=str, default="log")
    p.add_argument("--outDir", type=str, default="")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--train_epoch", type=int, default=None)
    p.add_argument("--test_epoch", type=str, default=None)
    p.add_argument("--load_epoch", type=int, default=None)
    p.add_argument("--load_pt", type=str, default="",
                   help="import a reference PyTorch .pt checkpoint (e.g. "
                        "ico2ico_EB696.pt) into <logDir>/savedModel as a "
                        "native .ckpt before running the process")
    p.add_argument("--load_pretrained_model", action="store_true")
    p.add_argument("--subdivision", type=int, default=5)
    p.add_argument("--dataPthLvl", type=int, default=2)
    p.add_argument("--quickLearn", type=int, default=0)
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic meshes instead of --dataDir")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"], default=None)
    p.add_argument("--widths", type=int, nargs=3, default=None,
                   metavar=("W0", "W1", "W2"),
                   help="encoder/decoder stage widths (default 64 128 256)")
    p.add_argument("--latent_features", type=int, default=None)
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--no_data_parallel", action="store_true")
    p.add_argument("--debug_nans", action="store_true")
    p.add_argument("--debug", action="store_true", help="print per-epoch timing")
    p.add_argument("--profile_dir", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    cfg = Config()
    cfg.model.name = a.model
    cfg.model.subdivisions = a.subdivision
    cfg.process = a.process
    cfg.log_dir = a.logDir
    cfg.out_dir = a.outDir  # empty -> defaults to <model_log_dir>/data at use site
    cfg.enc_dir = a.encDir
    cfg.load_pt = a.load_pt
    cfg.data.data_dir = a.dataDir
    cfg.data.layout_level = a.dataPthLvl
    cfg.data.synthetic = a.synthetic
    apply_model_presets(cfg)
    if a.batch_size is not None:
        cfg.train.batch_size = a.batch_size
    if a.train_epoch is not None:
        cfg.train.train_epoch = a.train_epoch
    if a.test_epoch is not None:
        cfg.test_epoch = a.test_epoch
    if a.test_mode is not None:
        cfg.test_mode = a.test_mode
    cfg.data_instance = a.data_instance
    cfg.write_output_mesh = a.write_output_mesh
    cfg.n_samples = a.n_samples
    cfg.data.device_resident = a.deviceResident
    if a.backend_retries is not None:
        cfg.train.backend_retries = a.backend_retries
    if a.log_encoding_epoch is not None:
        cfg.train.log_encoding_epoch = a.log_encoding_epoch
    if a.log_encoding_images:
        cfg.train.log_encoding_hist = False
    if a.corner_mode is not None:
        cfg.model.corner_mode = a.corner_mode
    for f in ("lr_base", "lr_max", "step_size_up", "step_size_down"):
        v = getattr(a, f)
        if v is not None:
            setattr(cfg.optim, f, v)
    for f in ("f_pos", "f_nor", "f_lap", "f_kl"):
        v = getattr(a, f)
        if v is not None:
            setattr(cfg, f, v)
    if a.load_epoch is not None:
        cfg.train.load_epoch = a.load_epoch
        cfg.train.load_pretrained_model = True
    if a.load_pretrained_model:
        cfg.train.load_pretrained_model = True
    cfg.train.quick_learn = a.quickLearn
    cfg.train.seed = a.seed
    cfg.train.debug_nans = a.debug_nans
    cfg.train.debug_timing = a.debug
    cfg.train.profile_dir = a.profile_dir
    cfg.train.data_parallel = not a.no_data_parallel
    if a.compute_dtype:
        cfg.model.compute_dtype = a.compute_dtype
    if a.widths:
        cfg.model.widths = tuple(a.widths)
    if a.latent_features is not None:
        if a.latent_features <= 0:
            raise SystemExit("--latent_features must be positive")
        cfg.model.latent_features = a.latent_features
    cfg.model.use_pallas = a.use_pallas
    return cfg
