"""Single config tree for every trainer/tester.

Replaces the reference's three overlapping mechanisms (argparse per script at
train_ours_2D.py:469-524, YAML overlay at train_share_encoder_2D.py:530-540,
yacs for SwinUNet) with one dataclass tree + YAML/CLI override. Default values
reproduce the reference argparse defaults.
"""
from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

import yaml


@dataclass
class DataConfig:
    root_path: str = "data/ACDC"          # dataset dir (h5 layout, see data/datasets.py)
    dataset: str = "ACDC"                 # ACDC | LA | Pancreas_CT | BraTS2019 | synthetic
    image_size: Tuple[int, int] = (256, 256)
    patch_size_3d: Tuple[int, int, int] = (112, 112, 80)
    num_classes: int = 4
    in_chns: int = 1
    labeled_num: int = 7                  # labeled patients (train_ours_2D.py:495)
    batch_size: int = 24                  # global batch (train_ours_2D.py:479)
    labeled_bs: int = 12                  # labeled half (train_ours_2D.py:492)
    num_workers: int = 4
    synthetic_train_size: int = 1312      # slices when dataset == synthetic
    synthetic_val_volumes: int = 8
    device_input: bool = True             # HBM-resident slice pool + on-device
                                          # two-stream sampling/augmentation
                                          # (data/device_data.py): zero per-step
                                          # h2d traffic — sidesteps the PJRT
                                          # plugin's per-transfer host leak and
                                          # takes the host out of the hot loop.
                                          # false = threaded host loader path.


@dataclass
class ModelConfig:
    name: str = "dualdecoder"             # net_factory key (train_ours_2D.py:476)
    decoder_type: str = "mcnet"           # same | plus | mcnet (train_ours_2D.py:514)
    feature_chns: Tuple[int, ...] = (16, 32, 64, 128, 256)   # unet.py:250
    dropout: Tuple[float, ...] = (0.05, 0.1, 0.2, 0.3, 0.5)  # unet.py:251
    n_filters_3d: int = 16                # vnet.py n_filters
    name_3d: str = "dualdecoder"          # net_factory_3d key (test_LA.py:11)
    normalization_3d: str = "batchnorm"
    dtype: str = "float32"                # compute dtype: float32 | bfloat16
    s2d_stage2: bool = False              # 3D stage-2 s2d residency: k4s2
                                          # fused convs for the 32-ch stage
                                          # (exact; inference engines enable)
    s2d_stem: bool = True                 # run the 3D full-res stage in
                                          # space-to-depth layout (exact TPU
                                          # fast path, ops/s2d.py)
    zpack_stage2: bool = False            # 3D 32-ch stages as stride-(1,1,4)
                                          # z-packed convs: 4x output lanes,
                                          # contiguous unpack (exact,
                                          # ops/s2d.py zpack_conv_kernel)


@dataclass
class OptimConfig:
    base_lr: float = 0.01                 # train_ours_2D.py:483
    momentum: float = 0.9                 # train_ours_2D.py:278
    weight_decay: float = 1e-4            # train_ours_2D.py:278
    poly_power: float = 0.9               # train_ours_2D.py:387
    max_iterations: int = 30000           # train_ours_2D.py:478
    remat: bool = True                    # rematerialize each model pass in the
                                          # multi-pass CHAP step (trades ~1x
                                          # extra fwd FLOPs for O(passes) less
                                          # activation memory)
    fused_passes: bool = True             # run the student-mix, channel-
                                          # dropout and VAT-adversarial
                                          # forwards as ONE vmapped 3-instance
                                          # apply (convs see 3x batch; BN stats
                                          # stay per-instance under vmap, so
                                          # this is the SAME math as separate
                                          # passes — tests/test_step_fused.py)
    split_step: bool = False              # compile the CHAP step as TWO jitted
                                          # programs (teacher+NMS / student) —
                                          # numerically identical, halves the
                                          # compiler's peak memory (needed to
                                          # train the full method at the LA
                                          # patch through the tunnel compiler)


@dataclass
class SemiConfig:
    consistency: float = 1.0              # train_ours_2D.py:503
    consistency_rampup: float = 50.0      # train_ours_2D.py:505
    consistency_type: str = "ce"          # ce | mse
    ema_decay: float = 0.99
    adv_noise: bool = False               # enable VAT branch (train_ours_2D.py:516)
    dropout: bool = False                 # enable channel-dropout branch (:518)
    comp_drop: bool = False               # complementary masks (:519)
    noise_mag: float = 10.0               # VAT xi (train_ours_2D.py:512)
    adv_epi: float = 6.0                  # VAT epsilon (train_ours_2D.py:290)
    adv_losstype: str = "kl"              # kl | dice (:515)
    topk1: float = 0.1                    # create_maskV1 topk (:523)
    gradsim_every: int = 1                # update the GradSim channel scores
                                          # every N steps (EMA decay adjusted
                                          # to decay**N so the averaging
                                          # horizon is preserved). 1 = the
                                          # reference's per-step update; the
                                          # scores are slow EMA statistics, so
                                          # a small N trades negligible signal
                                          # lag for skipping the two extra
                                          # backward passes on N-1 steps.
    w_adv: float = 1.0
    w_drop: float = 1.0
    temperature: float = 0.1              # sharpening (train_ours_2D.py:61)
    # shared-encoder (ACAL) trainer extras (train_share_encoder_2D.py:512-525)
    acal: bool = False
    acal_start_iter: int = 10000          # replay trigger (:366)
    extra: bool = False
    worst: bool = False
    worst_losstype: str = "ce"
    mb_capacity: int = 256                # Image_MemoryBank capacity (:199)
    mb_patch_size: int = 64               # (:523)
    mb_feed_every: int = 1                # feed the bank every N steps (the
                                          # reference feeds every step; raise on
                                          # tunnel-attached TPUs where the
                                          # per-step knowledge download is slow)
    trade_off_worst: float = 0.3


@dataclass
class EvalConfig:
    eval_every: int = 200                 # train_ours_2D.py:407
    model_type: str = "logit_ensemble"    # model1|model2|logit_ensemble|prob_ensemble
    stride_xy: int = 18                   # LA protocol (test_LA.py:50)
    stride_z: int = 4
    nms: bool = False                     # largest-CC post-processing (test_LA.py:15)
    sw_batch: int = 8                     # patches per sliding-window forward batch


@dataclass
class ParallelConfig:
    data_axis: str = "data"
    num_devices: int = 0                  # 0 = all visible devices
    dcn_axis_size: int = 1                # outer DCN data-parallel axis (multi-slice)


@dataclass
class RunConfig:
    exp: str = "bcp"
    seed: int = 1337                      # train_ours_2D.py:487
    deterministic: bool = True
    snapshot_root: str = "model"
    text: str = "null"
    log_every: int = 20
    checkpoint_every: int = 200
    prng_impl: str = "threefry2x32"       # threefry2x32 | rbg: rbg generates
                                          # random bits much faster on TPU
                                          # (the CHAP step draws ~25M dropout
                                          # bits/pass); threefry is the jax
                                          # default and reproduces the
                                          # reference rounds' draws


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    semi: SemiConfig = field(default_factory=SemiConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    run: RunConfig = field(default_factory=RunConfig)


_SCI_RE = re.compile(r"^1e-?\d+$")


def _coerce(value: Any) -> Any:
    # "1e-x" strings coerce to float, matching train_share_encoder_2D.py:534-538.
    if isinstance(value, str) and _SCI_RE.match(value):
        return float(value)
    return value


def update_values(src: dict, dst: Any) -> Any:
    """Overlay a (possibly nested) dict onto a Config in place.

    Equivalent of the missing utils.util.update_values contract
    (train_share_encoder_2D.py:540): YAML keys override existing config
    fields; unknown keys raise so typos fail loudly.
    """
    for key, value in src.items():
        if not hasattr(dst, key):
            raise KeyError(f"unknown config key: {key!r}")
        cur = getattr(dst, key)
        if dataclasses.is_dataclass(cur) and isinstance(value, dict):
            update_values(value, cur)
        else:
            if isinstance(cur, tuple) and isinstance(value, list):
                value = tuple(value)
            setattr(dst, key, _coerce(value))
    return dst


def apply_overrides(cfg: Config, overrides: Optional[List[str]]) -> Config:
    """Apply `a.b=c` positional overrides (values YAML-parsed) in place."""
    for item in overrides or []:
        key, _, raw = item.partition("=")
        parsed = yaml.safe_load(raw)
        node: Any = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            node = getattr(node, part)
        update_values({parts[-1]: parsed}, node)
    return cfg


def load_config(yaml_path: Optional[str] = None, overrides: Optional[List[str]] = None) -> Config:
    """Build a Config from defaults + optional YAML file + `a.b=c` CLI overrides."""
    cfg = Config()
    if yaml_path:
        with open(yaml_path) as handle:
            loaded = yaml.safe_load(handle) or {}
        update_values(loaded, cfg)
    return apply_overrides(cfg, overrides)


def config_to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)
