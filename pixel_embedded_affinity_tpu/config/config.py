"""Config system: dataclasses + YAML overlays + per-dataset presets.

Replaces the reference's AttrDict(yaml.load(...)) (scripts_cvppp/main.py:
473-474) with typed sections (NAME/MODEL/TRAIN/DATA/TEST preserved as
field groups), defaults, and validation. Presets mirror
scripts_{cvppp,bbbc039v1,ac3ac4}/config/*.yaml.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ModelConfig:
    arch: str = "resunet2d_deep"  # resunet2d_deep | unet_pni_deep | unet3d_mala
    input_nc: int = 3
    output_nc: int = 2
    emd: int = 16
    filters: tuple = (16, 32, 64, 128, 256)
    merge_mode: str = "add"
    # compute dtype: "auto" resolves to bfloat16 on TPU and float32
    # elsewhere (resolve_compute_dtype). Params/optimizer state stay f32
    # either way (Flax param_dtype default), so checkpoints interchange.
    # Adopted after the round-5 matched A/B on identical data+seed:
    # 2D dual-view step 89.0 -> 79.3 ms/iter (1.12x) with SBD/VOI at
    # parity (0.652/0.619 f32 vs 0.739/0.470 bf16 @2000 — synthetic-set
    # noise band), identical loss trajectory; 3D drive evidence in
    # docs/PERF.md round-5. `-o model.dtype=float32` restores the
    # reference's f32 training (scripts_cvppp/main.py trains f32).
    dtype: str = "auto"  # auto | float32 | bfloat16
    # s2d training graph for resunet2d_deep (models/resunet2d_s2d.py):
    # exact math, same checkpoint tree, faster fwd+bwd on TPU
    s2d_train: bool = True
    # int8 inference: quantize the measured-winning fast-forward stages
    # (ops/quant.py; calibrated on the first batch per shape). ~8% faster
    # on v5e with embedding cosine > 0.999 vs bf16 (docs/PERF.md r3);
    # default OFF — the reference runs f32 and the quality deltas, while
    # tiny, are nonzero (tests/test_int8_quant.py pins them)
    int8_infer: bool = False
    # int8 activation-scale calibration: number of images (one-dispatch
    # path; the serial per-image path calibrates on its first image) and
    # optional percentile of |activation| instead of max (e.g. 0.999).
    # Max over k images never clips calibration data; the percentile
    # trades rare-outlier headroom for scale resolution under
    # distribution shift.
    int8_calib_k: int = 8
    int8_calib_pct: float | None = None
    # bf16 compute for the tiled 3D inference predictor only (the
    # embedding is cast back to f32 before the affinity dot). Unlike the
    # structural rewrites, a dtype-only change survives the one-dispatch
    # scan engine: 1.28x measured in-scan (docs/PERF.md r3). Default ON
    # since r5: canvas-closeness + decoder-metric parity evidence on a
    # trained checkpoint (docs/PERF.md round-5 section) replaced the
    # f32-parity reflex. `-o model.bf16_tiled_infer=False` restores the
    # reference's f32 serving dtype.
    bf16_tiled_infer: bool = True
    # serving-optimized tiled-3D predictor (models/fast_forward3d.py:
    # folded BN + z-concat 2D-conv lowering of the PNI graph, exact math)
    # + the fused Pallas 3D affinity kernel on TPU. Measured INSIDE the
    # cached one-dispatch engine at the full AC3 serving geometry
    # (docs/profile_3d_serving.py, PERF.md round-5): the r3 toy-geometry
    # rejection of structural rewrites inverted once the engine stopped
    # re-tracing per call. PNI arch only; f32-roll fallback otherwise.
    fast_tiled_infer: bool = True


@dataclass
class TrainConfig:
    loss_func: str = "WeightedMSELoss"
    # 'affinity' = embedding->affinity MSE only (reference default);
    # 'discriminative' adds the pull/push/reg term on the final embedding
    # (the paper's ResNet-50/101 training recipe, README.md:124-139 +
    # scripts_cvppp/loss/loss_discriminative.py:7-63)
    loss_mode: str = "affinity"
    disc_weight: float = 1.0
    affs0_weight: float = 1.0
    deep_weight: int = 1
    self_emb: float = 1.0
    cross_emb: float = 1.0
    mask_weight: float = 0.0
    ct_weight: float = 0.0
    embedding_mode: int = 5  # 3D: norm1 | norm5
    opt_type: str = "adam"
    lr_mode: str = "fixed"
    base_lr: float = 1e-4
    end_lr: float = 1e-4
    total_iters: int = 200000
    warmup_iters: int = 0
    decay_iters: int = 100000
    power: float = 1.5
    weight_decay: float = 1e-6
    batch_size: int = 2
    num_workers: int = 2
    display_freq: int = 100
    valid_freq: int = 1000
    save_freq: int = 1000
    random_seed: int = 555
    resume: bool = False
    if_valid: bool = True
    # 3D in-loop validation decoders (any of 'waterz'/'lmc'/'mutex';
    # inference.py --decoders overrides at serving time). The reference
    # validates with waterz + LMC (scripts_ac3ac4/main.py:314-335).
    valid_decoders: tuple = ("waterz",)
    use_pallas: bool = True
    # fold the WeightedMSE criterion into the Pallas affinity kernels on
    # the 2D train path (per-offset partial sums out of the forward, loss
    # cotangent formed in-tile on the backward — the (B,K,H,W) gradient
    # never round-trips HBM). Exact-math vs the unfused loss
    # (tests/test_emb2aff_pallas.py::test_fused_wmse_*); measured -8.0 ms
    # of the 99.8 ms B=2 544^2 dual-view step (docs/profile_train_split.py,
    # ceiling 10.6 ms). Only engages with use_pallas + WeightedMSELoss.
    fuse_loss: bool = True
    # >1: dispatch S chained train steps as ONE jitted lax.scan over S
    # stacked batches. On links where every dispatch costs fixed latency
    # (the tunneled chip here) this amortizes it S-fold; display/valid/
    # save freqs are rounded up to multiples of S.
    steps_per_call: int = 1


@dataclass
class DataConfig:
    dataset: str = "cvppp"  # cvppp | bbbc039v1 | ac3ac4 | synthetic variants
    data_folder: str = "./data/CVPPP"
    size: int = 544
    shifts: tuple = (1, 3, 5, 9, 27)
    neighbor: int = 4
    strides: tuple = (5, 5)
    padding: bool = True
    separate_weight: bool = True
    valid_set: str = "local_20_1"
    if_ema_noise: bool = False
    if_ema_blur: bool = False
    if_ema_intensity: bool = True
    if_ema_mask: bool = True
    if_ema_flip: bool = True
    # generate GT targets on device: the host ships only image/ema_image/
    # int-seg/rules (~12x less transfer) and affinities/weights/pyramids
    # are built in-jit (exact-parity tested). Measured 0.53 vs 2.3+
    # s/iter wall on the tunneled chip. Default ON for the cvppp and
    # bbbc039v1 presets (both use padding=True + per-channel weights,
    # matching build_targets_2d_jax); 3D pipelines ignore it.
    device_gt: bool = False
    # generate the EMA view (intensity/cutout/flips) in-jit too: the host
    # ships ONE image and no rules; halves image transfer and removes the
    # per-sample host perturbation cost (data/device_aug.py). Applies to
    # all three pipelines; requires device_gt for the 2D ones.
    device_ema: bool = False
    # HBM-resident dataset: upload the whole training set to device once
    # and run sample selection + augmentation in-jit (data/device_data.py)
    # — per-iteration host->device traffic drops to zero. Requires
    # device_gt + device_ema, single-host. Supported: CVPPP ('xiaoyu'
    # chain: flips + RandomResizedCrop + normalize) and AC3/AC4 (crop +
    # full _augs_mix: flips/rot90/elastic/grayscale/EM artifacts); other
    # presets fall back to the host sampler with a log message.
    device_resident: bool = False
    # bbbc039v1 reflect-pad before the random crop (data_provider.py:117)
    bbbc_padding: int = 30
    # 3D
    dataset_name: str = "ac4"
    train_split: int = 80
    crop_size: tuple = (18, 160, 160)
    padding_3d: int = 50


@dataclass
class Config:
    name: str = "cvppp"
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    cache_path: str = "./caches"
    save_path: str = "./models"

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _apply(dc, overrides: dict):
    for k, v in overrides.items():
        if not hasattr(dc, k):
            raise KeyError(f"unknown config key: {type(dc).__name__}.{k}")
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _apply(cur, v)
        else:
            if isinstance(cur, tuple) and isinstance(v, (list, tuple)):
                v = tuple(v)
            setattr(dc, k, v)


PRESETS: dict[str, dict[str, Any]] = {
    # scripts_cvppp/config/cvppp.yaml parity
    "cvppp": {
        "name": "cvppp",
        "model": {"arch": "resunet2d_deep", "input_nc": 3, "output_nc": 2,
                  "filters": (16, 32, 64, 128, 256)},
        "train": {"mask_weight": 0.0, "ct_weight": 0.0, "lr_mode": "fixed",
                  "base_lr": 1e-4, "batch_size": 2},
        "data": {"dataset": "cvppp", "size": 544,
                 "shifts": (1, 3, 5, 9, 27), "strides": (5, 5),
                 "device_gt": True, "device_ema": True,
                 "device_resident": True},
    },
    # scripts_bbbc039v1/config/bbbc039v1.yaml parity
    "bbbc039v1": {
        "name": "bbbc039v1",
        "model": {"arch": "resunet2d_deep", "input_nc": 3, "output_nc": 2,
                  "filters": (16, 32, 64, 128, 256)},
        "train": {"mask_weight": 1000.0, "lr_mode": "fixed",
                  "base_lr": 1e-4, "batch_size": 2},
        "data": {"dataset": "bbbc039v1", "size": 256,
                 "shifts": (1, 3, 5, 9, 11), "strides": (10, 10),
                 "device_gt": True, "device_ema": True,
                 "device_resident": True},
    },
    # paper ResNet-50/101 variants (BASELINE configs 3/4): CVPPP training
    # with discriminative + affinity loss on the ResNet embedding nets
    "cvppp_resnet50": {
        "name": "cvppp_resnet50",
        "model": {"arch": "resnet50_embedding", "input_nc": 3,
                  "output_nc": 2},
        "train": {"loss_mode": "discriminative", "disc_weight": 1.0,
                  "lr_mode": "fixed", "base_lr": 1e-4, "batch_size": 2},
        "data": {"dataset": "cvppp", "size": 544,
                 "shifts": (1, 3, 5, 9, 27), "strides": (5, 5),
                 "device_gt": True, "device_ema": True,
                 "device_resident": True},
    },
    "cvppp_resnet101": {
        "name": "cvppp_resnet101",
        "model": {"arch": "resnet101_embedding", "input_nc": 3,
                  "output_nc": 2},
        "train": {"loss_mode": "discriminative", "disc_weight": 1.0,
                  "lr_mode": "fixed", "base_lr": 1e-4, "batch_size": 2},
        "data": {"dataset": "cvppp", "size": 544,
                 "shifts": (1, 3, 5, 9, 27), "strides": (5, 5),
                 "device_gt": True, "device_ema": True,
                 "device_resident": True},
    },
    # scripts_ac3ac4/config/ac3ac4.yaml parity
    "ac3ac4": {
        "name": "ac3ac4",
        "model": {"arch": "unet_pni_deep", "input_nc": 1, "output_nc": 12,
                  "filters": (28, 36, 48, 64, 80)},
        "train": {"embedding_mode": 5, "lr_mode": "fixed", "base_lr": 1e-4,
                  "batch_size": 2},
        "data": {"dataset": "ac3ac4", "dataset_name": "ac4",
                 "train_split": 80, "crop_size": (18, 160, 160),
                 "padding_3d": 50, "device_gt": True, "device_ema": True,
                 "device_resident": True},
    },
}


def load_config(preset: str | None = None, yaml_path: str | None = None,
                overrides: dict | None = None) -> Config:
    cfg = Config()
    if preset is not None:
        _apply(cfg, PRESETS[preset])
    if yaml_path is not None:
        import yaml

        with open(yaml_path) as f:
            _apply(cfg, yaml.safe_load(f))
    if overrides:
        _apply(cfg, overrides)
    return cfg


def resolve_compute_dtype(model_cfg) -> str:
    """Resolve ModelConfig.dtype to a concrete "float32"/"bfloat16".

    "auto" picks bfloat16 on TPU (the measured-parity shipped default,
    see the field comment) and float32 on CPU — keeping the CPU test
    tiers and torch-parity fixtures in f32, where XLA:CPU bf16 is both
    slow and loose. Explicit values pass through untouched.
    """
    d = model_cfg.dtype
    if d != "auto":
        return d
    try:
        import jax

        return ("bfloat16" if jax.devices()[0].platform == "tpu"
                else "float32")
    except Exception:
        return "float32"
