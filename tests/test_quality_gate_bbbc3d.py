"""Train-to-quality regression gates for BBBC039V1 and AC3/AC4 (r4,
VERDICT r3 #6) — companions to the CVPPP gate (test_quality_gate.py).

Fixed-seed synthetic short trains through the full preset paths (device
GT + device EMA wiring as shipped, CPU mesh, tiny models) asserting
quality floors:

* BBBC: step-250 valid SBD + AJI from the in-loop decode
  (predicted-mask-seeded mutex; train/loop.py validate now reports the
  reference's AJI/F1/PQ family for mask-head configs).
* AC3/AC4: step-200 affinity MSE + mutex-decode VOI on the tiled
  full-volume validation.

Calibration (these exact configs and seeds, 1-core host, 2026-08-19):
BBBC step-250 valid SBD = 0.394, AJI = 0.310, DiC 34.5 (the tiny-model
predicted-mask-seeded decode is weak at 250 iters — the 10k chip drive
reaches AJI 0.82 — but an untrained or mis-wired pipeline scores ~0);
3D step-200 affs_mse = 0.064, mutex VOI = 1.69 (blank 1-segment decode
on this volume: ~3.6). The gates assert conservative floors well below
calibration but far above chance.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SEED = 4321


def test_bbbc_fixed_seed_training_reaches_quality(tmp_path_factory):
    from pixel_embedded_affinity_tpu.config import load_config
    from pixel_embedded_affinity_tpu.data.bbbc import synthesize
    from pixel_embedded_affinity_tpu.train.loop import train

    folder = str(tmp_path_factory.mktemp("qgate_bbbc"))
    synthesize(folder, n_train=8, n_valid=2, n_test=0, h=200, w=200,
               seed=SEED)
    cfg = load_config("bbbc039v1", overrides={
        "data": {"data_folder": folder, "size": 128},
        "train": {"batch_size": 8, "num_workers": 2, "display_freq": 50,
                  "valid_freq": 250, "save_freq": 10 ** 9,
                  "use_pallas": False, "total_iters": 250,
                  "random_seed": SEED},
        "save_path": os.path.join(folder, "models"),
    })
    cfg.model.filters = (8, 12, 16, 24, 32)
    cfg.model.s2d_train = False

    state, history = train(cfg, max_iters=250)
    assert len(history) == 1
    m = history[0]
    assert np.isfinite(m["valid/loss"])
    sbd = m["valid/SBD"]
    assert sbd >= 0.25, (
        f"BBBC fixed-seed training quality regressed: SBD {sbd:.3f} < 0.25"
        " (calibrated 0.394 — see module docstring)")
    # the AJI family rides the same in-loop predicted-mask-seeded decode
    # (reference BBBC validation reports AJI/F1/PQ,
    # scripts_bbbc039v1/main.py:369-434)
    assert m["valid/AJI"] >= 0.18, (
        f"BBBC validation AJI regressed: {m['valid/AJI']:.3f} < 0.18 "
        "(calibrated 0.310)")


def test_ac3ac4_fixed_seed_training_reaches_quality():
    from pixel_embedded_affinity_tpu.config import load_config
    from pixel_embedded_affinity_tpu.data.ac3ac4 import (
        AC3AC4Train, AC3AC4ValidVolume, synthesize_volume)
    from pixel_embedded_affinity_tpu.train.loop import train

    raw, label = synthesize_volume(d=30, h=96, w=96, n_cells=25, seed=SEED)
    cfg = load_config("ac3ac4", overrides={
        "train": {"batch_size": 2, "num_workers": 1, "display_freq": 50,
                  "valid_freq": 200, "save_freq": 10 ** 9,
                  "use_pallas": False, "total_iters": 200,
                  "random_seed": SEED, "valid_decoders": ("mutex",)},
        "data": {"crop_size": (18, 64, 64)},
        "save_path": "/tmp/pea_qgate_3d",
    })
    cfg.model.filters = (4, 6, 8, 12, 16)
    train_ds = AC3AC4Train("", train_split=30, crop_size=(18, 64, 64),
                           padding=8, arrays=(raw, label))
    valid = AC3AC4ValidVolume("", arrays=(raw[:20], label[:20]))

    state, history = train(cfg, max_iters=200,
                           data_override=(train_ds, valid))
    assert len(history) == 1
    m = history[0]
    assert np.isfinite(m["valid/affs_mse"])
    assert m["valid/affs_mse"] <= 0.15, (
        f"3D affinity MSE regressed: {m['valid/affs_mse']:.3f} > 0.15 "
        "(calibrated 0.064)")
    voi_key = next(k for k in m if k.endswith("_voi"))
    assert m[voi_key] <= 2.8, (
        f"3D mutex-decode VOI regressed: {m[voi_key]:.3f} > 2.8 "
        "(calibrated 1.69; blank decode on this volume: ~3.6)")
