"""Train-to-quality regression gate (VERDICT r2 #7).

A fixed-seed synthetic CVPPP run (tiny model, 8-device CPU mesh, 250
iterations through the full preset path: s2d=False for CPU compile speed,
device GT + device EMA as the preset ships) must reach a minimum validation
SBD. The op/model parity suites protect numerics; THIS test protects
end-to-end learning dynamics — a silent degradation of the loss wiring,
target generation, augmentation, or optimizer now fails the suite instead
of drifting unnoticed between rounds (the r1 0.79 vs r2 0.60 synthetic-SBD
confusion came from comparing runs on DIFFERENT synthetic datasets).

Calibration (this exact config and seed, 1-core host, 2026-08-17):
step-250 valid SBD = 0.800, VOI 0.404, |DiC| 1.0. The gate asserts a
conservative floor well below that but far above chance.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

THRESHOLD_SBD = 0.55
SEED = 1234


def test_fixed_seed_training_reaches_sbd(tmp_path_factory):
    from pixel_embedded_affinity_tpu.config import load_config
    from pixel_embedded_affinity_tpu.data.cvppp import synthesize
    from pixel_embedded_affinity_tpu.train.loop import train

    folder = str(tmp_path_factory.mktemp("qgate"))
    synthesize(folder, n_train=8, n_valid=2, h=130, w=130, seed=SEED)
    cfg = load_config("cvppp", overrides={
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
    sbd = history[0]["valid/SBD"]
    assert np.isfinite(history[0]["valid/loss"])
    assert sbd >= THRESHOLD_SBD, (
        f"fixed-seed training quality regressed: SBD {sbd:.3f} < "
        f"{THRESHOLD_SBD} (see tests/test_quality_gate.py calibration note)")
