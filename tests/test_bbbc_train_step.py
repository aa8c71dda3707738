"""BBBC train step: mask-head loss path + deep supervision with shifts [1,3,5,9,11]."""

import pytest
import numpy as np
import jax

from pixel_embedded_affinity_tpu.config import load_config
from pixel_embedded_affinity_tpu.ops import multi_offset
from pixel_embedded_affinity_tpu.train.loop import build_model, init_state
from pixel_embedded_affinity_tpu.train.optim import make_optimizer
from pixel_embedded_affinity_tpu.train.train_step import make_train_step_2d

pytestmark = pytest.mark.slow


def test_bbbc_train_step_with_mask_head(tmp_path):
    from pixel_embedded_affinity_tpu.data.bbbc import synthesize, BBBCTrain
    from pixel_embedded_affinity_tpu.data.provider import Provider

    folder = str(tmp_path / "bbbc")
    synthesize(folder, n_train=2, n_valid=1, n_test=1, h=200, w=240)
    cfg = load_config("bbbc039v1", overrides={
        "data": {"data_folder": folder, "size": 64}})
    cfg.model.filters = (4, 6, 8, 12, 16)

    ds = BBBCTrain(folder, size=64, shifts=(1, 3, 5, 9, 11))
    provider = Provider(ds, batch_size=2, num_workers=1)
    batch = provider.next()
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["affs"].shape == (2, 10, 64, 64)
    assert batch["down4"].shape[1] == 3 * 2  # nb_half * 1 offsets

    model = build_model(cfg)
    tx = make_optimizer(1e-4)
    state = init_state(cfg, model, tx, batch)
    offsets = multi_offset([1, 3, 5, 9, 11], neighbor=4)
    step = jax.jit(make_train_step_2d(
        model, tx, offsets, mask_weight=1000.0, use_pallas=False))
    state, pred, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_mask"]) > 0
    provider.close()
