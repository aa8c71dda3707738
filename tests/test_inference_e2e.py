"""Inference driver smoke tests (random weights; exercises decode+metrics)."""

import os

import numpy as np
import pytest

from pixel_embedded_affinity_tpu.config import load_config

pytestmark = pytest.mark.slow


def test_run_inference_2d_bbbc(tmp_path):
    """BBBC path: predicted-mask-seeded decode + AJI/F1/PQ metrics."""
    import jax

    from pixel_embedded_affinity_tpu.data.bbbc import synthesize, BBBCValidation
    from pixel_embedded_affinity_tpu.infer import run_inference_2d
    from pixel_embedded_affinity_tpu.train.loop import build_model

    folder = str(tmp_path / "bbbc")
    synthesize(folder, n_train=2, n_valid=1, n_test=1, h=200, w=240)
    cfg = load_config("bbbc039v1", overrides={
        "data": {"data_folder": folder, "size": 128}})
    cfg.model.filters = (4, 6, 8, 12, 16)

    class SmallValid(BBBCValidation):
        def __getitem__(self, idx):
            s = super().__getitem__(idx)
            # crop to a small window for CPU speed
            s["image"] = s["image"][:128, :128]
            s["seg"] = s["seg"][:128, :128]
            s["affs"] = s["affs"][:, :128, :128]
            s["wmap"] = s["wmap"][:, :128, :128]
            s["mask"] = s["mask"][:, :128, :128]
            return s

    valid = SmallValid(folder, shifts=(1, 3, 5, 9, 11))
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 128, 128, 3), np.float32),
                           train=False)
    results, agg = run_inference_2d(cfg, variables, valid, use_pallas=False)
    assert len(results) == 1
    for key in ("SBD", "VOI", "ARAND", "AJI", "F1", "PQ"):
        assert key in agg and np.isfinite(agg[key])


def test_run_inference_3d_tiled(tmp_path):
    """3D path: tiled forward + mutex/waterz/multicut decoders + VOI."""
    import jax

    from pixel_embedded_affinity_tpu.data.ac3ac4 import synthesize_volume
    from pixel_embedded_affinity_tpu.infer import run_inference_3d
    from pixel_embedded_affinity_tpu.train.loop import build_model

    raw, label = synthesize_volume(d=24, h=96, w=96, n_cells=18, seed=2)
    cfg = load_config("ac3ac4")
    cfg.model.filters = (4, 6, 8, 12, 16)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 18, 64, 64, 1), np.float32),
                           train=False)
    affs, results = run_inference_3d(
        cfg, variables, raw.astype(np.float32) / 255.0, gt=label,
        decoders=("mutex", "waterz", "lmc"),
        crop_size=(18, 64, 64), stride=(10, 32, 32), padding=(2, 8, 8),
        batch_size=4, use_pallas=False)
    assert affs.shape == (12, 24, 96, 96)
    for dec in ("mutex", "waterz", "lmc"):
        seg, m = results[dec]
        assert seg.shape == (24, 96, 96)
        assert np.isfinite(m["voi"]) and np.isfinite(m["arand"])


def test_cvppp_submission_writer(tmp_path):
    from pixel_embedded_affinity_tpu.infer.inference2d import (
        write_cvppp_submission)
    import h5py

    segs = [np.pad(np.ones((10, 10), np.uint16), ((7, 7), (22, 22)))
            for _ in range(2)]
    names = ["plant000", "plant001"]
    out = str(tmp_path / "submission.h5")
    write_cvppp_submission(segs, names, out)
    with h5py.File(out, "r") as f:
        assert f["A1/plant000/label"].shape == (10, 10)
        assert f["A1/plant001/label"][()].max() == 1


def test_convert_mask_to_instances():
    from pixel_embedded_affinity_tpu.data.bbbc import convert_mask_to_instances

    m = np.zeros((40, 40), np.uint8)
    m[2:12, 2:12] = 1   # 100 px
    m[20:22, 20:22] = 1  # 4 px -> dropped
    m[30:38, 30:38] = 1  # 64 px
    ins = convert_mask_to_instances(m, min_size=25)
    assert set(np.unique(ins)) == {0, 1, 2}


def test_cvppp_test_mode_submission(tmp_path):
    """CVPPP test protocol: FG-given decode -> CodaLab submission.h5."""
    import jax
    import h5py

    from pixel_embedded_affinity_tpu.data.cvppp import synthesize, CVPPPTest
    from pixel_embedded_affinity_tpu.infer.inference2d import run_cvppp_test
    from pixel_embedded_affinity_tpu.train.loop import build_model

    folder = str(tmp_path / "cvppp")
    synthesize(folder, n_train=2, n_valid=1, n_test=2, h=114, w=84)
    cfg = load_config("cvppp", overrides={
        "data": {"data_folder": folder}})
    cfg.model.filters = (4, 6, 8, 12, 16)

    ds = CVPPPTest(folder)
    assert len(ds) == 2
    model = build_model(cfg)
    s0 = ds[0]
    variables = model.init(jax.random.PRNGKey(0), s0["image"][None],
                           train=False)
    out = str(tmp_path / "submission.h5")
    segs, names = run_cvppp_test(cfg, variables, ds, out, use_pallas=False)
    assert names == ["plant002", "plant003"]
    with h5py.File(out, "r") as f:
        assert f"A1/{names[0]}/label" in f
        assert f[f"A1/{names[0]}/label"].shape == (114, 84)


def test_bf16_tiled_infer_close_to_f32():
    """model.bf16_tiled_infer: the bf16 predictor's stitched affinity
    canvas must stay close to the f32 one (the serving-mode quality bar;
    decode consumes f32 affinities either way)."""
    import jax

    from pixel_embedded_affinity_tpu.data.ac3ac4 import synthesize_volume
    from pixel_embedded_affinity_tpu.infer import run_inference_3d
    from pixel_embedded_affinity_tpu.train.loop import build_model

    raw, label = synthesize_volume(d=22, h=80, w=80, n_cells=14, seed=5)
    vol = raw.astype(np.float32) / 255.0
    cfg = load_config("ac3ac4")
    cfg.model.filters = (4, 6, 8, 12, 16)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(3),
                           np.zeros((1, 18, 64, 64, 1), np.float32),
                           train=False)
    kw = dict(gt=None, decoders=(), crop_size=(18, 64, 64),
              stride=(10, 32, 32), padding=(2, 8, 8), batch_size=4,
              use_pallas=False)
    cfg.model.bf16_tiled_infer = False  # default is ON since r5
    affs_f32, _ = run_inference_3d(cfg, variables, vol, **kw)
    cfg.model.bf16_tiled_infer = True
    affs_bf16, _ = run_inference_3d(cfg, variables, vol, **kw)
    assert affs_bf16.shape == affs_f32.shape
    # bf16 mantissa is 8 bits; the canvas is a Gaussian-weighted average
    # of many tiles so per-voxel error stays small
    err = np.abs(affs_bf16 - affs_f32)
    assert float(err.max()) < 0.05
    assert float(err.mean()) < 0.005


def test_fast_tiled_infer_matches_dense_f32():
    """model.fast_tiled_infer: the folded-BN z-concat serving graph
    (models/fast_forward3d.py) stitched through the tiled engine must
    reproduce the dense Flax graph's canvas to f32 tolerance — the
    predictor swap is exact math, not an approximation."""
    import jax

    from pixel_embedded_affinity_tpu.data.ac3ac4 import synthesize_volume
    from pixel_embedded_affinity_tpu.infer import run_inference_3d
    from pixel_embedded_affinity_tpu.train.loop import build_model

    raw, _ = synthesize_volume(d=22, h=80, w=80, n_cells=14, seed=7)
    vol = raw.astype(np.float32) / 255.0
    cfg = load_config("ac3ac4")
    cfg.model.filters = (4, 6, 8, 12, 16)
    cfg.model.bf16_tiled_infer = False
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(9),
                           np.zeros((1, 18, 64, 64, 1), np.float32),
                           train=False)
    kw = dict(gt=None, decoders=(), crop_size=(18, 64, 64),
              stride=(10, 32, 32), padding=(2, 8, 8), batch_size=4,
              use_pallas=False)
    cfg.model.fast_tiled_infer = True
    affs_fast, _ = run_inference_3d(cfg, variables, vol, **kw)
    cfg.model.fast_tiled_infer = False
    affs_dense, _ = run_inference_3d(cfg, variables, vol, **kw)
    # f32 reassociation between the 3D conv and the z-concat 2D lowering
    np.testing.assert_allclose(affs_fast, affs_dense, atol=1e-4)
