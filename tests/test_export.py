"""StableHLO serving artifacts (infer/export.py): export -> serialize ->
deserialize -> call must reproduce the live forward exactly, with the
symbolic batch dim serving multiple batch sizes from one artifact."""

import numpy as np
import pytest

from pixel_embedded_affinity_tpu.config import load_config

pytestmark = pytest.mark.slow


def _init_2d(cfg, h, w):
    import jax

    from pixel_embedded_affinity_tpu.train.loop import build_model

    model = build_model(cfg)
    return model.init(jax.random.PRNGKey(0),
                      np.zeros((1, h, w, 3), np.float32), train=False)


def test_export_2d_roundtrip(tmp_path):
    from pixel_embedded_affinity_tpu.infer.export import (
        export_serving, load_artifact, make_serving_fn_2d, save_artifact)

    cfg = load_config("cvppp")
    cfg.model.filters = (4, 6, 8, 12, 16)
    cfg.model.s2d_train = False
    h = w = 64
    variables = _init_2d(cfg, h, w)
    fn = make_serving_fn_2d(cfg, variables)

    exported = export_serving(fn, [(1, h, w, 3)])
    path = str(tmp_path / "cvppp.stablehlo")
    save_artifact(exported, path)
    loaded = load_artifact(path)

    rng = np.random.default_rng(0)
    for b in (1, 2):  # one artifact, multiple batch sizes (symbolic b)
        x = rng.normal(size=(b, h, w, 3)).astype(np.float32)
        (affs_art,) = loaded.call(x)
        (affs_live,) = fn(x)
        # the artifact is lowered with a symbolic batch dim, so XLA's
        # fusion/accumulation order differs from the live jit: f32 noise
        # up to ~1e-4 on affinities in [0,1] is expected, not a defect
        np.testing.assert_allclose(np.asarray(affs_art),
                                   np.asarray(affs_live),
                                   rtol=1e-3, atol=1e-4)
        assert affs_art.shape == (b, 10, h, w)


def test_export_checkpoint_bbbc_mask_head(tmp_path):
    """BBBC preset: the artifact must carry the mask-head logits output."""
    from pixel_embedded_affinity_tpu.infer.export import (
        export_checkpoint, load_artifact)

    cfg = load_config("bbbc039v1")
    cfg.model.filters = (4, 6, 8, 12, 16)
    cfg.model.s2d_train = False
    h, w = 64, 96
    variables = _init_2d(cfg, h, w)
    path = str(tmp_path / "bbbc.stablehlo")
    exported = export_checkpoint(cfg, variables, path, hw=(h, w))
    assert len(exported.out_avals) == 2  # affs + mask logits

    loaded = load_artifact(path)
    x = np.random.default_rng(1).normal(size=(1, h, w, 3)).astype(np.float32)
    affs, mask_logits = loaded.call(x)
    assert affs.shape == (1, 10, h, w)
    assert mask_logits.shape[-1] == 2
    assert np.isfinite(np.asarray(affs)).all()


def test_export_3d_tile_predictor(tmp_path):
    from pixel_embedded_affinity_tpu.infer.export import (
        export_checkpoint, load_artifact, make_serving_fn_3d)

    import jax

    from pixel_embedded_affinity_tpu.train.loop import build_model

    cfg = load_config("ac3ac4")
    cfg.model.filters = (2, 3, 4, 5, 6)
    tile = (18, 48, 48)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1,) + tile + (1,), np.float32),
                           train=False)
    path = str(tmp_path / "pni.stablehlo")
    export_checkpoint(cfg, variables, path, tile=tile)

    loaded = load_artifact(path)
    x = np.random.default_rng(2).normal(size=(1,) + tile + (1,)) \
        .astype(np.float32)
    (affs,) = loaded.call(x)
    (live,) = make_serving_fn_3d(cfg, variables)(x)
    assert affs.shape == (1, 12) + tile
    np.testing.assert_allclose(np.asarray(affs), np.asarray(live),
                               rtol=1e-3, atol=1e-4)
