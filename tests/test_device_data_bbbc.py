"""Parity tests for the HBM-resident BBBC sampler
(data/device_data.py::sample_bbbc) vs the host chain (data/bbbc.py:74-104)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pixel_embedded_affinity_tpu.data import device_data as dd  # noqa: E402


@pytest.fixture(scope="module")
def bbbc_folder(tmp_path_factory):
    from pixel_embedded_affinity_tpu.data.bbbc import synthesize

    folder = str(tmp_path_factory.mktemp("bbbc"))
    synthesize(folder, n_train=4, n_valid=1, n_test=1, h=160, w=200, seed=0)
    return folder


def test_load_bbbc_arrays_matches_host(bbbc_folder):
    from pixel_embedded_affinity_tpu.data.bbbc import BBBCTrain

    imgs, labs = dd.load_bbbc_arrays(bbbc_folder, padding=30)
    ds = BBBCTrain(bbbc_folder, size=64, padding=30, light=True,
                   device_ema=True)
    assert imgs.shape[0] == len(ds.names) == 4
    assert imgs.shape[1:] == (220, 260) and labs.shape == imgs.shape
    img0, lab0 = ds._load(ds.names[0])
    assert np.allclose(imgs[0], np.pad(img0, 30, mode="reflect"))
    assert np.array_equal(labs[0],
                          np.pad(lab0.astype(np.int32), 30, mode="reflect"))


def test_sample_bbbc_shapes_and_stats(bbbc_folder):
    imgs, labs = dd.load_bbbc_arrays(bbbc_folder, padding=30)
    fn = jax.jit(lambda k: dd.sample_bbbc_batch(imgs, labs, k, 3, size=64,
                                                padding=30))
    b = fn(jax.random.PRNGKey(0))
    assert b["image"].shape == (3, 64, 64, 3)
    assert b["seg"].shape == (3, 64, 64)
    im = np.asarray(b["image"])
    assert im.min() >= 0.0 and im.max() <= 1.0
    # 3 identical grayscale channels
    assert np.array_equal(im[..., 0], im[..., 1])
    # id set is a subset of the source labels (+background from rotation)
    ids = set(np.unique(np.asarray(b["seg"])))
    assert ids <= (set(np.unique(labs)) | {0})
    b2 = fn(jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(b2["image"]), im)


def test_bbbc_aug_grayscale_and_noaug_paths(bbbc_folder):
    """With aug_prob=0 the sample is a plain crop (bit-match against the
    source array); with aug_prob=1 it differs."""
    imgs, labs = dd.load_bbbc_arrays(bbbc_folder, padding=30)
    key = jax.random.PRNGKey(2)
    plain = jax.jit(lambda k: dd.sample_bbbc(imgs, labs, k, size=64,
                                             padding=30, aug_prob=0.0))(key)
    # reconstruct the host crop from the same draws
    kp, ky, kx, kg, ka = jax.random.split(key, 5)
    k = int(jax.random.randint(kp, (), 0, imgs.shape[0]))
    ry = int(jax.random.randint(ky, (), 0, imgs.shape[1] - 124 + 1))
    rx = int(jax.random.randint(kx, (), 0, imgs.shape[2] - 124 + 1))
    ref = imgs[k][ry + 30:ry + 94, rx + 30:rx + 94]
    assert np.allclose(np.asarray(plain["image"])[..., 0], ref)
    ref_lab = labs[k][ry + 30:ry + 94, rx + 30:rx + 94]
    assert np.array_equal(np.asarray(plain["seg"]), ref_lab)


def test_bbbc_aug_chain_label_integrity(bbbc_folder):
    """Forced aug: labels stay integer ids from the source set; image stays
    in [0, 1]."""
    imgs, labs = dd.load_bbbc_arrays(bbbc_folder, padding=30)
    for s in range(6):
        b = jax.jit(lambda k: dd.sample_bbbc(
            imgs, labs, k, size=64, padding=30, aug_prob=1.0))(
                jax.random.PRNGKey(s))
        im = np.asarray(b["image"])
        assert im.min() >= 0.0 and im.max() <= 1.0
        ids = set(np.unique(np.asarray(b["seg"])))
        assert ids <= (set(np.unique(labs)) | {0})


@pytest.mark.slow
def test_train_device_resident_bbbc_e2e(tmp_path):
    """Device-resident BBBC training (mask head + device GT) on the
    8-device mesh."""
    from pixel_embedded_affinity_tpu.config.config import load_config
    from pixel_embedded_affinity_tpu.data.bbbc import synthesize
    from pixel_embedded_affinity_tpu.train.loop import train

    folder = str(tmp_path / "bbbc")
    synthesize(folder, n_train=6, n_valid=2, n_test=1, h=160, w=200, seed=0)
    cfg = load_config("bbbc039v1", overrides={
        "save_path": str(tmp_path / "out"),
        "train": {"total_iters": 4, "batch_size": 8, "display_freq": 2,
                  "valid_freq": 100, "save_freq": 4, "steps_per_call": 2,
                  "use_pallas": False},
        "data": {"data_folder": folder, "size": 64,
                 "device_resident": True},
    })
    cfg.model.filters = (8, 12, 16, 24, 32)
    cfg.model.emd = 8
    cfg.model.s2d_train = False
    state, _ = train(cfg, max_iters=4)
    assert int(state.step) == 4
