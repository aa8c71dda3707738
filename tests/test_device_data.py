"""Parity tests for the HBM-resident CVPPP sampler (data/device_data.py).

The device path must reproduce the host 'xiaoyu' chain (CVPPPTrain.sample:
flips -> torchvision RandomResizedCrop -> ImageNet normalize, reference
scripts_cvppp/data/data_provider.py) up to cv2's uint8 fixed-point rounding.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pixel_embedded_affinity_tpu.data import device_data as dd  # noqa: E402


def _rand_img_lab(h=96, w=120, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    lab = rng.integers(0, 9, (h, w), dtype=np.int32)
    return img, lab


@pytest.mark.parametrize("box", [(0, 0, 96, 120), (10, 7, 60, 80),
                                 (3, 40, 93, 41), (50, 0, 17, 23)])
def test_crop_resize_bilinear_matches_cv2(box):
    import cv2

    img, _ = _rand_img_lab()
    i, j, ch, cw = box
    out = 64
    ref = cv2.resize(img[i:i + ch, j:j + cw], (out, out),
                     interpolation=cv2.INTER_LINEAR).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda im: dd.crop_resize_bilinear(
            im, jnp.int32(i), jnp.int32(j), jnp.int32(ch), jnp.int32(cw),
            out))(img))
    # cv2 INTER_LINEAR on u8 is fixed-point (5-bit weights); the device path
    # is exact f32 — agree to ~1 intensity unit
    assert np.max(np.abs(got - ref)) <= 1.0 + 1e-4


@pytest.mark.parametrize("box", [(0, 0, 96, 120), (10, 7, 60, 80),
                                 (3, 40, 93, 41)])
def test_crop_resize_nearest_matches_cv2(box):
    import cv2

    _, lab = _rand_img_lab()
    i, j, ch, cw = box
    out = 64
    ref = cv2.resize(lab[i:i + ch, j:j + cw], (out, out),
                     interpolation=cv2.INTER_NEAREST)
    got = np.asarray(jax.jit(
        lambda lb: dd.crop_resize_nearest(
            lb, jnp.int32(i), jnp.int32(j), jnp.int32(ch), jnp.int32(cw),
            out))(lab))
    assert np.array_equal(got, ref)


def test_rrc_box_distribution_matches_host():
    """Box stats (area fraction, aspect, corner coverage) match the host
    10-attempt loop on the same geometry."""
    from pixel_embedded_affinity_tpu.data.augment2d import random_resized_crop

    H, W = 128, 128
    n = 600
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    fn = jax.jit(jax.vmap(lambda k: jnp.stack(dd.rrc_box(k, H, W))))
    dev = np.asarray(fn(keys))  # (n, 4): i, j, ch, cw

    rng = np.random.default_rng(0)
    img = np.zeros((H, W, 3), np.uint8)
    lab = np.arange(H * W, dtype=np.int32).reshape(H, W)
    host = []
    for _ in range(n):
        # recover the host box from the nearest-resized index label
        _, lr = random_resized_crop(img, lab, 64, rng)
        ii, jj = divmod(int(lr[0, 0]), W)
        i2, j2 = divmod(int(lr[-1, -1]), W)
        host.append((ii, jj, i2 - ii + 1, j2 - jj + 1))
    host = np.asarray(host, np.float64)

    d_area = (dev[:, 2] * dev[:, 3]) / (H * W)
    h_area = (host[:, 2] * host[:, 3]) / (H * W)
    assert abs(d_area.mean() - h_area.mean()) < 0.03
    assert abs((dev[:, 3] / dev[:, 2]).mean()
               - (host[:, 3] / host[:, 2]).mean()) < 0.05
    assert abs(dev[:, 0].mean() - host[:, 0].mean()) < 3.0
    # every box in bounds
    assert (dev[:, 0] >= 0).all() and (dev[:, 1] >= 0).all()
    assert (dev[:, 0] + dev[:, 2] <= H).all()
    assert (dev[:, 1] + dev[:, 3] <= W).all()


def test_sample_cvppp_batch_shapes_and_stats():
    imgs = np.stack([_rand_img_lab(seed=s)[0] for s in range(4)])
    labs = np.stack([_rand_img_lab(seed=s)[1] for s in range(4)])
    b = jax.jit(lambda k: dd.sample_cvppp_batch(imgs, labs, k, 3, out=64))(
        jax.random.PRNGKey(1))
    assert b["image"].shape == (3, 64, 64, 3)
    assert b["seg"].shape == (3, 64, 64)
    assert b["image"].dtype == jnp.float32 and b["seg"].dtype == jnp.int32
    im = np.asarray(b["image"])
    # ImageNet-normalized uniform-noise image: roughly centered, unit-ish std
    assert abs(im.mean()) < 0.6 and 0.8 < im.std() < 2.0
    assert np.isfinite(im).all()
    # distinct keys produce distinct samples
    b2 = jax.jit(lambda k: dd.sample_cvppp_batch(imgs, labs, k, 3, out=64))(
        jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(b2["image"]), im)


def test_load_cvppp_arrays_matches_host_split(tmp_path):
    from pixel_embedded_affinity_tpu.data.cvppp import CVPPPTrain, synthesize

    folder = str(tmp_path / "cvppp")
    synthesize(folder, n_train=6, n_valid=2, h=114, w=84, seed=0)
    imgs, labs = dd.load_cvppp_arrays(folder)
    ds = CVPPPTrain(folder, size=64, shifts=(1, 3), device_ema=True)
    assert imgs.shape[0] == len(ds.names)
    assert imgs.shape[1:] == (128, 128, 3) and labs.shape[1:] == (128, 128)
    # padded content matches the host loader's padding for image 0
    # (CVPPPTrain._load returns [0,1] f32; the DR stack keeps uint8)
    img0, lab0 = ds._load(ds.names[0])
    img0 = np.pad(img0, ((7, 7), (22, 22), (0, 0)), mode="reflect")
    lab0 = np.pad(lab0, ((7, 7), (22, 22)), mode="constant")
    assert np.allclose(imgs[0].astype(np.float32) / 255.0, img0, atol=1e-6)
    assert np.array_equal(labs[0], lab0.astype(np.int32))


@pytest.mark.slow
def test_train_device_resident_e2e(tmp_path):
    """Device-resident CVPPP training end-to-end on the 8-device mesh:
    zero per-step host batches, finite decreasing loss, checkpoint saved."""
    from pixel_embedded_affinity_tpu.config.config import load_config
    from pixel_embedded_affinity_tpu.data.cvppp import synthesize
    from pixel_embedded_affinity_tpu.train.loop import train

    folder = str(tmp_path / "cvppp")
    synthesize(folder, n_train=6, n_valid=2, h=114, w=84, seed=0)
    cfg = load_config("cvppp", overrides={
        "save_path": str(tmp_path / "out"),
        "train": {"total_iters": 6, "batch_size": 8, "display_freq": 2,
                  "valid_freq": 100, "save_freq": 6, "steps_per_call": 3,
                  "use_pallas": False},
        "data": {"data_folder": folder, "size": 64,
                 "device_resident": True},
    })
    cfg.model.filters = (8, 12, 16, 24, 32)
    cfg.model.emd = 8
    cfg.model.s2d_train = False  # CPU-compile speed
    state, _ = train(cfg, max_iters=6)
    assert int(state.step) == 6
