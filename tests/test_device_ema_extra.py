"""In-jit EMA noise/blur (data/device_aug.py): the two reference EMA
perturbations that were host-only (if_ema_noise / if_ema_blur,
utils/consistency_aug.py:24-55) now exist on the device path; blur must be
cv2.GaussianBlur-exact for fixed (kernel, sigma)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pixel_embedded_affinity_tpu.data import device_aug as da  # noqa: E402


def test_gauss_blur_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    img = rng.random((4, 24, 20, 3)).astype(np.float32)
    halfs = np.array([0, 1, 2, 3], np.int32)       # kernels 1, 3, 5, 7
    sigmas = np.array([0.5, 0.45, 0.9, 1.0], np.float32)
    out = np.asarray(jax.jit(lambda x: da._gauss_blur_2d(
        x, jnp.asarray(halfs), jnp.asarray(sigmas), 3))(jnp.asarray(img)))
    for b in range(4):
        k = 2 * int(halfs[b]) + 1
        ref = cv2.GaussianBlur(img[b], (k, k), float(sigmas[b]))
        np.testing.assert_allclose(out[b], np.clip(ref, 0, 1),
                                   rtol=1e-5, atol=1e-5)


def test_gauss_noise_distribution():
    rng = np.random.default_rng(1)
    img = (0.25 + 0.5 * rng.random((8, 32, 32, 3))).astype(np.float32)
    out = np.asarray(jax.jit(da.add_gauss_noise_2d)(
        jnp.asarray(img), jax.random.PRNGKey(0)))
    assert out.min() >= 0.0 and out.max() <= 1.0
    d = out - img
    # one (H, W) field broadcast over channels (host parity: noise[..., None])
    np.testing.assert_allclose(d[..., 0], d[..., 1], atol=1e-6)
    # per-sample std within the U[0, 0.05] draw range (interior, no clip)
    stds = d[..., 0].reshape(8, -1).std(axis=1)
    assert (stds <= 0.055).all()
    assert stds.max() > 0.005  # not degenerate


def test_ema_view_2d_noise_blur_flags():
    rng = np.random.default_rng(2)
    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    fg = np.ones((2, 16, 16), bool)
    key = jax.random.PRNGKey(3)
    base, rules = jax.jit(lambda i, k: da.ema_view_2d(
        i, fg, k, noise=False, blur=False, intensity=False, mask=False,
        flip=False))(jnp.asarray(img), key)
    np.testing.assert_allclose(np.asarray(base), img)
    assert np.all(np.asarray(rules) == 0)
    pert, _ = jax.jit(lambda i, k: da.ema_view_2d(
        i, fg, k, noise=True, blur=True, intensity=False, mask=False,
        flip=False))(jnp.asarray(img), key)
    assert not np.allclose(np.asarray(pert), img)
    assert np.asarray(pert).min() >= 0 and np.asarray(pert).max() <= 1
