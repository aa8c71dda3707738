"""cv2/scipy-convention parity for the in-jit warp primitives
(data/device_warp.py) used by the HBM-resident samplers."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pixel_embedded_affinity_tpu.data import device_warp as dw  # noqa: E402


def _img(h=64, w=80, seed=0, ch=None):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.random(shape).astype(np.float32)


def test_gaussian_blur2d_matches_scipy():
    from scipy.ndimage import gaussian_filter

    x = _img(50, 70)
    ref = gaussian_filter(x, 4.0)  # default truncate=4, mode='reflect'
    got = np.asarray(jax.jit(lambda a: dw.gaussian_blur2d(a, 4.0))(x))
    assert np.max(np.abs(got - ref)) < 1e-5


@pytest.mark.parametrize("border", ["reflect", "constant"])
def test_remap_bilinear_matches_cv2(border):
    import cv2

    x = _img(48, 56)
    rng = np.random.default_rng(1)
    h, w = x.shape
    mx = (rng.random((h, w)).astype(np.float32) * (w + 8) - 4)
    my = (rng.random((h, w)).astype(np.float32) * (h + 8) - 4)
    mode = cv2.BORDER_REFLECT if border == "reflect" else cv2.BORDER_CONSTANT
    ref = cv2.remap(x, mx, my, cv2.INTER_LINEAR, borderMode=mode)
    got = np.asarray(jax.jit(
        lambda a: dw.remap_bilinear(a, mx, my, border))(x))
    assert np.max(np.abs(got - ref)) < 1e-5


def test_remap_nearest_matches_cv2():
    import cv2

    lab = np.arange(48 * 56, dtype=np.float32).reshape(48, 56)
    rng = np.random.default_rng(2)
    h, w = lab.shape
    mx = (rng.random((h, w)).astype(np.float32) * (w + 6) - 3)
    my = (rng.random((h, w)).astype(np.float32) * (h + 6) - 3)
    ref = cv2.remap(lab, mx, my, cv2.INTER_NEAREST,
                    borderMode=cv2.BORDER_REFLECT)
    got = np.asarray(jax.jit(
        lambda a: dw.remap_nearest(a, mx, my, "reflect"))(lab))
    # cv2 INTER_NEAREST uses fixed-point coords; disagreement only possible
    # within rounding epsilon of half-integer coordinates
    frac_x = np.abs(mx - np.floor(mx) - 0.5)
    frac_y = np.abs(my - np.floor(my) - 0.5)
    safe = (frac_x > 1e-3) & (frac_y > 1e-3)
    assert np.array_equal(got[safe], ref[safe])


@pytest.mark.parametrize("angle", [17.3, 90.0, 201.7, 333.3])
def test_rotation_matches_host_random_rotate(angle):
    """Full-chain parity with data/augment2d.random_rotate (which itself is
    the tested cv2 parity port of reference rotation.py)."""
    import cv2

    h = w = 72
    img = _img(h, w, seed=3, ch=1)
    lab = np.arange(h * w, dtype=np.int32).reshape(h, w) % 37

    m = cv2.getRotationMatrix2D((h / 2, w / 2), angle, 1)
    ref_img = cv2.warpAffine(img, m, (h, w), 1.0, flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_CONSTANT)[..., None]
    ref_lab = cv2.warpAffine(lab.astype(np.float32), m, (h, w), 1.0,
                             flags=cv2.INTER_NEAREST,
                             borderMode=cv2.BORDER_CONSTANT).astype(np.int32)

    def dev(im, lb):
        mx, my = dw.rotation_coords(jnp.float32(angle), h, w)
        return (dw.remap_bilinear(im, mx, my, "constant"),
                dw.remap_nearest(lb, mx, my, "constant"))

    got_img, got_lab = jax.jit(dev)(img, lab)
    got_img, got_lab = np.asarray(got_img), np.asarray(got_lab)
    assert np.max(np.abs(got_img - ref_img)) < 2e-5
    # nearest: allow disagreement on half-integer rounding ties only
    frac = np.abs(got_img[..., 0] - ref_img[..., 0])
    mism = got_lab != ref_lab
    assert mism.mean() < 0.01


@pytest.mark.parametrize("f", [0.8, 0.93, 1.0, 1.07, 1.2])
def test_rescale_matches_host_random_rescale(f):
    import cv2

    from pixel_embedded_affinity_tpu.data.augment2d import center_crop_pad

    h, w = 64, 80
    img = _img(h, w, seed=4)
    img_r = cv2.resize(img, (0, 0), fx=f, fy=f,
                       interpolation=cv2.INTER_LINEAR)
    ref = center_crop_pad(img_r, h, w)

    def dev(im):
        mx, my = dw.rescale_coords(jnp.float32(f), h, w, h, w)
        return dw.remap_bilinear(im, mx, my, "reflect")

    got = np.asarray(jax.jit(dev)(img))
    assert got.shape == ref.shape
    # interior must match to float precision; the reflect seam rows/cols
    # (pad case) involve cv2's clamped edge lerp — allow a thin border band
    pad = max(2, int(np.ceil((1 / min(f, 1.0) - 1) * 4)) + 2)
    assert np.max(np.abs(got[pad:-pad, pad:-pad]
                         - ref[pad:-pad, pad:-pad])) < 1e-4


def test_elastic_field_stats():
    """Displacement field distribution: zero-mean, std matching the
    reference expression gaussian_filter(U(-1,1), sigma)*alpha
    (base std 1/sqrt(3), smoothing factor ~ 1/(2*sigma*sqrt(pi)))."""
    key = jax.random.PRNGKey(0)
    dx, dy = jax.jit(lambda k: dw.elastic_field(k, 128, 128))(key)
    dx = np.asarray(dx)
    expected_std = 16.0 / (2 * 4.0 * np.sqrt(np.pi)) / np.sqrt(3.0)
    assert abs(dx.mean()) < 0.4
    assert 0.6 * expected_std < dx.std() < 1.4 * expected_std


def test_elastic_full_chain_matches_host():
    """Same displacement field through device remap vs cv2.remap (the host
    elastic_deform body)."""
    import cv2

    h, w = 60, 72
    img = _img(h, w, seed=5)
    lab = (np.arange(h * w, dtype=np.int32).reshape(h, w) % 23)
    rng = np.random.default_rng(6)
    from scipy.ndimage import gaussian_filter

    dx = gaussian_filter(rng.normal(size=(h, w)), 4.0).astype(np.float32) * 16
    dy = gaussian_filter(rng.normal(size=(h, w)), 4.0).astype(np.float32) * 16
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    mx, my = xx + dx, yy + dy
    ref_img = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REFLECT)
    ref_lab = cv2.remap(lab.astype(np.float32), mx, my, cv2.INTER_NEAREST,
                        borderMode=cv2.BORDER_REFLECT).astype(np.int32)

    def dev(im, lb):
        cx, cy = dw.elastic_coords(jnp.asarray(dx), jnp.asarray(dy))
        return (dw.remap_bilinear(im, cx, cy, "reflect"),
                dw.remap_nearest(lb, cx, cy, "reflect"))

    got_img, got_lab = jax.jit(dev)(img, lab)
    assert np.max(np.abs(np.asarray(got_img) - ref_img)) < 1e-5
    mism = (np.asarray(got_lab) != ref_lab)
    assert mism.mean() < 0.005  # half-integer rounding ties only
