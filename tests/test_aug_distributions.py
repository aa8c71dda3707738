"""Distribution-oracle tests: repo augmentation draws vs the reference's
LITERAL numpy expressions.

The r3 verdict found four silent parameter-distribution deviations (gamma
family, contrast width, 3D EMA intensity ranges, elastic noise
distribution) that one-sided device==host parity tests can never catch.
These tests pin the repo — host AND device twins — to the reference
formulas directly:

* Grayscale/IntensityAugment (ELEKTRONN family): ``img *= 1+(u-0.5)*cf;
  img += (u-0.5)*bf; clip; img **= 2.0**(u*2-1)``
  (scripts_bbbc039v1/augmentation/grayscale.py:43-73,
   scripts_ac3ac4/utils/augmentation.py:288-303)
* Elastic displacement field: ``gaussian_filter(rand(h,w)*2-1, sigma) *
  alpha`` — uniform(-1,1) base noise
  (scripts_bbbc039v1/augmentation/warp.py:46-47)
* EMA IntensityAugment(): p=0.5 execution (skiprand < ratio), factors
  0.1, and the as-shipped 'mix' quirk that always resolves to per-slice
  2D (scripts_ac3ac4/utils/augmentation.py:271-296)
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from pixel_embedded_affinity_tpu.data import augment2d
from pixel_embedded_affinity_tpu.data import ac3ac4
from pixel_embedded_affinity_tpu.data import device_aug
from pixel_embedded_affinity_tpu.data import device_data as dd
from pixel_embedded_affinity_tpu.data import device_warp as dw


# ---------------------------------------------------------------------------
# Host twins: EXACT against the reference expression with a shared rng
# ---------------------------------------------------------------------------


def test_host_grayscale_params_match_reference_expression():
    """grayscale_params == the literal ELEKTRONN triple evaluated with the
    same rng draws (grayscale.py:70-73 order: contrast, brightness,
    gamma)."""
    for seed in range(5):
        rng = np.random.default_rng(seed)
        c, b, g = augment2d.grayscale_params(rng, 0.3, 0.3)
        ran = np.random.default_rng(seed).random(3)
        assert c == 1 + (ran[0] - 0.5) * 0.3
        assert b == (ran[1] - 0.5) * 0.3
        assert g == 2.0 ** (ran[2] * 2 - 1)


def test_host_grayscale_adjust_matches_reference_expression():
    """random_grayscale_adjust output == the reference _augment3D body
    (grayscale.py:62-76) run with identical draws."""
    rng = np.random.default_rng(7)
    img = np.random.default_rng(1).random((20, 24)).astype(np.float32)
    got = augment2d.random_grayscale_adjust(img, rng)

    ran = np.random.default_rng(7).random(3)
    ref = img.copy()
    ref *= 1 + (ran[0] - 0.5) * 0.3
    ref += (ran[1] - 0.5) * 0.3
    ref = np.clip(ref, 0, 1)
    ref **= 2.0 ** (ran[2] * 2 - 1)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_host_elastic_field_matches_reference_expression():
    """elastic_field_np == gaussian_filter(rand(h,w)*2-1, sigma)*alpha
    with the same rng (warp.py:46-47)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(3)
    got = augment2d.elastic_field_np(rng, 40, 48, alpha=16.0, sigma=4.0)
    ref = np.float32(gaussian_filter(
        np.random.default_rng(3).random((40, 48)) * 2 - 1, 4.0) * 16.0)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_host_ema_intensity_gate_and_factors():
    """intensity_augment_3d in EMA configuration (mode='2D', factors 0.1):
    per-slice independent params, output within the IntensityAugment(0.1)
    envelope; the p=0.5 gate lives at the _ema_view call site
    (data/ac3ac4.py) per augmentation.py:272-273."""
    rng = np.random.default_rng(11)
    vol = np.full((6, 8, 8), 0.5, np.float32)
    out = ac3ac4.intensity_augment_3d(vol, rng, mode="2D",
                                      contrast_factor=0.1,
                                      brightness_factor=0.1)
    # per-slice params: slices differ
    assert len({float(out[z, 0, 0]) for z in range(6)}) > 1
    # envelope: pre-gamma in [0.425, 0.575], gamma in [0.5, 2]
    lo, hi = 0.425 ** 2.0, 0.575 ** 0.5
    assert out.min() >= lo - 1e-6 and out.max() <= hi + 1e-6


def test_host_train_grayscale_mix_is_fair_and_wholevolume_shares_params():
    """Train Grayscale 'mix' (AC3/AC4): ~50/50 2D/3D; in 3D mode all
    slices share one param triple (grayscale.py:29-41,62-76)."""
    whole = 0
    n = 400
    for seed in range(n):
        rng = np.random.default_rng(seed)
        vol = np.full((4, 4, 4), 0.5, np.float32)
        out = ac3ac4.intensity_augment_3d(vol, rng, mode="mix")
        if len({float(out[z, 0, 0]) for z in range(4)}) == 1:
            whole += 1
    assert 0.4 * n < whole < 0.6 * n


# ---------------------------------------------------------------------------
# Device twins: range endpoints + gamma log-uniformity + field std
# ---------------------------------------------------------------------------


def _ks_uniform(x, lo, hi):
    """KS distance of samples x against U(lo, hi)."""
    x = np.sort((np.asarray(x, np.float64) - lo) / (hi - lo))
    n = len(x)
    cdf = np.arange(1, n + 1) / n
    return float(np.max(np.abs(cdf - x)))


def test_device_grayscale_params_distribution():
    """_grayscale_params (train factors 0.3): contrast endpoints
    [0.85, 1.15], brightness +-0.15, log2(gamma) ~ U(-1, 1)."""
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    draw = jax.jit(jax.vmap(lambda k: dd._grayscale_params(k, 0.3, 0.3)))
    c, b, g = (np.asarray(v) for v in draw(keys))
    assert 0.85 <= c.min() < 0.86 and 1.14 < c.max() <= 1.15
    assert -0.15 <= b.min() < -0.145 and 0.145 < b.max() <= 0.15
    lg = np.log2(g)
    assert -1.0 <= lg.min() < -0.99 and 0.99 < lg.max() <= 1.0
    assert _ks_uniform(lg, -1.0, 1.0) < 0.035
    # the old uniform-gamma [0.7, 1.4] draw can never reach g < 0.7
    assert (g < 0.6).mean() > 0.05


def test_device_ema_intensity3d_params_distribution():
    """ema_intensity_params_3d: gate ~ p=0.5; per-slice (not whole-volume)
    params; contrast [0.95, 1.05], brightness +-0.05, log2(gamma) ~
    U(-1, 1) — IntensityAugment() as shipped."""
    do, c, br, g = (np.asarray(v) for v in jax.jit(
        lambda k: device_aug.ema_intensity_params_3d(k, 2000, 6))(
            jax.random.PRNGKey(1)))
    assert 0.45 < do.mean() < 0.55
    assert 0.95 <= c.min() and c.max() <= 1.05
    assert c.min() < 0.951 and c.max() > 1.049
    assert -0.05 <= br.min() < -0.049 and 0.049 < br.max() <= 0.05
    lg = np.log2(g.ravel())
    assert -1.0 <= lg.min() and lg.max() <= 1.0
    assert _ks_uniform(lg, -1.0, 1.0) < 0.02
    # per-slice: params vary along the slice axis within one sample
    assert np.ptp(c[0, :, 0, 0, 0]) > 0


def test_device_ema_intensity3d_gate_passthrough():
    """Ungated samples are bit-identical to the input (the reference
    returns the untouched array when skiprand >= ratio)."""
    img = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(2), (64, 4, 8, 8, 1)), np.float32)
    out = np.asarray(jax.jit(lambda x, k: device_aug.intensity_3d(x, k))(
        img, jax.random.PRNGKey(3)))
    unchanged = np.array([np.array_equal(out[i], img[i])
                          for i in range(64)])
    assert 10 < unchanged.sum() < 54  # ~50% gate


def test_device_elastic_field_std_matches_reference_expression():
    """Device field std == host/reference expression std on the same
    geometry (uniform(-1,1) base: 1/sqrt(3) of the old N(0,1) draw)."""
    dx, _ = jax.jit(lambda k: dw.elastic_field(k, 160, 160))(
        jax.random.PRNGKey(4))
    rng = np.random.default_rng(5)
    ref = np.stack([augment2d.elastic_field_np(rng, 160, 160)
                    for _ in range(8)])
    dev_std = float(np.asarray(dx).std())
    ref_std = float(ref.std())
    assert abs(dev_std - ref_std) / ref_std < 0.25
