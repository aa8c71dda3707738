"""Device-side (in-jit) EMA-view generation.

The reference builds the perturbed EMA view on the host per sample
(scripts_cvppp/data/data_provider.py:241-261, scripts_ac3ac4/data/
data_provider_labeled_deep.py:276-316) and ships a second full image per
batch. On a 1-core host feeding a TPU through a tunnel that is both CPU
time and 2x the image transfer. Everything the EMA view needs is
elementwise math + a handful of random scalars, so this module generates it
INSIDE the train jit from the clean image and a PRNG key folded with the
step counter: the host ships one image, no EMA view, no rules.

Semantics parity (distribution-level, behavior-tested):
* intensity: ~ utils/consistency_aug.py add_intensity (2D: contrast/
  brightness +-0.05) and scripts_ac3ac4 IntensityAugment() (3D: p=0.5
  gate, per-slice-always 'mix' quirk, contrast x[0.95,1.05], brightness
  +-0.05, gamma 2**U(-1,1))
* cutout:   ~ add_mask (2D: 0-20 squares <=20px inside the FG bbox filled
  with the per-channel FG mean) and gen_mask (3D: 0-60 boxes <=7x20x20
  zero-filled)
* flips:    ~ Filp_EMA rules (2D 3-bit: x, y, transpose; 3D 4-bit:
  z, x, y, transpose), exactly inverted by
  consistency.convert_consistency_flip_jax* in the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# 2D (CVPPP / BBBC): image (B, H, W, C) in [0, 1]
# ---------------------------------------------------------------------------


def add_intensity_2d(img, key, contrast_factor=0.1, brightness_factor=0.1):
    """out = clip(img * (1 + (u-0.5)*cf) + (v-0.5)*bf) per sample."""
    b = img.shape[0]
    ku, kv = jax.random.split(key)
    u = jax.random.uniform(ku, (b, 1, 1, 1), img.dtype)
    v = jax.random.uniform(kv, (b, 1, 1, 1), img.dtype)
    out = img * (1 + (u - 0.5) * contrast_factor)
    out = out + (v - 0.5) * brightness_factor
    return jnp.clip(out, 0, 1)


def add_gauss_noise_2d(img, key, min_std=0.0, max_std=0.05):
    """~ consistency.add_gauss_noise (utils/consistency_aug.py:24-40
    semantics): per-sample std ~ U[min,max], ONE (H, W) noise field
    broadcast over channels, clip to [0, 1]."""
    b, h, w, _ = img.shape
    ks, kn = jax.random.split(key)
    std = jax.random.uniform(ks, (b, 1, 1, 1), img.dtype, min_std, max_std)
    noise = jax.random.normal(kn, (b, h, w, 1), img.dtype) * std
    return jnp.clip(img + noise, 0, 1)


def add_gauss_blur_2d(img, key, max_kernel_size=7, min_sigma=0.0,
                      max_sigma=1.0):
    """~ consistency.add_gauss_blur (cv2.GaussianBlur semantics): per
    sample, kernel size k ~ odd U{1..max_kernel_size} and sigma ~
    U[min,max]; separable gaussian with REFLECT_101 borders. k = 1 is the
    identity, like cv2. Branchless over k: taps beyond the drawn radius
    are zeroed before normalization."""
    b = img.shape[0]
    r = max_kernel_size // 2
    kk, ks = jax.random.split(key)
    half = jax.random.randint(kk, (b,), 0, r + 1)  # kernel = 2*half + 1
    sigma = jax.random.uniform(ks, (b,), img.dtype, min_sigma, max_sigma)
    return _gauss_blur_2d(img, half, sigma, r)


def _gauss_blur_2d(img, half, sigma, r):
    """Separable gaussian blur with per-sample kernel radius ``half`` (<= r)
    and ``sigma``; cv2.GaussianBlur-exact (incl. the sigma<=0 size-derived
    fallback and REFLECT_101 borders). Split out for direct parity tests."""
    ksz = (2 * half + 1).astype(img.dtype)
    sig = jnp.where(sigma > 0, sigma, 0.3 * ((ksz - 1) * 0.5 - 1) + 0.8)
    x = jnp.arange(-r, r + 1, dtype=img.dtype)  # (2r+1,)
    wts = jnp.exp(-(x[None, :] ** 2) / (2 * sig[:, None] ** 2))
    wts = jnp.where(jnp.abs(x[None, :]) <= half[:, None], wts, 0.0)
    wts = wts / wts.sum(axis=1, keepdims=True)  # (B, 2r+1)

    def pass_axis(e, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (r, r)
        ep = jnp.pad(e, pad, mode="reflect")  # REFLECT_101
        out = jnp.zeros_like(e)
        n = e.shape[axis]
        for d in range(2 * r + 1):
            sl = [slice(None)] * 4
            sl[axis] = slice(d, d + n)
            out = out + wts[:, d][:, None, None, None] * ep[tuple(sl)]
        return out

    out = pass_axis(img, 1)
    out = pass_axis(out, 2)
    return jnp.clip(out, 0, 1)


def add_mask_2d(img, fg_bhw, key, max_counts=20, max_size=20):
    """Fill `counts` random size^2 squares inside the FG bbox with the
    per-channel FG mean (consistency_aug.py:75-90 semantics)."""
    b, h, w, c = img.shape
    fg = fg_bhw.astype(img.dtype)
    any_row = jnp.any(fg_bhw > 0, axis=2)  # (B, H)
    any_col = jnp.any(fg_bhw > 0, axis=1)  # (B, W)
    has_fg = jnp.any(any_row, axis=1)
    x0 = jnp.argmax(any_row, axis=1)
    x1 = h - 1 - jnp.argmax(any_row[:, ::-1], axis=1)
    y0 = jnp.argmax(any_col, axis=1)
    y1 = w - 1 - jnp.argmax(any_col[:, ::-1], axis=1)

    kc, ks, ky, kx = jax.random.split(key, 4)
    counts = jax.random.randint(kc, (b,), 0, max_counts + 1)
    size = jax.random.randint(ks, (b,), 0, max_size + 1)
    # reference gate: squares only when x1 - size > x0 and y1 - size > y0
    can = (x1 - size > x0) & (y1 - size > y0) & has_fg
    my = jax.random.randint(ky, (b, max_counts), x0[:, None],
                            jnp.maximum(x1 - size, x0 + 1)[:, None])
    mx = jax.random.randint(kx, (b, max_counts), y0[:, None],
                            jnp.maximum(y1 - size, y0 + 1)[:, None])
    active = (jnp.arange(max_counts)[None] < counts[:, None]) & can[:, None]

    def body(i, m):
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]
        inside = ((yy >= my[:, i][:, None, None])
                  & (yy < (my[:, i] + size)[:, None, None])
                  & (xx >= mx[:, i][:, None, None])
                  & (xx < (mx[:, i] + size)[:, None, None]))
        inside = inside & active[:, i][:, None, None]
        return jnp.where(inside, jnp.zeros_like(m), m)

    mask = jax.lax.fori_loop(0, max_counts, body,
                             jnp.ones((b, h, w), img.dtype))
    denom = jnp.maximum(fg.sum(axis=(1, 2)), 1.0)
    means = (img * fg[..., None]).sum(axis=(1, 2)) / denom[:, None]  # (B, C)
    m = mask[..., None]
    return img * m + (1 - m) * means[:, None, None, :]


def flip_2d(img, rules_b3):
    """Forward 3-bit flip (x, y, transpose) on NHWC; H == W for rule 2.
    Inverse of consistency.convert_consistency_flip_jax."""
    r = rules_b3.astype(bool)
    e = img
    e = jnp.where(r[:, 0][:, None, None, None], e[:, :, ::-1], e)
    e = jnp.where(r[:, 1][:, None, None, None], e[:, ::-1], e)
    et = jnp.transpose(e, (0, 2, 1, 3))
    e = jnp.where(r[:, 2][:, None, None, None], et, e)
    return e


def ema_view_2d(img, fg_bhw, key, *, noise=False, blur=False,
                intensity=True, mask=True, flip=True):
    """Clean [0,1] image -> (ema_image, rules). One call inside the train
    jit replaces the host EMA pipeline + its transfer. Perturbation order
    matches the host (data/cvppp.py build_cvppp_light / reference
    data_provider.py:241-261): noise -> blur -> intensity -> mask ->
    flip. noise/blur default off, as in the reference configs."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    ema = img
    if noise:
        ema = add_gauss_noise_2d(ema, k4)
    if blur:
        ema = add_gauss_blur_2d(ema, k5)
    if intensity:
        ema = add_intensity_2d(ema, k1)
    if mask:
        ema = add_mask_2d(ema, fg_bhw, k2)
    if flip:
        rules = jax.random.bernoulli(k3, 0.5, (img.shape[0], 3)).astype(
            jnp.float32)
        ema = flip_2d(ema, rules)
    else:
        rules = jnp.zeros((img.shape[0], 3), jnp.float32)
    return ema, rules


# ---------------------------------------------------------------------------
# 3D (AC3/AC4): image (B, D, H, W, 1) in [0, 1]
# ---------------------------------------------------------------------------


def ema_intensity_params_3d(key, b, d, dtype=jnp.float32,
                            contrast_factor=0.1, brightness_factor=0.1,
                            exec_ratio=0.5):
    """Parameter draws for the 3D EMA intensity jitter, exposed for
    distribution-oracle tests. Returns (do, c, br, g): do (B,1,1,1,1)
    bool execution gate (p=exec_ratio), and per-slice (B,D,1,1,1)
    contrast x(1+(u-0.5)*factor), brightness +(u-0.5)*factor, gamma
    2**(u*2-1) (log-uniform in [0.5, 2])."""
    ks, kc, kb, kg = jax.random.split(key, 4)
    do = jax.random.uniform(ks, (b, 1, 1, 1, 1)) < exec_ratio
    shape2d = (b, d, 1, 1, 1)

    def draw(k):
        return jax.random.uniform(k, shape2d, dtype)

    c = 1.0 + (draw(kc) - 0.5) * contrast_factor
    br = (draw(kb) - 0.5) * brightness_factor
    g = 2.0 ** (draw(kg) * 2 - 1)
    return do, c, br, g


def intensity_3d(img, key, contrast_factor=0.1, brightness_factor=0.1,
                 exec_ratio=0.5):
    """IntensityAugment() parity (scripts_ac3ac4/utils/augmentation.py:
    249-303): executes per sample with p=exec_ratio (skiprand < ratio);
    the as-shipped 'mix' rule can never select 3D (3D needs skiprand >
    0.75 but the branch runs only when skiprand < 0.5), so params are
    ALWAYS per-slice (2D mode): per slice, contrast x(1+(u-0.5)*0.1),
    brightness +(u-0.5)*0.1, clip, gamma 2**(u*2-1)."""
    b, d = img.shape[0], img.shape[1]
    do, c, br, g = ema_intensity_params_3d(
        key, b, d, img.dtype, contrast_factor, brightness_factor,
        exec_ratio)
    out = jnp.clip(img * c + br, 0, 1)
    out = jnp.clip(out ** g, 0, 1)
    return jnp.where(do, out, img)


def cutout_3d(img, key, max_counts=60, min_size=(5, 10, 10),
              max_size=(10, 20, 20)):
    """gen_mask semantics: counts ~ U{0..60} boxes, ONE (sz, sxy) size pair
    per sample, boxes zero the image."""
    b, d, h, w = img.shape[:4]
    kc, kz, ks, kmz, kmy, kmx = jax.random.split(key, 6)
    counts = jax.random.randint(kc, (b,), 0, max_counts + 1)
    sz = jax.random.randint(kz, (b,), min_size[0], max_size[0] + 1)
    sxy = jax.random.randint(ks, (b,), min_size[1], max_size[1] + 1)
    mz = jax.random.randint(kmz, (b, max_counts), 0,
                            jnp.maximum(d - sz, 1)[:, None])
    my = jax.random.randint(kmy, (b, max_counts), 0,
                            jnp.maximum(h - sxy, 1)[:, None])
    mx = jax.random.randint(kmx, (b, max_counts), 0,
                            jnp.maximum(w - sxy, 1)[:, None])
    active = jnp.arange(max_counts)[None] < counts[:, None]

    zz = jnp.arange(d)[None, :, None, None]
    yy = jnp.arange(h)[None, None, :, None]
    xx = jnp.arange(w)[None, None, None, :]

    def body(i, m):
        inside = ((zz >= mz[:, i][:, None, None, None])
                  & (zz < (mz[:, i] + sz)[:, None, None, None])
                  & (yy >= my[:, i][:, None, None, None])
                  & (yy < (my[:, i] + sxy)[:, None, None, None])
                  & (xx >= mx[:, i][:, None, None, None])
                  & (xx < (mx[:, i] + sxy)[:, None, None, None]))
        inside = inside & active[:, i][:, None, None, None]
        return jnp.where(inside, jnp.zeros_like(m), m)

    mask = jax.lax.fori_loop(0, max_counts, body,
                             jnp.ones((b, d, h, w), img.dtype))
    return img * mask[..., None]


def flip_3d_rule4(img, rules_b4):
    """Forward 4-bit flip (z, x, y, transpose) on NDHWC; H == W for bit 3.
    Inverse of ac3ac4.convert_consistency_flip_jax_3d_rule4."""
    r = rules_b4.astype(bool)
    e = img
    e = jnp.where(r[:, 0][:, None, None, None, None], e[:, ::-1], e)
    e = jnp.where(r[:, 1][:, None, None, None, None], e[:, :, :, ::-1], e)
    e = jnp.where(r[:, 2][:, None, None, None, None], e[:, :, ::-1], e)
    et = jnp.transpose(e, (0, 1, 3, 2, 4))
    e = jnp.where(r[:, 3][:, None, None, None, None], et, e)
    return e


def ema_view_3d(img, key, *, intensity=True, mask=True, flip=True):
    """Clean [0,1] volume -> (ema_image, rules_b4), all in-jit."""
    k1, k2, k3 = jax.random.split(key, 3)
    ema = img
    if intensity:
        ema = intensity_3d(ema, k1)
    if mask:
        ema = cutout_3d(ema, k2)
    if flip:
        rules = jax.random.bernoulli(k3, 0.5, (img.shape[0], 4)).astype(
            jnp.float32)
        ema = flip_3d_rule4(ema, rules)
    else:
        rules = jnp.zeros((img.shape[0], 4), jnp.float32)
    return ema, rules
