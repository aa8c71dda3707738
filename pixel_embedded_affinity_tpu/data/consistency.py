"""EMA-view machinery: perturbations + 3-bit flip rules.

Host side (numpy, channels-last HWC) ports of
scripts_cvppp/utils/consistency_aug.py and data/data_consistency.py, plus a
vectorized in-jit un-flip (``convert_consistency_flip_jax``) so the training
step stays a single compiled program: per-sample flipped variants are computed
once and selected with where() instead of Python branching.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_imagenet(img_hwc: np.ndarray) -> np.ndarray:
    return ((img_hwc.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD)


def denormalize_imagenet(img_hwc: np.ndarray) -> np.ndarray:
    return img_hwc * IMAGENET_STD + IMAGENET_MEAN


def simple_augment(data_hwc: np.ndarray, rule) -> np.ndarray:
    """Apply 3-bit rule (x-flip, y-flip, xy-transpose) to an HWC image."""
    if rule[0]:
        data_hwc = data_hwc[:, ::-1]
    if rule[1]:
        data_hwc = data_hwc[::-1]
    if rule[2]:
        data_hwc = np.transpose(data_hwc, (1, 0, 2))
    return data_hwc


def simple_augment_reverse(data_hwc: np.ndarray, rule) -> np.ndarray:
    if rule[2]:
        data_hwc = np.transpose(data_hwc, (1, 0, 2))
    if rule[1]:
        data_hwc = data_hwc[::-1]
    if rule[0]:
        data_hwc = data_hwc[:, ::-1]
    return data_hwc


def flip_ema_rule(rng: np.random.Generator):
    return rng.integers(0, 2, size=3).astype(np.float32)


def convert_consistency_flip_jax(emb_bhwc, rules_b3):
    """Un-flip per-sample EMA embeddings inside jit (NHWC, H == W for rule 2).

    Inverse of simple_augment: transpose, then y-flip, then x-flip, each
    applied where the sample's rule bit is set.
    """
    import jax.numpy as jnp

    r = rules_b3.astype(bool)
    e = emb_bhwc
    et = jnp.transpose(e, (0, 2, 1, 3))
    e = jnp.where(r[:, 2][:, None, None, None], et, e)
    e = jnp.where(r[:, 1][:, None, None, None], e[:, ::-1], e)
    e = jnp.where(r[:, 0][:, None, None, None], e[:, :, ::-1], e)
    return e


def convert_consistency_flip_jax_3d(emb_bdhwc, rules_b3):
    """3D variant: x/y flips + xy transpose on (B, D, H, W, C)."""
    import jax.numpy as jnp

    r = rules_b3.astype(bool)
    e = emb_bdhwc
    et = jnp.transpose(e, (0, 1, 3, 2, 4))
    e = jnp.where(r[:, 2][:, None, None, None, None], et, e)
    e = jnp.where(r[:, 1][:, None, None, None, None], e[:, :, ::-1], e)
    e = jnp.where(r[:, 0][:, None, None, None, None], e[:, :, :, ::-1], e)
    return e


# --------------------------------------------------------------------------
# EMA-view photometric perturbations (on de-normalized [0,1] HWC images)
# --------------------------------------------------------------------------

def add_gauss_noise(img_hwc, rng, min_std=0.0, max_std=0.05):
    std = rng.uniform(min_std, max_std) if max_std > min_std else min_std
    noise = rng.normal(0, std, img_hwc.shape[:2])[..., None]
    return np.clip(img_hwc + noise, 0, 1)


def add_gauss_blur(img_hwc, rng, max_kernel_size=7, min_sigma=0.0, max_sigma=1.0):
    import cv2

    k = int(rng.integers(0, max_kernel_size // 2 + 1)) * 2 + 1
    sigma = rng.uniform(min_sigma, max_sigma)
    out = cv2.GaussianBlur(img_hwc, (k, k), sigma)
    if out.ndim == 2:
        out = out[..., None]
    return np.clip(out, 0, 1)


def add_intensity(img_hwc, rng, contrast_factor=0.1, brightness_factor=0.1):
    out = img_hwc * (1 + (rng.random() - 0.5) * contrast_factor)
    out = out + (rng.random() - 0.5) * brightness_factor
    return np.clip(out, 0, 1)


def add_mask(img_hwc, label_mask, rng, min_counts=0, max_counts=20,
             min_size=0, max_size=20):
    """Fill up to 20 random squares inside the FG bbox with the per-channel FG
    mean (consistency_aug.py:75-90)."""
    xs, ys = np.where(label_mask == 1)
    if len(xs) == 0:
        return img_hwc
    x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()
    counts = int(rng.integers(min_counts, max_counts + 1))
    size = int(rng.integers(min_size, max_size + 1))
    mask = np.ones(img_hwc.shape[:2], dtype=np.float32)
    if x1 - size > x0 and y1 - size > y0:
        for _ in range(counts):
            my = int(rng.integers(x0, max(x1 - size, x0 + 1)))
            mx = int(rng.integers(y0, max(y1 - size, y0 + 1)))
            mask[my:my + size, mx:mx + size] = 0
    fg = label_mask[..., None].astype(np.float32)
    denom = max(label_mask.sum(), 1)
    means = (img_hwc * fg).sum(axis=(0, 1)) / denom
    return img_hwc * mask[..., None] + (1 - mask[..., None]) * means
