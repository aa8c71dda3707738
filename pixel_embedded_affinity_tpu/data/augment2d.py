"""2D geometric/photometric augmentation (numpy/cv2).

Ports of the reference's torchvision 'xiaoyu' chain
(scripts_cvppp/data/data_provider.py:119-131: HFlip + VFlip +
RandomResizedCrop(scale 0.7-1)) and the pytorch_connectomics-style ops used by
BBBC (top-level augmentation/ package: Flip, Rotate, Rescale, Elastic,
Grayscale). Image and label transform geometrically in lockstep (bilinear vs
nearest).
"""

from __future__ import annotations

import math

import numpy as np


def random_flips(img, label, rng):
    if rng.random() < 0.5:
        img = img[:, ::-1]
        label = label[:, ::-1]
    if rng.random() < 0.5:
        img = img[::-1]
        label = label[::-1]
    return np.ascontiguousarray(img), np.ascontiguousarray(label)


def random_resized_crop(img, label, out_size, rng, scale=(0.7, 1.0),
                        ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop semantics (10 attempts then center)."""
    import cv2

    h, w = label.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            i = int(rng.integers(0, h - ch + 1))
            j = int(rng.integers(0, w - cw + 1))
            break
    else:
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw = w
            ch = int(round(cw / ratio[0]))
        elif in_ratio > ratio[1]:
            ch = h
            cw = int(round(ch * ratio[1]))
        else:
            cw, ch = w, h
        i = (h - ch) // 2
        j = (w - cw) // 2
    img_c = img[i:i + ch, j:j + cw]
    lab_c = label[i:i + ch, j:j + cw]
    img_r = cv2.resize(img_c, (out_size, out_size), interpolation=cv2.INTER_LINEAR)
    lab_r = cv2.resize(lab_c, (out_size, out_size), interpolation=cv2.INTER_NEAREST)
    return img_r, lab_r


def random_rotate90(img, label, rng):
    k = int(rng.integers(0, 4))
    return np.rot90(img, k).copy(), np.rot90(label, k).copy()


def random_rescale(img, label, rng, lo=0.8, hi=1.2):
    """Rescale then center-crop/pad back to the original size."""
    import cv2

    h, w = label.shape[:2]
    f = rng.uniform(lo, hi)
    img_r = cv2.resize(img, (0, 0), fx=f, fy=f, interpolation=cv2.INTER_LINEAR)
    lab_r = cv2.resize(label, (0, 0), fx=f, fy=f, interpolation=cv2.INTER_NEAREST)
    return center_crop_pad(img_r, h, w), center_crop_pad(lab_r, h, w)


def center_crop_pad(x, th, tw):
    h, w = x.shape[:2]
    if h > th:
        o = (h - th) // 2
        x = x[o:o + th]
    if w > tw:
        o = (w - tw) // 2
        x = x[:, o:o + tw]
    h, w = x.shape[:2]
    if h < th or w < tw:
        pad = [( (th - h) // 2, th - h - (th - h) // 2),
               ((tw - w) // 2, tw - w - (tw - w) // 2)]
        pad += [(0, 0)] * (x.ndim - 2)
        x = np.pad(x, pad, mode="reflect" if min(h, w) > 1 else "constant")
    return x


def elastic_deform(img, label, rng, alpha=16.0, sigma=4.0):
    """Elastic deformation via smoothed random displacement field."""
    import cv2
    from scipy.ndimage import gaussian_filter

    h, w = label.shape[:2]
    dx = gaussian_filter(rng.normal(size=(h, w)), sigma).astype(np.float32) * alpha
    dy = gaussian_filter(rng.normal(size=(h, w)), sigma).astype(np.float32) * alpha
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    map_x = xx + dx
    map_y = yy + dy
    img_o = cv2.remap(img, map_x, map_y, interpolation=cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REFLECT)
    lab_o = cv2.remap(label.astype(np.float32), map_x, map_y,
                      interpolation=cv2.INTER_NEAREST,
                      borderMode=cv2.BORDER_REFLECT)
    return img_o, lab_o.astype(label.dtype)


def random_affine(img, label, rng, rotation: float = 10.0,
                  translation: float = 0.1, shear: float = 0.1,
                  zoom=(0.7, 1.0)):
    """torchsample-style RandomAffine chain (dataset/transforms.py:23-105
    parity: rotation +-10deg, translation 0.1, shear 0.1, zoom 0.7-1);
    image bilinear, label nearest, reflect border."""
    import cv2

    h, w = label.shape[:2]
    ang = np.deg2rad(rng.uniform(-rotation, rotation))
    tx = rng.uniform(-translation, translation) * w
    ty = rng.uniform(-translation, translation) * h
    sh = rng.uniform(-shear, shear)
    z = rng.uniform(*zoom)
    cx, cy = w / 2.0, h / 2.0
    # compose: translate(-c) -> zoom -> shear -> rotate -> translate(c + t)
    ca, sa = np.cos(ang), np.sin(ang)
    m_rot = np.array([[ca, -sa], [sa, ca]])
    m_shear = np.array([[1.0, sh], [0.0, 1.0]])
    a = m_rot @ m_shear * z
    offset = np.array([cx + tx, cy + ty]) - a @ np.array([cx, cy])
    mat = np.concatenate([a, offset[:, None]], axis=1).astype(np.float32)
    img_o = cv2.warpAffine(img, mat, (w, h), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_REFLECT)
    lab_o = cv2.warpAffine(label.astype(np.float32), mat, (w, h),
                           flags=cv2.INTER_NEAREST,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    if img_o.ndim == 2:
        img_o = img_o[..., None]
    return img_o, lab_o.astype(label.dtype)


def random_grayscale_adjust(img, rng, contrast=(0.7, 1.3), brightness=(-0.15, 0.15),
                            gamma=(0.7, 1.4)):
    """Intensity jitter (contrast * x + brightness, then gamma), clipped [0,1]."""
    out = img * rng.uniform(*contrast) + rng.uniform(*brightness)
    out = np.clip(out, 0, 1)
    out = out ** rng.uniform(*gamma)
    return np.clip(out, 0, 1)
