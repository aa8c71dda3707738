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


def random_rotate(img, label, rng):
    """Continuous rotation by rand()*360 degrees about the center
    (scripts_bbbc039v1/augmentation/rotation.py:40-57 parity:
    cv2.getRotationMatrix2D, image bilinear, label nearest, constant
    border). Constant-filled corners survive the caller's center-crop at
    most angles — matching the reference, which rotates the same-sized
    tile (its sqrt(2) sample_params ratio is consumed only by the unused
    Compose machinery)."""
    import cv2

    h, w = label.shape[:2]
    ang = float(rng.random()) * 360.0
    m = cv2.getRotationMatrix2D((h / 2, w / 2), ang, 1)
    img_o = cv2.warpAffine(img, m, (h, w), 1.0, flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT)
    lab_o = cv2.warpAffine(label.astype(np.float32), m, (h, w), 1.0,
                           flags=cv2.INTER_NEAREST,
                           borderMode=cv2.BORDER_CONSTANT)
    if img_o.ndim == 2 and img.ndim == 3:
        img_o = img_o[..., None]
    return img_o, lab_o.astype(label.dtype)


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


def elastic_field_np(rng, h, w, alpha=16.0, sigma=4.0):
    """One displacement component: ``gaussian_filter(rand(h,w)*2-1, sigma)
    * alpha`` — the reference's literal expression with **uniform(-1,1)**
    base noise (scripts_bbbc039v1/augmentation/warp.py:46-47). Shared by
    elastic_deform and the AC3/AC4 per-slice elastic so the distribution
    can never drift between pipelines."""
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(rng.random((h, w)) * 2 - 1,
                           sigma).astype(np.float32) * alpha


def elastic_deform(img, label, rng, alpha=16.0, sigma=4.0):
    """Elastic deformation via smoothed random displacement field
    (scripts_bbbc039v1/augmentation/warp.py:38-79 parity: uniform(-1,1)
    base noise, gaussian sigma, constant-0 out-of-bounds fill; dx drawn
    before dy)."""
    import cv2

    h, w = label.shape[:2]
    dx = elastic_field_np(rng, h, w, alpha, sigma)
    dy = elastic_field_np(rng, h, w, alpha, sigma)
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    map_x = xx + dx
    map_y = yy + dy
    img_o = cv2.remap(img, map_x, map_y, interpolation=cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_CONSTANT)
    lab_o = cv2.remap(label.astype(np.float32), map_x, map_y,
                      interpolation=cv2.INTER_NEAREST,
                      borderMode=cv2.BORDER_CONSTANT)
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


def grayscale_params(rng, contrast_factor=0.3, brightness_factor=0.3):
    """Draw one (contrast, brightness, gamma) triple with the ELEKTRONN
    semantics of the reference Grayscale/IntensityAugment family
    (scripts_bbbc039v1/augmentation/grayscale.py:43-73,
    scripts_ac3ac4/utils/augmentation.py:288-303): contrast
    x(1 + (u-0.5)*factor), brightness +(u-0.5)*factor, gamma
    2**(u*2-1) (log-uniform in [0.5, 2]); draw order contrast ->
    brightness -> gamma."""
    c = 1.0 + (rng.random() - 0.5) * contrast_factor
    b = (rng.random() - 0.5) * brightness_factor
    g = 2.0 ** (rng.random() * 2 - 1)
    return c, b, g


def random_grayscale_adjust(img, rng, contrast_factor=0.3,
                            brightness_factor=0.3):
    """Intensity jitter: x*c + b, clip [0,1], then gamma (the reference's
    Grayscale._augment3D body, grayscale.py:62-76; gamma of [0,1] stays in
    [0,1] so the trailing clip is a no-op kept for float safety)."""
    c, b, g = grayscale_params(rng, contrast_factor, brightness_factor)
    out = np.clip(img * c + b, 0, 1)
    return np.clip(out ** g, 0, 1)


# ---------------------------------------------------------------------------
# pytorch_connectomics-style stack augmentations (reference augmentation/
# package: cutblur.py, cutnoise.py, mixup.py, motion_blur.py,
# missing_parts.py). All operate on a (Z, Y, X) image stack in [0, 1]
# (Z may be 1 for the 2D pipelines) and leave labels untouched.
# ---------------------------------------------------------------------------

def _random_region(vol_len, rng, length_ratio):
    cuboid_len = int(length_ratio * vol_len)
    low = int(rng.integers(0, max(vol_len - cuboid_len, 1)))
    return low, low + cuboid_len


def _resize_nd(vol, out_shape, order, anti_alias):
    """skimage.transform.resize-equivalent on scipy: optional gaussian
    anti-alias prefilter (sigma = (downscale - 1)/2 per axis, skimage's
    default) + spline zoom."""
    from scipy.ndimage import gaussian_filter, zoom

    in_shape = np.asarray(vol.shape, np.float64)
    out_shape = np.asarray(out_shape, np.float64)
    factors = in_shape / np.maximum(out_shape, 1)
    src = vol
    if anti_alias:
        sigma = np.maximum(0.0, (factors - 1) / 2)
        if np.any(sigma > 0):
            src = gaussian_filter(vol.astype(np.float64), sigma,
                                  mode="reflect")
    z = out_shape / in_shape
    out = zoom(src.astype(np.float64), z, order=order, mode="reflect",
               grid_mode=True)
    return out


def cutblur(stack, rng, length_ratio=0.25, down_ratio_min=2.0,
            down_ratio_max=8.0, downsample_z=False):
    """CutBlur (arXiv:2004.00448, reference augmentation/cutblur.py:5-78):
    a random cuboid is bilinearly downsampled by a random ratio (with
    anti-alias prefilter) and nearest-upsampled back, forcing learned
    super-resolution."""
    stack = stack.copy()
    zdim = stack.shape[0]
    if zdim > 1:
        zl, zh = _random_region(zdim, rng, length_ratio)
    yl, yh = _random_region(stack.shape[1], rng, length_ratio)
    xl, xh = _random_region(stack.shape[2], rng, length_ratio)
    region = (slice(None) if zdim == 1 else slice(zl, zh),
              slice(yl, yh), slice(xl, xh))
    temp = stack[region]
    down = float(rng.uniform(down_ratio_min, down_ratio_max))
    if zdim > 1 and downsample_z:
        out_shape = (np.array(temp.shape) / down).astype(int)
    else:
        out_shape = (np.array(temp.shape)
                     / np.array([1, down, down])).astype(int)
    small = _resize_nd(temp, out_shape, order=1, anti_alias=True)
    up = _resize_nd(small, temp.shape, order=0, anti_alias=False)
    stack[region] = np.clip(up, 0, 1).astype(stack.dtype)
    return stack


def cutnoise(stack, rng, length_ratio=0.25, scale=0.2):
    """CutNoise (reference augmentation/cutnoise.py): uniform noise added to
    a random cuboid, clipped to [0, 1]."""
    stack = stack.copy()
    zl, zh = _random_region(stack.shape[0], rng, length_ratio)
    yl, yh = _random_region(stack.shape[1], rng, length_ratio)
    xl, xh = _random_region(stack.shape[2], rng, length_ratio)
    temp = stack[zl:zh, yl:yh, xl:xh]
    noise = rng.uniform(-scale, scale, temp.shape)
    stack[zl:zh, yl:yh, xl:xh] = np.clip(temp + noise, 0, 1)
    return stack


def mixup_batch(batch, rng, min_ratio=0.7, max_ratio=0.9, num_aug=2):
    """Mixup over the leading batch axis (reference augmentation/mixup.py):
    num_aug random samples are blended with another random sample at a
    ratio in [min_ratio, max_ratio]."""
    batch = batch.copy()
    num_vol = batch.shape[0]
    num_aug = min(num_aug, num_vol)
    major = rng.choice(num_vol, size=num_aug, replace=False)
    for i in major:
        others = [j for j in range(num_vol) if j != i]
        j = int(rng.choice(others))
        ratio = float(rng.uniform(min_ratio, max_ratio))
        batch[i] = batch[i] * ratio + batch[j] * (1 - ratio)
    return batch


def motion_blur(stack, rng, sections=2, kernel_size=11):
    """Motion blur on random z sections (reference
    augmentation/motion_blur.py): a horizontal or vertical length-k mean
    kernel (reflect border, cv2.filter2D semantics)."""
    from scipy.ndimage import uniform_filter1d

    stack = stack.copy()
    axis = 1 if rng.random() > 0.5 else 0  # horizontal kernel blurs along x
    k = min(sections, stack.shape[0])
    selected = rng.choice(stack.shape[0], size=k, replace=True)
    for idx in selected:
        stack[idx] = uniform_filter1d(stack[idx], kernel_size, axis=axis,
                                      mode="reflect")
    return stack


def missing_parts(stack, rng, iterations=40, deformation_strength=0, p=0.5):
    """Missing-parts augmentation (reference augmentation/missing_parts.py):
    per z-slice (gated at probability p, skipping the 2 slices after an
    augmented one), a random cross-slice line is drawn, the two half-planes
    are optionally compressed toward it (deformation_strength > 0), and the
    dilated line band is filled with the slice mean. The reference's final
    reshape assumes square slices; this implementation handles any shape."""
    out = stack.copy()
    i = 0
    while i < stack.shape[0]:
        if rng.random() < p:
            out[i] = _missing_parts_slice(stack[i], rng, iterations,
                                          deformation_strength)
            i += 2  # at most one deformed slice in any 3 consecutive
        i += 1
    return out


def _bresenham_line(x0, y0, x1, y1):
    """Integer line rasterization (skimage.draw.line semantics)."""
    steep = abs(y1 - y0) > abs(x1 - x0)
    if steep:
        x0, y0, x1, y1 = y0, x0, y1, x1
    swapped = x0 > x1
    if swapped:
        x0, y0, x1, y1 = x1, y1, x0, y0
    dx = x1 - x0
    dy = abs(y1 - y0)
    err = dx / 2.0
    ystep = 1 if y0 < y1 else -1
    y = y0
    rr, cc = [], []
    for x in range(x0, x1 + 1):
        if steep:
            rr.append(y)
            cc.append(x)
        else:
            rr.append(x)
            cc.append(y)
        err -= dy
        if err < 0:
            y += ystep
            err += dx
    return np.asarray(rr), np.asarray(cc)


def _missing_parts_slice(img, rng, iterations, strength):
    from scipy.ndimage import binary_dilation, label as cc_label
    from scipy.ndimage import map_coordinates

    h, w = img.shape[:2]
    fixed_x = rng.random() < 0.5
    if fixed_x:
        x0, y0 = 0, int(rng.integers(1, w - 2))
        x1, y1 = h - 1, int(rng.integers(1, w - 2))
    else:
        x0, y0 = int(rng.integers(1, h - 2)), 0
        x1, y1 = int(rng.integers(1, h - 2)), w - 1
    line_mask = np.zeros((h, w), bool)
    rr, cc = _bresenham_line(x0, y0, x1, y1)
    line_mask[rr, cc] = True

    section = img.astype(np.float64)
    mean = section.mean()
    if strength > 0:
        lv = np.array([x1 - x0, y1 - y0], np.float32)
        lv /= np.linalg.norm(lv)
        nv = np.array([-lv[1], lv[0]])
        comp, n = cc_label(~line_mask)
        neg_val = comp[0, 0] if fixed_x else comp[-1, -1]
        pos_val = comp[-1, -1] if fixed_x else comp[0, 0]
        flow_x = np.zeros((h, w))
        flow_y = np.zeros((h, w))
        flow_x[comp == pos_val] = strength * nv[1]
        flow_y[comp == pos_val] = strength * nv[0]
        flow_x[comp == neg_val] = -strength * nv[1]
        flow_y[comp == neg_val] = -strength * nv[0]
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        section = map_coordinates(section, ((y + flow_y).reshape(-1, 1),
                                            (x + flow_x).reshape(-1, 1)),
                                  mode="constant", order=3).reshape(h, w)
        section = np.clip(section, 0.0, 1.0)
    band = binary_dilation(line_mask, iterations=iterations)
    section[band] = mean
    return section.astype(img.dtype)
