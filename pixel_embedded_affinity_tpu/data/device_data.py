"""HBM-resident dataset sampling for the 2D pipelines.

The whole (padded) training set is uploaded to device memory ONCE as a
uint8 image stack + int32 label stack; per-step sample selection, flips,
RandomResizedCrop and ImageNet normalization then run INSIDE the train jit
from a step-folded PRNG key. Per-iteration host->device traffic drops to
zero (the host-sampler path ships ~9.5 MB/iter of f32 image + int32 labels
for CVPPP-544, which on a ~50 MB/s remote-attached link costs ~2x the
jitted step time; see docs/profile_link.py and docs/PERF.md).

Semantics parity with the host chain (CVPPPTrain.sample, reference
scripts_cvppp/data/data_provider.py): HFlip/VFlip each p=0.5, then
torchvision RandomResizedCrop(scale=(0.7,1.0), ratio=(3/4,4/3)) semantics —
10 area/aspect attempts then the deterministic aspect-clamped center
fallback — with cv2 resize conventions (bilinear: src=(dst+0.5)*s-0.5,
clamped; nearest: src=floor(dst*s)). Crop/resize exactness vs the cv2 host
path and box-distribution parity are tested in tests/test_device_data.py.

The dataset stacks live as ordinary replicated device arrays: ~100 MB for
the real CVPPP A1 set (108 x 544x544 uint8 RGB + int32 labels) — far below
one chip's HBM, and replicated per-device under data parallelism so the
in-jit gather is local.
"""

from __future__ import annotations

import math
import os

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def load_cvppp_arrays(data_folder: str, valid_set: str = "local_20_1",
                      padding: bool = True):
    """Host-side one-time load: returns (images_u8 (N,H,W,3),
    labels_i32 (N,H,W)) for the training split, reflect/constant-padded to
    544x544 exactly like CVPPPTrain (cvppp.py:88-90)."""
    import cv2

    d = os.path.join(data_folder, "train")
    names = sorted({f[:8] for f in os.listdir(d) if "rgb" in f})
    valid_file = os.path.join(data_folder, "valid_set", valid_set + ".txt")
    if os.path.exists(valid_file):
        with open(valid_file) as f:
            valid_names = [x.strip() for x in f if x.strip()]
    else:
        valid_names = names[: max(1, len(names) // 5)]
    names = [n for n in names if n not in valid_names]

    imgs, labs = [], []
    for n in names:
        img = cv2.imread(os.path.join(d, n + "_rgb.png"),
                         cv2.IMREAD_COLOR)[:, :, ::-1]
        lab = cv2.imread(os.path.join(d, n + "_label.png"),
                         cv2.IMREAD_UNCHANGED)
        if lab.ndim == 3:
            lab = lab[..., 0]
        if padding:
            img = np.pad(img, ((7, 7), (22, 22), (0, 0)), mode="reflect")
            lab = np.pad(lab, ((7, 7), (22, 22)), mode="constant")
        imgs.append(np.ascontiguousarray(img, np.uint8))
        labs.append(lab.astype(np.int32))
    return np.stack(imgs), np.stack(labs)


def _fallback_box(H: int, W: int, ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop fallback (all 10 attempts failed):
    aspect-clamped center crop — deterministic in (H, W), computed
    statically."""
    in_ratio = W / H
    if in_ratio < ratio[0]:
        cw = W
        ch = int(round(cw / ratio[0]))
    elif in_ratio > ratio[1]:
        ch = H
        cw = int(round(ch * ratio[1]))
    else:
        cw, ch = W, H
    return (H - ch) // 2, (W - cw) // 2, ch, cw


def rrc_box(key, H: int, W: int, scale=(0.7, 1.0), ratio=(3 / 4, 4 / 3)):
    """Sample a RandomResizedCrop box (i, j, ch, cw) in-jit.

    The host loop draws (area, aspect) up to 10 times and keeps the first
    in-bounds pair; here all 10 candidates are drawn at once and the first
    valid one selected — identical distribution (candidates are iid and
    validity depends only on the candidate itself)."""
    import jax
    import jax.numpy as jnp

    k_sc, k_as, k_i, k_j = jax.random.split(key, 4)
    area = float(H * W)
    ta = area * jax.random.uniform(k_sc, (10,), minval=scale[0],
                                   maxval=scale[1])
    aspect = jnp.exp(jax.random.uniform(
        k_as, (10,), minval=math.log(ratio[0]), maxval=math.log(ratio[1])))
    cw = jnp.round(jnp.sqrt(ta * aspect)).astype(jnp.int32)
    ch = jnp.round(jnp.sqrt(ta / aspect)).astype(jnp.int32)
    valid = (cw > 0) & (cw <= W) & (ch > 0) & (ch <= H)
    idx = jnp.argmax(valid)  # first valid attempt
    ok = jnp.any(valid)

    fb_i, fb_j, fb_ch, fb_cw = _fallback_box(H, W, ratio)
    ch = jnp.where(ok, ch[idx], fb_ch)
    cw = jnp.where(ok, cw[idx], fb_cw)
    i = jnp.where(ok, jnp.floor(
        jax.random.uniform(k_i) * (H - ch + 1).astype(jnp.float32)
    ).astype(jnp.int32), fb_i)
    j = jnp.where(ok, jnp.floor(
        jax.random.uniform(k_j) * (W - cw + 1).astype(jnp.float32)
    ).astype(jnp.int32), fb_j)
    return i, j, ch, cw


def crop_resize_bilinear(img, i, j, ch, cw, out: int):
    """Resize the (dynamic) box [i:i+ch, j:j+cw] of img (H,W,C) to
    (out,out,C) f32 with cv2 INTER_LINEAR conventions, without ever
    materializing a dynamically-shaped crop: the box is folded into the
    gather coordinates (separable row/column lerp, static shapes)."""
    import jax.numpy as jnp

    def coords(n, start):
        d = jnp.arange(out, dtype=jnp.float32)
        nf = n.astype(jnp.float32)
        f = jnp.clip((d + 0.5) * nf / out - 0.5, 0.0, nf - 1.0)
        lo = jnp.floor(f).astype(jnp.int32)
        w = f - lo.astype(jnp.float32)
        hi = jnp.minimum(lo + 1, n - 1)
        return start + lo, start + hi, w

    y0, y1, wy = coords(ch, i)
    x0, x1, wx = coords(cw, j)
    imf = img.astype(jnp.float32)
    top = jnp.take(imf, y0, axis=0)
    bot = jnp.take(imf, y1, axis=0)
    imy = top * (1.0 - wy)[:, None, None] + bot * wy[:, None, None]
    left = jnp.take(imy, x0, axis=1)
    right = jnp.take(imy, x1, axis=1)
    return left * (1.0 - wx)[None, :, None] + right * wx[None, :, None]


def crop_resize_nearest(lab, i, j, ch, cw, out: int):
    """Label variant: cv2 INTER_NEAREST (src = floor(dst*scale), clamped)."""
    import jax.numpy as jnp

    def coords(n, start):
        d = jnp.arange(out, dtype=jnp.float32)
        sidx = jnp.floor(d * n.astype(jnp.float32) / out).astype(jnp.int32)
        return start + jnp.minimum(sidx, n - 1)

    return jnp.take(jnp.take(lab, coords(ch, i), axis=0),
                    coords(cw, j), axis=1)


def sample_cvppp(images_u8, labels_i32, key, out: int = 544,
                 scale=(0.7, 1.0), ratio=(3 / 4, 4 / 3),
                 normalize: bool = True):
    """One training sample in-jit: pick an image, flip, RandomResizedCrop,
    ImageNet-normalize. Returns {'image': (out,out,3) f32, 'seg': int32}."""
    import jax
    import jax.numpy as jnp

    N, H, W = labels_i32.shape
    k_pick, k_hf, k_vf, k_box = jax.random.split(key, 4)
    k = jax.random.randint(k_pick, (), 0, N)
    img = jnp.take(images_u8, k, axis=0)
    lab = jnp.take(labels_i32, k, axis=0)

    hf = jax.random.uniform(k_hf) < 0.5
    vf = jax.random.uniform(k_vf) < 0.5
    img = jnp.where(hf, img[:, ::-1], img)
    lab = jnp.where(hf, lab[:, ::-1], lab)
    img = jnp.where(vf, img[::-1], img)
    lab = jnp.where(vf, lab[::-1], lab)

    i, j, ch, cw = rrc_box(k_box, H, W, scale, ratio)
    image = crop_resize_bilinear(img, i, j, ch, cw, out) / 255.0
    seg = crop_resize_nearest(lab, i, j, ch, cw, out)
    if normalize:
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        image = (image - mean) / std
    return {"image": image, "seg": seg}


def sample_cvppp_batch(images_u8, labels_i32, key, batch_size: int,
                       out: int = 544, scale=(0.7, 1.0),
                       ratio=(3 / 4, 4 / 3), normalize: bool = True):
    """Batch of iid samples (vmapped over per-sample keys)."""
    import jax

    keys = jax.random.split(key, batch_size)
    return jax.vmap(lambda kk: sample_cvppp(
        images_u8, labels_i32, kk, out=out, scale=scale, ratio=ratio,
        normalize=normalize))(keys)
