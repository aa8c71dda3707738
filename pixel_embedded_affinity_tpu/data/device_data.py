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

import numpy as np

from .consistency import IMAGENET_MEAN, IMAGENET_STD  # noqa: F401 (re-export)


def load_cvppp_arrays(data_folder: str, valid_set: str = "local_20_1",
                      padding: bool = True):
    """Host-side one-time load: returns (images_u8 (N,H,W,3),
    labels_i32 (N,H,W)) for the training split, reflect/constant-padded to
    544x544 exactly like CVPPPTrain.sample (cvppp.py:88-90). Listing +
    valid-split come from CVPPPTrain itself so the two paths can never
    disagree; only the uint8 packing (HBM residency wants u8, the host
    sampler f32) is done here."""
    from .cvppp import CVPPPTrain

    ds = CVPPPTrain(data_folder, valid_set=valid_set, padding=padding,
                    light=True, device_ema=True)
    imgs, labs = [], []
    for n in ds.names:
        img_f32, lab = ds._load(n)  # f32 [0,1] RGB, i32 labels
        img = np.round(img_f32 * 255.0).astype(np.uint8)  # exact u8 inverse
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


# ---------------------------------------------------------------------------
# AC3/AC4 (3D): whole EM volume in HBM, crop + full _augs_mix chain in-jit
# ---------------------------------------------------------------------------


def load_ac3ac4_arrays(data_folder: str, dataset_name: str = "ac4",
                       train_split: int = 80, if_dilate: bool = True,
                       crop_z: int = 18):
    """Host one-time prep: (raw_u8 (D,H,W), label_i32) as AC3AC4Train
    holds them (HDF5 'main', first train_split slices, seg_widen_border,
    z-pad if thinner than the crop). Delegates to AC3AC4Train.__init__ so
    the two paths share one loader."""
    from .ac3ac4 import AC3AC4Train

    ds = AC3AC4Train(data_folder, dataset_name=dataset_name,
                     train_split=train_split, if_dilate=if_dilate,
                     crop_size=(crop_z, 160, 160), light=True,
                     device_ema=True)
    return (np.ascontiguousarray(ds.raw, np.uint8),
            np.ascontiguousarray(ds.label, np.int32))


def _rot90_xy(vol, k):
    """Dynamic rot90 about the xy axes of a (D, H, W) volume, H == W."""
    import jax
    import jax.numpy as jnp

    return jax.lax.switch(
        k,
        [lambda v: v,
         lambda v: jnp.rot90(v, 1, axes=(1, 2)),
         lambda v: jnp.rot90(v, 2, axes=(1, 2)),
         lambda v: jnp.rot90(v, 3, axes=(1, 2))],
        vol)


def _flip_rule4(vol, rule):
    """simple_augment_3d (ac3ac4.py:23): z-flip, x-flip, y-flip,
    xy-transpose bits, on one (D, H, W) volume (H == W)."""
    import jax.numpy as jnp

    r = rule.astype(bool)
    v = jnp.where(r[0], vol[::-1], vol)
    v = jnp.where(r[1], v[:, :, ::-1], v)
    v = jnp.where(r[2], v[:, ::-1, :], v)
    v = jnp.where(r[3], jnp.transpose(v, (0, 2, 1)), v)
    return v


def _grayscale_params(key, contrast_factor=0.3, brightness_factor=0.3):
    """In-jit twin of augment2d.grayscale_params (ELEKTRONN semantics,
    scripts_bbbc039v1/augmentation/grayscale.py:43-73): contrast
    x(1+(u-0.5)*factor), brightness +(u-0.5)*factor, gamma 2**(u*2-1)
    (log-uniform in [0.5, 2])."""
    import jax

    kc, kb, kg = jax.random.split(key, 3)
    c = 1.0 + (jax.random.uniform(kc, ()) - 0.5) * contrast_factor
    b = (jax.random.uniform(kb, ()) - 0.5) * brightness_factor
    g = 2.0 ** (jax.random.uniform(kg, ()) * 2 - 1)
    return c, b, g


def _grayscale_single(img, key, contrast_factor=0.3, brightness_factor=0.3):
    """random_grayscale_adjust (augment2d.py) for one map."""
    import jax.numpy as jnp

    c, b, g = _grayscale_params(key, contrast_factor, brightness_factor)
    out = jnp.clip(img * c + b, 0.0, 1.0)
    return jnp.clip(out ** g, 0.0, 1.0)


def _intensity_3d_single(vol, key, contrast_factor=0.3,
                         brightness_factor=0.3):
    """intensity_augment_3d 'mix' (ac3ac4.py / scripts_ac3ac4/
    augmentation/grayscale.py:29-41): fair 50/50 per-slice params (2D)
    vs one whole-volume set (3D)."""
    import jax
    import jax.numpy as jnp

    km, k2, k3 = jax.random.split(key, 3)
    mode2d = jax.random.bernoulli(km)
    gs = lambda v, k: _grayscale_single(v, k, contrast_factor,
                                        brightness_factor)
    per_slice = jax.vmap(gs)(vol, jax.random.split(k2, vol.shape[0]))
    whole = gs(vol, k3)
    return jnp.where(mode2d, per_slice, whole)


def _missing_section_single(vol, key, max_sections: int = 2):
    """missing_section_augment (ac3ac4.py:77): 1..max z-slices blanked
    (zero) or noise-filled, distinct slices."""
    import jax
    import jax.numpy as jnp

    d = vol.shape[0]
    kn, kz1, kz2, kf1, kf2, ku1, ku2 = jax.random.split(key, 7)
    n = jax.random.randint(kn, (), 1, max_sections + 1)
    z1 = jax.random.randint(kz1, (), 0, d)
    z2r = jax.random.randint(kz2, (), 0, d - 1)
    z2 = jnp.where(z2r >= z1, z2r + 1, z2r)  # distinct from z1

    def fill(v, z, kf, ku, active):
        # independent noise per filled slice, like the host's per-slice
        # rng.random draw (ac3ac4.py:86)
        use_noise = jax.random.bernoulli(kf)
        filled = jnp.where(use_noise, jax.random.uniform(ku, v.shape,
                                                         v.dtype),
                           jnp.zeros_like(v))
        hit = (jnp.arange(d) == z)[:, None, None] & active
        return jnp.where(hit, filled, v)

    vol = fill(vol, z1, kf1, ku1, True)
    vol = fill(vol, z2, kf2, ku2, n >= 2)
    return vol


def _misalign_single(vol, lab, key, max_shift: int = 10):
    """misalign_augment (ac3ac4.py:92): slices z >= z0 rigidly shifted by
    (dy, dx), zero/0-label fill."""
    import jax
    import jax.numpy as jnp

    d, h, w = vol.shape
    kz, ky, kx = jax.random.split(key, 3)
    z0 = jax.random.randint(kz, (), 1, d)
    dy = jax.random.randint(ky, (), -max_shift, max_shift + 1)
    dx = jax.random.randint(kx, (), -max_shift, max_shift + 1)

    ys = jnp.arange(h) - dy
    xs = jnp.arange(w) - dx
    yin = (ys >= 0) & (ys < h)
    xin = (xs >= 0) & (xs < w)
    yc = jnp.clip(ys, 0, h - 1)
    xc = jnp.clip(xs, 0, w - 1)
    inb = yin[:, None] & xin[None, :]

    def shift(a, fill):
        sh = jnp.take(jnp.take(a, yc, axis=1), xc, axis=2)
        sh = jnp.where(inb[None], sh, fill)
        move = (jnp.arange(d) >= z0)[:, None, None]
        return jnp.where(move, sh, a)

    return shift(vol, 0.0), shift(lab, 0)


def _elastic_xy_single(vol, lab, key, alpha: float = 16.0,
                       sigma: float = 4.0):
    """Per-slice elastic in xy with ONE field for all z
    (ac3ac4._augs_mix: same mx/my per slice, cv2.remap constant-0 fill
    per scripts_ac3ac4/augmentation/warp.py:31)."""
    import jax

    from . import device_warp as dw

    h, w = vol.shape[1:]
    dx, dy = dw.elastic_field(key, h, w, alpha, sigma)
    mx, my = dw.elastic_coords(dx, dy)
    img_o = jax.vmap(lambda s: dw.remap_bilinear(s, mx, my, "constant"))(vol)
    lab_o = jax.vmap(lambda s: dw.remap_nearest(s, mx, my, "constant"))(lab)
    return img_o, lab_o


def _augs_mix_jax(img, lab, key, em_aug: bool = True):
    """In-jit mirror of AC3AC4Train._augs_mix (data/ac3ac4.py:252): flips
    p=0.5, rot90 p=0.5, elastic p=0.5, grayscale p=0.5, EM artifacts p=0.2
    (missing-section vs misalign p=0.5). All branches are computed and
    selected (static shapes); img (D,H,W) f32 in [0,1], lab (D,H,W) i32."""
    import jax
    import jax.numpy as jnp

    kg1, kf, kg2, kk, kg3, ke, kg4, ki, kg5, kg6, kem = \
        jax.random.split(key, 11)

    do_flip = jax.random.uniform(kg1) > 0.5
    rule = jax.random.randint(kf, (4,), 0, 2)
    img = jnp.where(do_flip, _flip_rule4(img, rule), img)
    lab = jnp.where(do_flip, _flip_rule4(lab, rule), lab)

    do_rot = jax.random.uniform(kg2) > 0.5
    k = jnp.where(do_rot, jax.random.randint(kk, (), 0, 4), 0)
    img = _rot90_xy(img, k)
    lab = _rot90_xy(lab, k)

    do_el = jax.random.uniform(kg3) < 0.5
    img_e, lab_e = _elastic_xy_single(img, lab, ke)
    img = jnp.where(do_el, img_e, img)
    lab = jnp.where(do_el, lab_e, lab)

    do_gs = jax.random.uniform(kg4) < 0.5
    img = jnp.where(do_gs, _intensity_3d_single(img, ki), img)

    if em_aug:
        do_em = jax.random.uniform(kg5) < 0.2
        miss = jax.random.uniform(kg6) < 0.5
        k_ms, k_ma = jax.random.split(kem)
        img_ms = _missing_section_single(img, k_ms)
        img_ma, lab_ma = _misalign_single(img, lab, k_ma)
        img = jnp.where(do_em, jnp.where(miss, img_ms, img_ma), img)
        lab = jnp.where(do_em & ~miss, lab_ma, lab)
    return img, lab


def sample_ac3ac4(raw_u8, label_i32, key, crop_size=(18, 160, 160),
                  padding: int = 50, aug_prob: float = 0.5):
    """One 3D training sample in-jit, mirroring AC3AC4Train.sample (light
    + device_ema contract): random (cz, cy+2p, cx+2p) crop, p=aug_prob
    _augs_mix, center-crop to crop_size. Returns {'image': (D,H,W,1) f32,
    'seg': (D,H,W) i32}; GT targets and the EMA view are built in-jit
    downstream (train_step_3d device_gt + device_aug.ema_view_3d)."""
    import jax
    import jax.numpy as jnp

    D, H, W = label_i32.shape
    cz, cy, cx = crop_size
    cfo = (cz, cy + 2 * padding, cx + 2 * padding)
    kz, ky, kx, kg, ka = jax.random.split(key, 5)
    rz = jax.random.randint(kz, (), 0, D - cfo[0] + 1)
    ry = jax.random.randint(ky, (), 0, H - cfo[1] + 1)
    rx = jax.random.randint(kx, (), 0, W - cfo[2] + 1)
    img = jax.lax.dynamic_slice(raw_u8, (rz, ry, rx), cfo)
    lab = jax.lax.dynamic_slice(label_i32, (rz, ry, rx), cfo)
    img = img.astype(jnp.float32) / 255.0

    do_aug = jax.random.uniform(kg) < aug_prob
    img_a, lab_a = _augs_mix_jax(img, lab, ka)
    img = jnp.where(do_aug, img_a, img)
    lab = jnp.where(do_aug, lab_a, lab)

    oz, oy, ox = ((cfo[0] - cz) // 2, (cfo[1] - cy) // 2,
                  (cfo[2] - cx) // 2)
    img = jax.lax.dynamic_slice(img, (oz, oy, ox), (cz, cy, cx))
    lab = jax.lax.dynamic_slice(lab, (oz, oy, ox), (cz, cy, cx))
    return {"image": img[..., None], "seg": lab}


def sample_ac3ac4_batch(raw_u8, label_i32, key, batch_size: int,
                        crop_size=(18, 160, 160), padding: int = 50,
                        aug_prob: float = 0.5):
    import jax

    keys = jax.random.split(key, batch_size)
    return jax.vmap(lambda kk: sample_ac3ac4(
        raw_u8, label_i32, kk, crop_size=crop_size, padding=padding,
        aug_prob=aug_prob))(keys)


# ---------------------------------------------------------------------------
# BBBC039V1 (2D nuclei): padded normalized images in HBM, crop + the
# flip/rotate/rescale/elastic/grayscale chain in-jit
# ---------------------------------------------------------------------------


def load_bbbc_arrays(data_folder: str, padding: int = 30):
    """Host one-time prep: TIFF min-max normalized to [0,1] f32, instance
    PNG labels, training split, reflect-padded. Split parsing and image
    loading/normalization delegate to BBBCTrain (data/bbbc.py) so the two
    paths share one loader. Returns (images_f32 (N, H+2p, W+2p),
    labels_i32)."""
    from .bbbc import BBBCTrain

    ds = BBBCTrain(data_folder, padding=padding, light=True,
                   device_ema=True)
    imgs, labs = [], []
    for n in ds.names:
        img, lab = ds._load(n)  # f32 min-max normalized, i32 labels
        imgs.append(np.pad(img, padding, mode="reflect"))
        labs.append(np.pad(lab, padding, mode="reflect"))
    return (np.stack(imgs).astype(np.float32), np.stack(labs))


def _bbbc_aug_jax(img, lab, key):
    """In-jit mirror of the BBBCTrain.sample aug block (data/bbbc.py:88-100)
    on one (crop, crop) f32/i32 pair: flips p=0.5 (each axis p=0.5 inside),
    arbitrary-angle rotation p=0.5, rescale 0.8-1.2 p=0.5, elastic p=0.5,
    grayscale p=0.5. All five gates are 0.5, matching the reference's
    augs_mix (scripts_bbbc039v1/data/data_provider.py:256-267) — its
    augmentors' internal p (e.g. Elastic p=0.75) is consumed only by the
    unused Compose machinery. Sequential resampling exactly like the
    host."""
    import jax
    import jax.numpy as jnp

    from . import device_warp as dw

    h, w = lab.shape
    (kg1, kf1, kf2, kg2, kang, kg3, ksc, kg4, kel, kg5, kgs) = \
        jax.random.split(key, 11)

    do_flip = jax.random.uniform(kg1) > 0.5
    fx = do_flip & (jax.random.uniform(kf1) < 0.5)
    fy = do_flip & (jax.random.uniform(kf2) < 0.5)
    img = jnp.where(fx, img[:, ::-1], img)
    lab = jnp.where(fx, lab[:, ::-1], lab)
    img = jnp.where(fy, img[::-1], img)
    lab = jnp.where(fy, lab[::-1], lab)

    do_rot = jax.random.uniform(kg2) > 0.5
    ang = jax.random.uniform(kang) * 360.0
    mx, my = dw.rotation_coords(ang, h, w)
    img = jnp.where(do_rot, dw.remap_bilinear(img, mx, my, "constant"), img)
    lab = jnp.where(do_rot, dw.remap_nearest(lab, mx, my, "constant"), lab)

    do_sc = jax.random.uniform(kg3) < 0.5
    f = jax.random.uniform(ksc, (), minval=0.8, maxval=1.2)
    mx, my = dw.rescale_coords(f, h, w, h, w)
    img = jnp.where(do_sc, dw.remap_bilinear(img, mx, my, "reflect"), img)
    lab = jnp.where(do_sc, dw.remap_nearest(lab, mx, my, "reflect"), lab)

    do_el = jax.random.uniform(kg4) < 0.5
    dx, dy = dw.elastic_field(kel, h, w, alpha=16.0, sigma=4.0)
    mx, my = dw.elastic_coords(dx, dy)
    # constant-0 out-of-bounds fill per the reference Elastic
    # (scripts_bbbc039v1/augmentation/warp.py:31)
    img = jnp.where(do_el, dw.remap_bilinear(img, mx, my, "constant"), img)
    lab = jnp.where(do_el, dw.remap_nearest(lab, mx, my, "constant"), lab)

    do_gs = jax.random.uniform(kg5) < 0.5
    img = jnp.where(do_gs, _grayscale_single(img, kgs), img)
    return img, lab


def sample_bbbc(images_f32, labels_i32, key, size: int = 256,
                padding: int = 30, aug_prob: float = 0.8):
    """One BBBC training sample in-jit mirroring BBBCTrain.sample (light +
    device_ema contract): pick image, random (size+2p)^2 crop, p=aug_prob
    aug chain, center-crop to size^2, grayscale repeated to 3 channels.
    Returns {'image': (size, size, 3) f32, 'seg': (size, size) i32}."""
    import jax
    import jax.numpy as jnp

    N, Hp, Wp = labels_i32.shape
    crop = size + 2 * padding
    kp, ky, kx, kg, ka = jax.random.split(key, 5)
    k = jax.random.randint(kp, (), 0, N)
    img_full = jnp.take(images_f32, k, axis=0)
    lab_full = jnp.take(labels_i32, k, axis=0)
    ry = jax.random.randint(ky, (), 0, Hp - crop + 1)
    rx = jax.random.randint(kx, (), 0, Wp - crop + 1)
    img = jax.lax.dynamic_slice(img_full, (ry, rx), (crop, crop))
    lab = jax.lax.dynamic_slice(lab_full, (ry, rx), (crop, crop))

    do_aug = jax.random.uniform(kg) < aug_prob
    img_a, lab_a = _bbbc_aug_jax(img, lab, ka)
    img = jnp.where(do_aug, img_a, img)
    lab = jnp.where(do_aug, lab_a, lab)

    o = padding
    img = img[o:o + size, o:o + size]
    lab = lab[o:o + size, o:o + size]
    image = jnp.repeat(img[..., None], 3, axis=-1)
    return {"image": image, "seg": lab}


def sample_bbbc_batch(images_f32, labels_i32, key, batch_size: int,
                      size: int = 256, padding: int = 30,
                      aug_prob: float = 0.8):
    import jax

    keys = jax.random.split(key, batch_size)
    return jax.vmap(lambda kk: sample_bbbc(
        images_f32, labels_i32, kk, size=size, padding=padding,
        aug_prob=aug_prob))(keys)
