"""AC3/AC4 EM-volume dataset pipeline (3D, channels-last numpy).

Reproduces scripts_ac3ac4/data/data_provider_labeled_deep.py: HDF5 volumes
('main' dataset), first train_split slices, seg_widen_border label dilation,
random crop (18, 160+2*pad, 160+2*pad), p=0.5 augmentation mix (flip /
rotate90 / rescale / elastic / grayscale in xy), center-crop to (18,160,160),
xy-only label pyramids, 12-channel GT affinities (seg_to_aff per shift group),
per-channel weight_binary_ratio, EMA view = intensity aug + 3D cutout
(gen_mask 0-60 boxes) + 4-bit flip rule (z, x, y, xy-transpose).
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import weight_binary_ratio, seg_widen_border, label_pyramid
from ..ops.affinity_np import seg_to_aff_3d, seg_to_aff_3d_12ch
from .augment2d import random_grayscale_adjust


def simple_augment_3d(data: np.ndarray, rule) -> np.ndarray:
    """4-bit rule: z-flip, x-flip, y-flip, xy-transpose on (D, H, W)."""
    if rule[0]:
        data = data[::-1]
    if rule[1]:
        data = data[:, :, ::-1]
    if rule[2]:
        data = data[:, ::-1, :]
    if rule[3]:
        data = np.transpose(data, (0, 2, 1))
    return data


def simple_augment_reverse_3d(data: np.ndarray, rule) -> np.ndarray:
    if rule[3]:
        data = np.transpose(data, (0, 2, 1))
    if rule[2]:
        data = data[:, ::-1, :]
    if rule[1]:
        data = data[:, :, ::-1]
    if rule[0]:
        data = data[::-1]
    return data


def convert_consistency_flip_jax_3d_rule4(emb_bdhwc, rules_b4):
    """In-jit inverse of the 4-bit 3D flip (NDHWC; H == W for transpose)."""
    import jax.numpy as jnp

    r = rules_b4.astype(bool)
    e = emb_bdhwc
    et = jnp.transpose(e, (0, 1, 3, 2, 4))
    e = jnp.where(r[:, 3][:, None, None, None, None], et, e)
    e = jnp.where(r[:, 2][:, None, None, None, None], e[:, :, ::-1], e)
    e = jnp.where(r[:, 1][:, None, None, None, None], e[:, :, :, ::-1], e)
    e = jnp.where(r[:, 0][:, None, None, None, None], e[:, ::-1], e)
    return e


def gen_mask_3d(shape, rng, min_counts=0, max_counts=60,
                min_size=(5, 10, 10), max_size=(10, 20, 20)):
    """3D cutout mask (consistency_aug.py:95-111 semantics)."""
    mask = np.ones(shape, np.float32)
    counts = int(rng.integers(min_counts, max_counts + 1))
    sz = int(rng.integers(min_size[0], max_size[0] + 1))
    sxy = int(rng.integers(min_size[1], max_size[1] + 1))
    for _ in range(counts):
        mz = int(rng.integers(0, max(shape[0] - sz, 1)))
        my = int(rng.integers(0, max(shape[1] - sxy, 1)))
        mx = int(rng.integers(0, max(shape[2] - sxy, 1)))
        mask[mz:mz + sz, my:my + sxy, mx:mx + sxy] = 0
    return mask


def missing_section_augment(imgs, rng, max_sections: int = 2,
                            fill_mode: str = "mix"):
    """EM missing-section augmentation (utils/augmentation.py MissingAugment
    role): a few random z-slices are blanked (zero) or noise-filled."""
    out = imgs.copy()
    n = int(rng.integers(1, max_sections + 1))
    for z in rng.choice(imgs.shape[0], size=min(n, imgs.shape[0]),
                        replace=False):
        if fill_mode == "noise" or (fill_mode == "mix" and rng.random() < 0.5):
            out[z] = rng.random(imgs.shape[1:]).astype(imgs.dtype)
        else:
            out[z] = 0.0
    return out


def misalign_augment(imgs, label, rng, max_shift: int = 10):
    """EM misalignment augmentation: slices above a random z get a rigid xy
    translation (create_misalign-style); label moves with the image."""
    z0 = int(rng.integers(1, imgs.shape[0]))
    dy = int(rng.integers(-max_shift, max_shift + 1))
    dx = int(rng.integers(-max_shift, max_shift + 1))
    if dy == 0 and dx == 0:
        return imgs, label

    def shift2d(a, fill):
        out = np.full_like(a, fill)
        h, w = a.shape
        ys = slice(max(dy, 0), h + min(dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        ys_src = slice(max(-dy, 0), h + min(-dy, 0))
        xs_src = slice(max(-dx, 0), w + min(-dx, 0))
        out[ys, xs] = a[ys_src, xs_src]
        return out

    imgs = imgs.copy()
    label = label.copy()
    for z in range(z0, imgs.shape[0]):
        imgs[z] = shift2d(imgs[z], 0.0)
        label[z] = shift2d(label[z], 0)
    return imgs, label


def intensity_augment_3d(imgs, rng, mode="mix", contrast_factor=0.3,
                         brightness_factor=0.3):
    """Per-slice or whole-volume contrast/brightness/gamma jitter.
    mode='mix' is the train Grayscale default for AC3/AC4
    (scripts_ac3ac4/augmentation/grayscale.py:17,29-41: fair 50/50
    2D-per-slice vs 3D-whole-volume; factors 0.3)."""
    if mode == "mix":
        mode = "3D" if rng.random() > 0.5 else "2D"
    if mode == "2D":
        out = np.stack([random_grayscale_adjust(imgs[z], rng,
                                                contrast_factor,
                                                brightness_factor)
                        for z in range(imgs.shape[0])])
    else:
        out = random_grayscale_adjust(imgs, rng, contrast_factor,
                                      brightness_factor)
    return out


def _center_crop_3d(x, det):
    sz = x.shape
    off = [(sz[i] - det[i]) // 2 for i in range(3)]
    return x[off[0]:off[0] + det[0], off[1]:off[1] + det[1],
             off[2]:off[2] + det[2]]


class AC3AC4Train:
    def __init__(self, data_folder: str, dataset_name: str = "ac4",
                 train_split: int = 80, crop_size=(18, 160, 160),
                 padding: int = 50, if_dilate: bool = True,
                 aug_prob: float = 0.5,
                 ema_intensity: bool = True, ema_mask: bool = True,
                 ema_flip: bool = True, seed: int = 555,
                 light: bool = False, device_ema: bool = False,
                 arrays: tuple[np.ndarray, np.ndarray] | None = None):
        """``arrays=(raw, labels)`` bypasses HDF5 loading (tests/synthetic).

        ``light``: ship only image(+ema)/seg — the 12-ch affinities, weights
        and pyramid targets are built in-jit (train_step_3d device_gt).
        ``device_ema`` (implies light semantics for the EMA view): skip the
        host EMA view/rules too — generated in-jit (device_aug.ema_view_3d).
        """
        import h5py

        self.crop_size = list(crop_size)
        self.padding = padding
        self.aug_prob = aug_prob
        self.ema_intensity = ema_intensity
        self.ema_mask = ema_mask
        self.ema_flip = ema_flip
        self.light = light
        self.device_ema = device_ema
        self.rng = np.random.default_rng(seed)

        if arrays is not None:
            raw, label = arrays
        else:
            name_map = {"ac4": ("AC4_inputs.h5", "AC4_labels.h5"),
                        "ac3": ("AC3_inputs.h5", "AC3_labels.h5")}
            fr, fl = name_map[dataset_name]
            with h5py.File(os.path.join(data_folder, fr), "r") as f:
                raw = f["main"][:]
            with h5py.File(os.path.join(data_folder, fl), "r") as f:
                label = f["main"][:]
        raw = raw[:train_split]
        label = label[:train_split].astype(np.int64)
        if if_dilate:
            label = seg_widen_border(label, tsz_h=1)

        # z-pad if volume thinner than crop
        if raw.shape[0] < self.crop_size[0]:
            pz = (self.crop_size[0] - raw.shape[0]) // 2
            pz2 = self.crop_size[0] - raw.shape[0] - pz
            raw = np.pad(raw, ((pz, pz2), (0, 0), (0, 0)), mode="reflect")
            label = np.pad(label, ((pz, pz2), (0, 0), (0, 0)), mode="reflect")
        self.raw = raw
        self.label = label
        self.crop_from_origin = [self.crop_size[0],
                                 self.crop_size[1] + 2 * padding,
                                 self.crop_size[2] + 2 * padding]

    def sample(self, rng: np.random.Generator | None = None) -> dict:
        import cv2

        rng = rng or self.rng
        shp = self.raw.shape
        cfo = self.crop_from_origin
        rz = int(rng.integers(0, shp[0] - cfo[0] + 1))
        ry = int(rng.integers(0, shp[1] - cfo[1] + 1))
        rx = int(rng.integers(0, shp[2] - cfo[2] + 1))
        imgs = self.raw[rz:rz + cfo[0], ry:ry + cfo[1], rx:rx + cfo[2]].astype(
            np.float32) / 255.0
        lb = self.label[rz:rz + cfo[0], ry:ry + cfo[1], rx:rx + cfo[2]].copy()

        if rng.random() < self.aug_prob:
            imgs, lb = self._augs_mix(imgs, lb, rng)
        imgs = _center_crop_3d(imgs, self.crop_size)
        lb = _center_crop_3d(lb, self.crop_size)

        if self.light:
            out = {"image": np.ascontiguousarray(imgs, np.float32)[..., None],
                   "seg": lb.astype(np.int32)}
            if not self.device_ema:
                out["ema_image"], out["rules"] = self._ema_view(imgs, rng)
            return out

        pyr = label_pyramid(lb, num_levels=4)
        affs = seg_to_aff_3d_12ch(lb).astype(np.float32)
        downs = []
        for lab_d in pyr:
            a = seg_to_aff_3d(lab_d).astype(np.float32)
            w = np.stack([weight_binary_ratio(a[i]) for i in range(3)])
            downs.append(np.concatenate([a, w], axis=0))
        wmap = np.stack([weight_binary_ratio(affs[i]) for i in range(12)])

        ema, rule = self._ema_view(imgs, rng)

        return {
            "image": np.ascontiguousarray(imgs, np.float32)[..., None],
            "ema_image": ema,
            "affs": affs, "wmap": wmap,
            "seg": lb.astype(np.int32),
            "down1": downs[0], "down2": downs[1],
            "down3": downs[2], "down4": downs[3],
            "rules": rule,
        }

    def _ema_view(self, imgs, rng):
        ema = imgs.copy()
        # IntensityAugment() parity (scripts_ac3ac4/utils/augmentation.py:
        # 249-303, wired at data_provider_labeled_deep.py:288-289): one
        # skiprand draw both gates execution (skiprand < 0.5) and would
        # pick the mode — but in the as-shipped 'mix' rule 3D needs
        # skiprand > 0.75, unreachable inside the < 0.5 branch, so the
        # EMA intensity jitter is ALWAYS per-slice 2D, factors 0.1.
        if self.ema_intensity and rng.random() < 0.5:
            ema = intensity_augment_3d(ema, rng, mode="2D",
                                       contrast_factor=0.1,
                                       brightness_factor=0.1)
        if self.ema_mask:
            ema = ema * gen_mask_3d(ema.shape, rng)
        if self.ema_flip:
            rule = rng.integers(0, 2, size=4).astype(np.float32)
            ema = simple_augment_3d(ema, rule.astype(np.uint8))
        else:
            rule = np.zeros(4, np.float32)
        return np.ascontiguousarray(ema, np.float32)[..., None], rule

    def _augs_mix(self, imgs, lb, rng):
        import cv2

        if rng.random() > 0.5:  # flips
            rule = rng.integers(0, 2, size=4).astype(np.uint8)
            imgs = simple_augment_3d(imgs, rule).copy()
            lb = simple_augment_3d(lb, rule).copy()
        if rng.random() > 0.5:  # rotate90 in xy
            k = int(rng.integers(0, 4))
            imgs = np.rot90(imgs, k, axes=(1, 2)).copy()
            lb = np.rot90(lb, k, axes=(1, 2)).copy()
        if rng.random() < 0.5:  # per-slice elastic in xy (one shared field,
            # uniform(-1,1) base noise, constant-0 fill: scripts_ac3ac4/
            # augmentation/warp.py:31,46-47,53-72)
            from .augment2d import elastic_field_np

            h, w = imgs.shape[1:]
            dx = elastic_field_np(rng, h, w, alpha=16.0, sigma=4.0)
            dy = elastic_field_np(rng, h, w, alpha=16.0, sigma=4.0)
            xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32))
            mx, my = xx + dx, yy + dy
            for z in range(imgs.shape[0]):
                imgs[z] = cv2.remap(imgs[z], mx, my, cv2.INTER_LINEAR,
                                    borderMode=cv2.BORDER_CONSTANT)
                lb[z] = cv2.remap(lb[z].astype(np.float32), mx, my,
                                  cv2.INTER_NEAREST,
                                  borderMode=cv2.BORDER_CONSTANT
                                  ).astype(lb.dtype)
        if rng.random() < 0.5:  # grayscale
            imgs = intensity_augment_3d(imgs, rng)
        if rng.random() < 0.2:  # EM artifacts: missing sections / misalign
            if rng.random() < 0.5:
                imgs = missing_section_augment(imgs, rng)
            else:
                imgs, lb = misalign_augment(imgs, lb, rng)
        return imgs, lb


class AC3AC4ValidVolume:
    """Full-volume access for tiled validation/inference.

    Dataset split conventions (provider_valid.py:104-110): AC3 test = first
    100 slices, AC4 valid = last 20 slices.
    """

    def __init__(self, data_folder: str, dataset_name: str = "ac4",
                 mode: str = "valid",
                 arrays: tuple[np.ndarray, np.ndarray] | None = None):
        import h5py

        if arrays is not None:
            raw, label = arrays
        else:
            name_map = {"ac4": ("AC4_inputs.h5", "AC4_labels.h5"),
                        "ac3": ("AC3_inputs.h5", "AC3_labels.h5")}
            fr, fl = name_map[dataset_name]
            with h5py.File(os.path.join(data_folder, fr), "r") as f:
                raw = f["main"][:]
            with h5py.File(os.path.join(data_folder, fl), "r") as f:
                label = f["main"][:]
        if dataset_name == "ac3":
            raw, label = raw[:100], label[:100]
        elif mode == "valid":
            raw, label = raw[-20:], label[-20:]
        self.raw = raw.astype(np.float32) / 255.0
        self.label = label.astype(np.int64)


def synthesize_volume(d=40, h=256, w=256, n_cells=40, seed=0):
    """Synthetic EM-like volume: random 3D Voronoi cells + noisy boundaries."""
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.integers(0, d, n_cells),
                    rng.integers(0, h, n_cells),
                    rng.integers(0, w, n_cells)], axis=1).astype(np.float32)
    zz, yy, xx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                             indexing="ij")
    coords = np.stack([zz.reshape(-1) * 4.0, yy.reshape(-1), xx.reshape(-1)],
                      axis=1).astype(np.float32)
    pts_s = pts.copy()
    pts_s[:, 0] *= 4.0
    from scipy.spatial import cKDTree

    tree = cKDTree(pts_s)
    _, idx = tree.query(coords)
    label = (idx.reshape(d, h, w) + 1).astype(np.int64)

    raw = np.full((d, h, w), 180.0)
    boundary = np.zeros((d, h, w), bool)
    for axis in range(3):
        sl_a = [slice(None)] * 3
        sl_b = [slice(None)] * 3
        sl_a[axis] = slice(1, None)
        sl_b[axis] = slice(0, -1)
        diff = label[tuple(sl_a)] != label[tuple(sl_b)]
        boundary[tuple(sl_a)] |= diff
    raw[boundary] = 60.0
    raw += rng.normal(0, 15, raw.shape)
    raw = np.clip(raw, 0, 255).astype(np.uint8)
    return raw, label
