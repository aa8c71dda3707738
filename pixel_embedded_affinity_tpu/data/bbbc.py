"""BBBC039V1 nuclei dataset pipeline (channels-last numpy).

Reproduces scripts_bbbc039v1/data/data_provider.py: TIFF images min-max
normalized, instance-label PNGs, metadata/{training,validation,test}.txt
splits, reflect-pad 30, random crop (size+2*pad)^2, p=0.8 augmentation mix
(flip/rotate/rescale/elastic/grayscale), center-crop size^2, grayscale
repeated to 3 channels; shifts [1,3,5,9,11]; mask head target = FG mask.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import gen_affs, multi_offset, weight_binary_ratio, label_pyramid
from . import consistency as C
from .augment2d import (
    random_flips, random_rotate, random_rescale, elastic_deform,
    random_grayscale_adjust, center_crop_pad,
)


def _read_split(meta_dir, name):
    with open(os.path.join(meta_dir, name)) as f:
        return [x.strip()[:-4] for x in f if x.strip()]  # strip '.png'


class BBBCTrain:
    def __init__(self, data_folder: str, size: int = 256, padding: int = 30,
                 shifts=(1, 3, 5, 9, 11), neighbor: int = 4,
                 separate_weight: bool = True, mode: str = "train",
                 aug_prob: float = 0.8,
                 ema_intensity: bool = True, ema_mask: bool = True,
                 ema_flip: bool = True, light: bool = False,
                 device_ema: bool = False, seed: int = 555):
        self.light = light  # emit only image/ema_image/seg/rules (device GT)
        # device_ema: in light mode, skip the host EMA view/rules too
        self.device_ema = device_ema
        self.data_folder = data_folder
        self.dir_img = os.path.join(data_folder, "images")
        self.dir_lb = os.path.join(data_folder, "masks_instance")
        meta = os.path.join(data_folder, "metadata")
        split_file = {"train": "training.txt", "validation": "validation.txt",
                      "test": "test.txt"}[mode]
        self.names = _read_split(meta, split_file)
        self.size = size
        self.padding = padding
        self.offsets = multi_offset(list(shifts), neighbor=neighbor)
        self.nb_half = neighbor // 2
        self.separate_weight = separate_weight
        self.aug_prob = aug_prob
        self.ema_intensity = ema_intensity
        self.ema_mask = ema_mask
        self.ema_flip = ema_flip
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.names)

    def _load(self, name):
        import cv2

        img = cv2.imread(os.path.join(self.dir_img, name + ".tif"),
                         cv2.IMREAD_UNCHANGED)
        img = img.astype(np.float32)
        img = (img - img.min()) / max(img.max() - img.min(), 1e-8)
        label = cv2.imread(os.path.join(self.dir_lb, name + ".png"),
                           cv2.IMREAD_UNCHANGED)
        if label.ndim == 3:
            label = label[..., 0]
        return img, label.astype(np.int32)

    def sample(self, rng: np.random.Generator | None = None) -> dict:
        rng = rng or self.rng
        k = int(rng.integers(0, len(self.names)))
        img, label = self._load(self.names[k])

        pad = self.padding
        img = np.pad(img, pad, mode="reflect")
        label = np.pad(label, pad, mode="reflect")
        crop = self.size + 2 * pad
        rx = int(rng.integers(0, img.shape[0] - crop + 1))
        ry = int(rng.integers(0, img.shape[1] - crop + 1))
        img = img[rx:rx + crop, ry:ry + crop]
        label = label[rx:rx + crop, ry:ry + crop]

        if rng.random() < self.aug_prob:
            if rng.random() > 0.5:
                img, label = random_flips(img, label, rng)
            if rng.random() > 0.5:
                # arbitrary-angle rotation (rotation.py:45: rand()*360).
                # The final 256 center-crop keeps constant-filled corners
                # at most angles — reference behavior: its provider calls
                # Rotate directly on the same 316^2 tile, never through
                # the Compose sample-ratio machinery that would enlarge it
                img, label = random_rotate(img, label, rng)
            if rng.random() < 0.5:
                img, label = random_rescale(img, label, rng)
            # all gates are 0.5: the reference's augs_mix gates each aug
            # at random()>0.5 and the augmentors' internal p (Elastic 0.75,
            # Grayscale 0.75) is dead outside Compose
            # (scripts_bbbc039v1/data/data_provider.py:256-267)
            if rng.random() < 0.5:
                img, label = elastic_deform(img, label, rng, alpha=16, sigma=4.0)
            if rng.random() < 0.5:
                img = random_grayscale_adjust(img, rng)
        img = center_crop_pad(img, self.size, self.size)
        label = center_crop_pad(label, self.size, self.size)

        image = np.repeat(img[..., None], 3, axis=-1).astype(np.float32)

        if self.light:
            # device-GT mode: ship only image/ema view/int labels/rules;
            # affinity targets are built in-jit (same padding=True and
            # per-channel weight semantics — tests/test_device_gt.py)
            if self.device_ema:
                return {"image": np.ascontiguousarray(image, np.float32),
                        "seg": label.astype(np.int32)}
            ema = image.copy()
            if self.ema_intensity:
                ema = C.add_intensity(ema, rng)
            if self.ema_mask:
                fg = (label != 0).astype(np.uint8)
                ema = C.add_mask(ema, fg, rng)
            if self.ema_flip:
                rule = C.flip_ema_rule(rng)
                ema = C.simple_augment(ema, rule.astype(np.uint8))
            else:
                rule = np.zeros(3, np.float32)
            return {"image": np.ascontiguousarray(image, np.float32),
                    "ema_image": np.ascontiguousarray(ema, np.float32),
                    "seg": label.astype(np.int32), "rules": rule}

        out = _build_bbbc_targets(image, label, self.offsets, self.nb_half,
                                  self.separate_weight, rng,
                                  self.ema_intensity, self.ema_mask,
                                  self.ema_flip)
        return out


def _build_bbbc_targets(image_hwc, label, offsets, nb_half, separate_weight,
                        rng, ema_intensity, ema_mask, ema_flip):
    pyr = label_pyramid(label, num_levels=4)
    affs, mask = gen_affs(label, offsets, ignore=False, padding=True)

    def weights_for(a):
        if separate_weight:
            return np.stack([weight_binary_ratio(a[i]) for i in range(a.shape[0])])
        return weight_binary_ratio(a)

    wmap = weights_for(affs)
    downs = []
    for lvl, lab_d in enumerate(pyr):
        n_off = nb_half * (4 - lvl)
        a, m = gen_affs(lab_d, offsets[:n_off], ignore=False, padding=True)
        downs.append(np.concatenate([a, weights_for(a), m.astype(np.float32)],
                                    axis=0))

    # BBBC EMA view operates on the raw [0,1] image directly (no ImageNet norm)
    ema = image_hwc.copy()
    if ema_intensity:
        ema = C.add_intensity(ema, rng)
    if ema_mask:
        fg = (label != 0).astype(np.uint8)
        ema = C.add_mask(ema, fg, rng)
    if ema_flip:
        rule = C.flip_ema_rule(rng)
        ema = C.simple_augment(ema, rule.astype(np.uint8))
    else:
        rule = np.zeros(3, np.float32)

    return {
        "image": np.ascontiguousarray(image_hwc, np.float32),
        "affs": affs, "wmap": wmap,
        "seg": label.astype(np.int32), "mask": mask,
        "down1": downs[0], "down2": downs[1],
        "down3": downs[2], "down4": downs[3],
        "ema_image": np.ascontiguousarray(ema, np.float32),
        "rules": rule,
    }


class BBBCValidation:
    """Validation: constant-pad to 704^2, crop [92:-92, 4:-4] -> 520x696
    becomes 336x688 center view (reference Validation semantics)."""

    def __init__(self, data_folder: str, shifts=(1, 3, 5, 9, 11),
                 neighbor: int = 4, mode: str = "validation",
                 separate_weight: bool = True):
        self.train = BBBCTrain(data_folder, shifts=shifts, neighbor=neighbor,
                               mode=mode)
        self.offsets = self.train.offsets
        self.separate_weight = separate_weight

    def __len__(self):
        return len(self.train.names)

    def __getitem__(self, idx) -> dict:
        img, label = self.train._load(self.train.names[idx])
        # pad to 704x704 then crop the reference's centered window
        ph = (704 - img.shape[0])
        pw = (704 - img.shape[1])
        img = np.pad(img, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)))
        label = np.pad(label, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)))
        img = img[92:-92, 4:-4]
        label = label[92:-92, 4:-4]
        image = np.repeat(img[..., None], 3, axis=-1).astype(np.float32)
        affs, mask = gen_affs(label, self.offsets, ignore=False, padding=True)
        if self.separate_weight:
            wmap = np.stack([weight_binary_ratio(affs[i])
                             for i in range(affs.shape[0])])
        else:
            wmap = weight_binary_ratio(affs)
        return {"image": image, "affs": affs, "wmap": wmap, "mask": mask,
                "seg": label.astype(np.int32)}


def convert_mask_to_instances(mask: np.ndarray, min_size: int = 25) -> np.ndarray:
    """Boundary/FG masks -> instance labels (convert_mask2ins.py:1-59 parity):
    connected-component labeling of the foreground + drop components < 25 px."""
    from scipy import ndimage

    lab, n = ndimage.label(mask > 0)
    if n == 0:
        return lab.astype(np.int32)
    sizes = np.bincount(lab.reshape(-1))
    drop = np.where(sizes < min_size)[0]
    keep_lut = np.arange(sizes.size)
    keep_lut[drop] = 0
    lab = keep_lut[lab]
    # relabel consecutively
    uid = np.unique(lab)
    uid = uid[uid > 0]
    lut = np.zeros(int(lab.max()) + 1, np.int32)
    lut[uid] = np.arange(1, len(uid) + 1)
    return lut[lab]


def synthesize(data_folder: str, n_train: int = 8, n_valid: int = 2,
               n_test: int = 2, h: int = 520, w: int = 696, seed: int = 0):
    """Synthetic BBBC-layout dataset (nuclei-like blobs, TIFF + PNG labels)."""
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(data_folder, "images"), exist_ok=True)
    os.makedirs(os.path.join(data_folder, "masks_instance"), exist_ok=True)
    os.makedirs(os.path.join(data_folder, "metadata"), exist_ok=True)
    splits = {"training.txt": [], "validation.txt": [], "test.txt": []}
    total = n_train + n_valid + n_test
    for i in range(total):
        name = f"IXM_{i:03d}"
        label = np.zeros((h, w), np.uint16)
        img = rng.normal(200, 20, (h, w)).astype(np.float32)
        n_nuc = int(rng.integers(30, 80))
        for nid in range(1, n_nuc + 1):
            cy = int(rng.integers(15, h - 15))
            cx = int(rng.integers(15, w - 15))
            axes = (int(rng.integers(5, 14)), int(rng.integers(5, 14)))
            rot = int(rng.integers(0, 180))
            cv2.ellipse(label, (cx, cy), axes, rot, 0, 360, int(nid), -1)
        img[label > 0] += 600 + rng.normal(0, 50, int((label > 0).sum()))
        cv2.imwrite(os.path.join(data_folder, "images", name + ".tif"),
                    img.astype(np.uint16))
        cv2.imwrite(os.path.join(data_folder, "masks_instance", name + ".png"),
                    label)
        if i < n_train:
            splits["training.txt"].append(name)
        elif i < n_train + n_valid:
            splits["validation.txt"].append(name)
        else:
            splits["test.txt"].append(name)
    for fname, names in splits.items():
        with open(os.path.join(data_folder, "metadata", fname), "w") as f:
            for n in names:
                f.write(n + ".png\n")
