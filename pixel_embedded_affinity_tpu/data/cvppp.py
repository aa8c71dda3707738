"""CVPPP A1 leaf-segmentation dataset pipeline (channels-last numpy).

Reproduces the reference provider semantics
(scripts_cvppp/data/data_provider.py):
  reflect-pad RGB (7,7),(22,22) -> 544x544 (labels constant-padded), seeded
  geometric aug (HFlip+VFlip+RandomResizedCrop scale 0.7-1; image bilinear,
  label nearest), ImageNet normalization, label pyramids /2../16, GT
  affinities with truncated offset lists per scale (padding=True), per-channel
  weight_binary_ratio, and an EMA view (denormalize -> optional
  noise/blur/intensity/mask-patch -> renormalize -> 3-bit flip rule).

Data layout on disk matches the reference (data_folder/train/plantXXX_rgb.png
etc. + valid_set/<name>.txt); `synthesize` generates a compatible synthetic
dataset for development and CI.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import gen_affs, multi_offset, weight_binary_ratio, label_pyramid
from . import consistency as C
from .augment2d import random_flips, random_resized_crop


class CVPPPTrain:
    def __init__(self, data_folder: str, size: int = 544,
                 shifts=(1, 3, 5, 9, 27), neighbor: int = 4,
                 padding: bool = True, separate_weight: bool = True,
                 valid_set: str = "local_20_1",
                 mode: str = "train", aug_mode: str = "xiaoyu",
                 ema_noise: bool = False, ema_blur: bool = False,
                 ema_intensity: bool = True, ema_mask: bool = True,
                 ema_flip: bool = True, light: bool = False,
                 device_ema: bool = False, seed: int = 555):
        self.data_folder = data_folder
        self.aug_mode = aug_mode
        self.light = light  # emit only image/ema_image/seg/rules (device GT)
        # device_ema: in light mode, skip the host EMA view/rules too --
        # generated in-jit by the train step (data/device_aug.ema_view_2d)
        self.device_ema = device_ema
        self.size = size
        self.offsets = multi_offset(list(shifts), neighbor=neighbor)
        self.nb_half = neighbor // 2
        self.padding = padding
        self.separate_weight = separate_weight
        self.ema_noise = ema_noise
        self.ema_blur = ema_blur
        self.ema_intensity = ema_intensity
        self.ema_mask = ema_mask
        self.ema_flip = ema_flip
        self.rng = np.random.default_rng(seed)

        self.dir = os.path.join(data_folder, "train")
        names = sorted({f[:8] for f in os.listdir(self.dir) if "rgb" in f})
        valid_file = os.path.join(data_folder, "valid_set", valid_set + ".txt")
        if os.path.exists(valid_file):
            with open(valid_file) as f:
                valid_names = [x.strip() for x in f if x.strip()]
        else:
            valid_names = names[: max(1, len(names) // 5)]
        if mode == "train":
            self.names = [n for n in names if n not in valid_names]
        else:
            self.names = valid_names

    def __len__(self):
        return len(self.names)

    def _load(self, name):
        import cv2

        img = cv2.imread(os.path.join(self.dir, name + "_rgb.png"),
                         cv2.IMREAD_COLOR)[:, :, ::-1]  # BGR -> RGB
        label = cv2.imread(os.path.join(self.dir, name + "_label.png"),
                           cv2.IMREAD_UNCHANGED)
        if label.ndim == 3:
            label = label[..., 0]
        return img.astype(np.float32) / 255.0, label.astype(np.int32)

    def sample(self, rng: np.random.Generator | None = None) -> dict:
        rng = rng or self.rng
        k = int(rng.integers(0, len(self.names)))
        img, label = self._load(self.names[k])

        if self.padding:
            img = np.pad(img, ((7, 7), (22, 22), (0, 0)), mode="reflect")
            label = np.pad(label, ((7, 7), (22, 22)), mode="constant")

        if self.aug_mode == "xiaoyu":
            img, label = random_flips(img, label, rng)
            img, label = random_resized_crop(img, label, self.size, rng,
                                             scale=(0.7, 1.0))
        else:  # 'rsis': flip/crop + p=0.5 torchsample-style affine chain
            from .augment2d import random_affine, center_crop_pad

            img, label = random_flips(img, label, rng)
            img = center_crop_pad(img, self.size, self.size)
            label = center_crop_pad(label, self.size, self.size)
            if rng.random() < 0.5:
                img, label = random_affine(img, label, rng)
        image = C.normalize_imagenet(img)

        if self.light:
            if self.device_ema:
                return {"image": np.ascontiguousarray(image, np.float32),
                        "seg": label.astype(np.int32)}
            return build_cvppp_light(image, label, rng,
                                     ema_noise=self.ema_noise,
                                     ema_blur=self.ema_blur,
                                     ema_intensity=self.ema_intensity,
                                     ema_mask=self.ema_mask,
                                     ema_flip=self.ema_flip)
        return build_cvppp_targets(image, label, self.offsets, self.nb_half,
                                   self.separate_weight, rng,
                                   ema_noise=self.ema_noise,
                                   ema_blur=self.ema_blur,
                                   ema_intensity=self.ema_intensity,
                                   ema_mask=self.ema_mask,
                                   ema_flip=self.ema_flip)


def build_cvppp_light(image_hwc, label, rng, ema_noise=False, ema_blur=False,
                      ema_intensity=True, ema_mask=True, ema_flip=True):
    """Light sample for device-side GT: image + EMA view + labels + rules."""
    ema = C.denormalize_imagenet(image_hwc).copy()
    if ema_noise:
        ema = C.add_gauss_noise(ema, rng)
    if ema_blur:
        ema = C.add_gauss_blur(ema, rng)
    if ema_intensity:
        ema = C.add_intensity(ema, rng)
    if ema_mask:
        ema = C.add_mask(ema, (label != 0).astype(np.uint8), rng)
    ema = C.normalize_imagenet(ema)
    if ema_flip:
        rule = C.flip_ema_rule(rng)
        ema = C.simple_augment(ema, rule.astype(np.uint8))
    else:
        rule = np.zeros(3, np.float32)
    return {"image": np.ascontiguousarray(image_hwc, np.float32),
            "ema_image": np.ascontiguousarray(ema, np.float32),
            "seg": label.astype(np.int32),
            "rules": rule}


def build_cvppp_targets(image_hwc, label, offsets, nb_half, separate_weight,
                        rng, ema_noise=False, ema_blur=False,
                        ema_intensity=True, ema_mask=True, ema_flip=True):
    """Shared target/EMA construction for the 2D pipelines."""
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
        w = weights_for(a)
        downs.append(np.concatenate([a, w, m.astype(np.float32)], axis=0))

    # EMA view from the de-normalized image
    ema = C.denormalize_imagenet(image_hwc).copy()
    if ema_noise:
        ema = C.add_gauss_noise(ema, rng)
    if ema_blur:
        ema = C.add_gauss_blur(ema, rng)
    if ema_intensity:
        ema = C.add_intensity(ema, rng)
    if ema_mask:
        fg = (label != 0).astype(np.uint8)
        ema = C.add_mask(ema, fg, rng)
    ema = C.normalize_imagenet(ema)
    if ema_flip:
        rule = C.flip_ema_rule(rng)
        ema = C.simple_augment(ema, rule.astype(np.uint8))
    else:
        rule = np.zeros(3, np.float32)

    return {
        "image": np.ascontiguousarray(image_hwc, dtype=np.float32),
        "affs": affs,
        "wmap": wmap,
        "seg": label.astype(np.int32),
        "mask": mask,
        "down1": downs[0], "down2": downs[1],
        "down3": downs[2], "down4": downs[3],
        "ema_image": np.ascontiguousarray(ema, dtype=np.float32),
        "rules": rule,
    }


class CVPPPValidation:
    """Validation images: pad, normalize, full-scale GT targets (no aug)."""

    def __init__(self, data_folder: str, shifts=(1, 3, 5, 9, 27),
                 neighbor: int = 4, valid_set: str = "local_20_1",
                 padding: bool = True, separate_weight: bool = True):
        self.train = CVPPPTrain(data_folder, shifts=shifts, neighbor=neighbor,
                                valid_set=valid_set, mode="validation",
                                padding=padding,
                                separate_weight=separate_weight)
        self.offsets = self.train.offsets
        self.separate_weight = separate_weight
        self.padding = padding

    def __len__(self):
        return len(self.train.names)

    def __getitem__(self, idx) -> dict:
        img, label = self.train._load(self.train.names[idx])
        if self.padding:
            img = np.pad(img, ((7, 7), (22, 22), (0, 0)), mode="reflect")
            label = np.pad(label, ((7, 7), (22, 22)), mode="constant")
        image = C.normalize_imagenet(img)
        affs, mask = gen_affs(label, self.offsets, ignore=False, padding=True)
        if self.separate_weight:
            wmap = np.stack([weight_binary_ratio(affs[i])
                             for i in range(affs.shape[0])])
        else:
            wmap = weight_binary_ratio(affs)
        return {"image": np.ascontiguousarray(image, np.float32),
                "affs": affs, "wmap": wmap, "mask": mask,
                "seg": label.astype(np.int32)}


class CVPPPTest:
    """Test images (data_folder/test/plantXXX_{rgb,fg}.png): no labels; the
    foreground mask is given (CodaLab protocol, inference.py:77-84)."""

    def __init__(self, data_folder: str, padding: bool = True):
        import os as _os

        self.dir = _os.path.join(data_folder, "test")
        files = _os.listdir(self.dir)
        self.names = sorted({f[:8] for f in files if "rgb" in f},
                            key=lambda x: int(x[5:8]))
        self.padding = padding

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        import cv2

        name = self.names[idx]
        img = cv2.imread(os.path.join(self.dir, name + "_rgb.png"),
                         cv2.IMREAD_COLOR)[:, :, ::-1].astype(np.float32) / 255.0
        fg = cv2.imread(os.path.join(self.dir, name + "_fg.png"),
                        cv2.IMREAD_UNCHANGED)
        if fg.ndim == 3:
            fg = fg[..., 0]
        fg = (fg > 0).astype(np.uint8)
        if self.padding:
            img = np.pad(img, ((7, 7), (22, 22), (0, 0)), mode="reflect")
            fg = np.pad(fg, ((7, 7), (22, 22)), mode="constant")
        image = C.normalize_imagenet(img)
        return {"image": np.ascontiguousarray(image, np.float32),
                "fg": fg, "name": name}


def synthesize(data_folder: str, n_train: int = 12, h: int = 530, w: int = 500,
               n_valid: int = 3, n_test: int = 0, seed: int = 0):
    """Write a synthetic CVPPP-layout dataset (leaf-like blobs)."""
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(data_folder, "train"), exist_ok=True)
    os.makedirs(os.path.join(data_folder, "valid_set"), exist_ok=True)
    if n_test:
        os.makedirs(os.path.join(data_folder, "test"), exist_ok=True)
    names = []
    for i in range(n_train + n_test):
        split = "train" if i < n_train else "test"
        name = f"plant{i:03d}"
        if split == "train":
            names.append(name)
        label = np.zeros((h, w), np.uint8)
        img = rng.normal(0.1, 0.03, (h, w, 3)).astype(np.float32)
        n_leaves = int(rng.integers(4, 12))
        cy, cx = h // 2, w // 2
        m = min(h, w)
        for leaf in range(1, n_leaves + 1):
            ang = rng.uniform(0, 2 * np.pi)
            dist = rng.uniform(m / 12, max(m / 2 - m / 8, m / 12 + 1))
            ly = int(cy + dist * np.sin(ang))
            lx = int(cx + dist * np.cos(ang))
            ax_lo = max(m // 20, 3)
            axes = (int(rng.integers(ax_lo, ax_lo * 3)),
                    int(rng.integers(max(ax_lo // 2, 2), ax_lo * 2)))
            rot = int(rng.integers(0, 180))
            cv2.ellipse(label, (lx, ly), axes, rot, 0, 360, int(leaf), -1)
        green = rng.uniform(0.4, 0.8)
        img[label > 0] = np.stack([
            np.full((label > 0).sum(), 0.15),
            np.full((label > 0).sum(), green),
            np.full((label > 0).sum(), 0.1)], axis=-1)
        img += rng.normal(0, 0.02, img.shape)
        img = np.clip(img, 0, 1)
        cv2.imwrite(os.path.join(data_folder, split, name + "_rgb.png"),
                    (img[:, :, ::-1] * 255).astype(np.uint8))
        if split == "train":
            cv2.imwrite(os.path.join(data_folder, split, name + "_label.png"),
                        label)
        fg = (label > 0).astype(np.uint8) * 255
        cv2.imwrite(os.path.join(data_folder, split, name + "_fg.png"), fg)
    with open(os.path.join(data_folder, "valid_set", "local_20_1.txt"), "w") as f:
        for n in names[:n_valid]:
            f.write(n + "\n")
    return names
