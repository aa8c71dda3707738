"""Visualization: random-color label maps, embedding PCA, train/val montages.

Port of utils/show.py (draw_fragments_2d/3d, embedding_pca, show_affs_emb,
val_show) — PNG artifacts for human-in-the-loop regression checks.
"""

from __future__ import annotations

import os

import numpy as np


def draw_fragments_2d(seg: np.ndarray, seed: int = 123) -> np.ndarray:
    """Instance labels -> random-color RGB uint8 (background black)."""
    rng = np.random.default_rng(seed)
    ids = np.unique(seg)
    lut = np.zeros((int(ids.max()) + 1 if len(ids) else 1, 3), np.uint8)
    for i in ids:
        if i == 0:
            continue
        lut[i] = rng.integers(32, 255, 3)
    return lut[seg]


def draw_fragments_3d(seg: np.ndarray, seed: int = 123) -> np.ndarray:
    return np.stack([draw_fragments_2d(seg[z], seed) for z in range(seg.shape[0])])


def embedding_pca(embedding_hwc: np.ndarray) -> np.ndarray:
    """Project an (H, W, C) embedding to RGB via PCA (top-3 components)."""
    h, w, c = embedding_hwc.shape
    flat = embedding_hwc.reshape(-1, c).astype(np.float64)
    flat = flat - flat.mean(axis=0, keepdims=True)
    u, s, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[:3].T
    lo, hi = proj.min(axis=0), proj.max(axis=0)
    proj = (proj - lo) / np.maximum(hi - lo, 1e-8)
    return (proj.reshape(h, w, 3) * 255).astype(np.uint8)


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float32)
    lo, hi = img.min(), img.max()
    return ((img - lo) / max(hi - lo, 1e-8) * 255).astype(np.uint8)


def val_show(iters: int, pred_aff: np.ndarray, gt_aff: np.ndarray,
             pred_seg: np.ndarray, gt_seg: np.ndarray, out_dir: str):
    """Side-by-side affinity/segmentation montage PNG."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    row1 = np.concatenate([_to_u8(pred_aff), _to_u8(gt_aff)], axis=1)
    row1 = np.repeat(row1[..., None], 3, axis=-1)
    row2 = np.concatenate([draw_fragments_2d(pred_seg),
                           draw_fragments_2d(gt_seg)], axis=1)
    h = min(row1.shape[1], row2.shape[1])
    montage = np.concatenate([row1[:, :h], row2[:, :h]], axis=0)
    cv2.imwrite(os.path.join(out_dir, f"{iters:06d}.png"), montage[:, :, ::-1])


def show_affs_emb(iters: int, image_hwc: np.ndarray, ema_image_hwc: np.ndarray,
                  pred_aff: np.ndarray, gt_aff: np.ndarray,
                  embedding_hwc: np.ndarray, ema_embedding_hwc: np.ndarray,
                  out_dir: str):
    """Train-time montage: inputs, EMA view, affinities, embedding PCAs."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    row1 = np.concatenate([_to_u8(image_hwc), _to_u8(ema_image_hwc)], axis=1)
    row2 = np.concatenate([np.repeat(_to_u8(pred_aff)[..., None], 3, -1),
                           np.repeat(_to_u8(gt_aff)[..., None], 3, -1)], axis=1)
    row3 = np.concatenate([embedding_pca(embedding_hwc),
                           embedding_pca(ema_embedding_hwc)], axis=1)
    w = min(row1.shape[1], row2.shape[1], row3.shape[1])
    montage = np.concatenate([row1[:, :w], row2[:, :w], row3[:, :w]], axis=0)
    cv2.imwrite(os.path.join(out_dir, f"{iters:06d}.png"), montage[:, :, ::-1])
