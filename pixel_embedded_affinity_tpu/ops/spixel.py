"""Superpixel (SSN-style) soft pooling ops + the spixel ablation loss.

Ports of the reference's dead-but-shipped superpixel machinery:
* poolfeat / upfeat ~ scripts_cvppp/utils/train_utils.py:77-132 / :134-180
  (9-neighbor soft pixel<->superpixel aggregation from SSN/SpixelFCN).
* compute_semantic_pos_loss ~ scripts_cvppp/model/loss_spixel.py:6-37
  (semantic cross-entropy + positional L2, both reconstructed through the
  soft assignment; weights 0.005 / pos_weight/S exactly as shipped).

Nothing in the reference imports these (they are unwired ablation code);
they are ported for inventory completeness and kept jit-compatible. The
layout here is TPU-idiomatic NHWC — feat (B, H, W, C), prob (B, H, W, 9) —
where the reference uses NCHW; the 9 neighbor channels keep the reference's
row-major order: 0=top-left, 1=top, 2=top-right, 3=left, 4=center,
5=right, 6=bottom-left, 7=bottom, 8=bottom-right.
"""

from __future__ import annotations

import jax.numpy as jnp

# (dy, dx) per prob channel, reference channel order (train_utils.py:92-126)
_NEIGHBOR_OFFSETS = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 0), (0, 1),
    (1, -1), (1, 0), (1, 1),
)


def _shift2d_zero(x, dy: int, dx: int):
    """out[i, j] = x[i + dy, j + dx], zero-filled out of range (axes 1, 2)."""
    h, w = x.shape[1], x.shape[2]
    pad = [(0, 0), (1, 1), (1, 1)] + [(0, 0)] * (x.ndim - 3)
    xp = jnp.pad(x, pad)
    return xp[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


def _avg_pool(x, sp_h: int, sp_w: int):
    b, h, w, c = x.shape
    if h % sp_h or w % sp_w:
        raise ValueError(f"poolfeat needs H,W divisible by the cell: {(h, w)} vs {(sp_h, sp_w)}")
    return x.reshape(b, h // sp_h, sp_h, w // sp_w, sp_w, c).mean(axis=(2, 4))


def poolfeat(feat, prob, sp_h: int = 2, sp_w: int = 2):
    """Soft pixel->superpixel pooling (train_utils.py:77-132).

    feat: (B, H, W, C); prob: (B, H, W, 9) soft assignment to the 9
    surrounding superpixel cells. Returns (B, H/sp_h, W/sp_w, C): for each
    cell, the probability-weighted mean of member pixels' features, where a
    pixel in cell (i, j) contributes to cell (i+dy, j+dx) through prob
    channel k=(dy, dx). Matches the reference's avg_pool + opposite-shift
    accumulation with its 1e-8 mass guard.
    """
    ones = jnp.ones(feat.shape[:3] + (1,), feat.dtype)
    feat1 = jnp.concatenate([feat, ones], axis=-1)  # carry the prob mass
    acc = 0.0
    for k, (dy, dx) in enumerate(_NEIGHBOR_OFFSETS):
        pooled = _avg_pool(feat1 * prob[..., k:k + 1], sp_h, sp_w)
        # the cell at (i, j) receives the (dy, dx)-pointing mass pooled at
        # the neighboring cell (i - dy, j - dx) shifted back onto it
        acc = acc + _shift2d_zero(pooled, -dy, -dx)
    return acc[..., :-1] / (acc[..., -1:] + 1e-8)


def upfeat(feat, prob, up_h: int = 2, up_w: int = 2):
    """Soft superpixel->pixel reconstruction (train_utils.py:134-180).

    feat: (B, h, w, C) per-cell features; prob: (B, h*up_h, w*up_w, 9).
    Each pixel reads its 9 candidate cells (nearest-upsampled, zero out of
    range) and blends them with its assignment probabilities.
    """
    out = 0.0
    for k, (dy, dx) in enumerate(_NEIGHBOR_OFFSETS):
        shifted = _shift2d_zero(feat, dy, dx)
        up = jnp.repeat(jnp.repeat(shifted, up_h, axis=1), up_w, axis=2)
        out = out + up * prob[..., k:k + 1]
    return out


def compute_semantic_pos_loss(prob, labxy_feat, pos_weight: float = 0.003,
                              kernel_size: int = 16):
    """Superpixel loss ~ scripts_cvppp/model/loss_spixel.py:6-37.

    prob: (B, H, W, 9) soft assignment; labxy_feat: (B, H, W, C) with the
    LAST TWO channels the (x, y) position features and the rest one-hot
    semantics. Pools pixel features to superpixels and reconstructs them;
    semantic term is a self-built cross-entropy on the reconstruction,
    positional term the per-pixel L2 of the position error, scaled by
    pos_weight / kernel_size. Returns (loss_sum, loss_sem_sum,
    loss_pos_sum) with the reference's literal 0.005 outer scale.
    """
    s = kernel_size
    b = labxy_feat.shape[0]
    pooled = poolfeat(labxy_feat, prob, s, s)
    reconstr = upfeat(pooled, prob, s, s)

    loss_map = reconstr[..., -2:] - labxy_feat[..., -2:]
    logit = jnp.log(reconstr[..., :-2] + 1e-8)
    loss_sem = -jnp.sum(logit * labxy_feat[..., :-2]) / b
    loss_pos = jnp.sum(jnp.sqrt(jnp.sum(loss_map ** 2, axis=-1))) / b * pos_weight / s

    loss_sum = 0.005 * (loss_sem + loss_pos)
    return loss_sum, 0.005 * loss_sem, 0.005 * loss_pos
