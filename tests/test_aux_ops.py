"""Off-default-path reference components: instance boundaries, U-Net
weight maps, norm6 arbitrary-offset loss, orthogonal affinity variants.
Each is checked against a brute-force oracle transcribing the reference
semantics (scripts_cvppp/data/data_segmentation.py,
scripts_ac3ac4/loss/loss_embedding_mse.py,
scripts_bbbc039v1/loss/loss_embedding_orthogonal.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pixel_embedded_affinity_tpu.ops import (
    seg_to_instance_bd, weight_unet2d, weight_unet3d)
from pixel_embedded_affinity_tpu.ops.offsets import shift_channels_offsets
from pixel_embedded_affinity_tpu.ops.losses_extra import (
    affinity_norm6_3d, embedding_loss_norm6, orthogonal_affinity_2d,
    embedding_loss_orthogonal)
from pixel_embedded_affinity_tpu.ops.losses import weighted_mse


def _bd_oracle(seg, tsz_h, do_bg):
    """im2col max/min transcription of the reference loop."""
    t = tsz_h
    mm = seg.max()
    pad = np.pad(seg, t, mode="reflect")
    h, w = seg.shape
    out = np.zeros((h, w), np.uint8)
    for i in range(h):
        for j in range(w):
            patch = pad[i:i + 2 * t + 1, j:j + 2 * t + 1].ravel()
            p0 = patch.max()
            if do_bg:
                p1 = patch.min()
                out[i, j] = (p0 > 0) and (p0 != p1)
            else:
                pz = np.where(patch == 0, mm + 1, patch)
                p1 = pz.min()
                out[i, j] = (p0 != 0) and (p1 != 0) and (p0 != p1)
    return out


@pytest.mark.parametrize("do_bg", [False, True])
def test_seg_to_instance_bd_oracle(do_bg):
    rng = np.random.default_rng(0)
    seg = np.zeros((24, 20), np.uint16)
    seg[2:10, 3:9] = 1
    seg[8:20, 8:16] = 2
    seg[rng.random((24, 20)) < 0.05] = 0
    got = seg_to_instance_bd(seg, tsz_h=2, do_bg=do_bg)
    exp = _bd_oracle(seg, 2, do_bg)
    np.testing.assert_array_equal(got, exp)
    # 3D form = per-slice
    got3 = seg_to_instance_bd(np.stack([seg, seg.T[:20, :20] if False
                                        else seg]), tsz_h=2, do_bg=do_bg)
    np.testing.assert_array_equal(got3[0], exp)


def _unet_weight_oracle(seg, w0=10, sigma=5):
    """Brute-force transcription of the reference's pairwise-distance loop
    (find_boundaries replaced by the same 4-neighbor inner-boundary
    helper, since skimage is not in this image)."""
    from pixel_embedded_affinity_tpu.ops.affinity_np import _inner_boundaries

    find_boundaries = lambda m, mode: _inner_boundaries(m)
    seg_ids = np.unique(seg)
    seg_ids = seg_ids[seg_ids > 0]
    nrows, ncols = seg.shape
    dist_map = np.ones((nrows * ncols, 2)) * (nrows + ncols)
    x1, y1 = np.meshgrid(range(ncols), range(nrows))
    x1, y1 = x1.reshape(1, -1), y1.reshape(1, -1)
    for sid in seg_ids:
        bounds = find_boundaries(seg == sid, mode="inner")
        y2, x2 = np.nonzero(bounds)
        dist = np.sqrt((x2.reshape(-1, 1) - x1) ** 2
                       + (y2.reshape(-1, 1) - y1) ** 2).min(axis=0)
        m1 = dist < dist_map[:, 0]
        dist_map[m1, 1] = dist_map[m1, 0]
        dist_map[m1, 0] = dist[m1]
        m2 = ((dist > dist_map[:, 0]) & (dist < dist_map[:, 1])
              & np.logical_not(m1))
        dist_map[m2, 1] = dist[m2]
    if len(seg_ids) == 1:
        lm = w0 * np.exp(-(dist_map[:, 0] ** 2) / (2 * sigma ** 2))
    else:
        lm = w0 * np.exp(-(dist_map.sum(axis=1) ** 2) / (2 * sigma ** 2))
    lm = lm.reshape((nrows, ncols))
    wc_1 = (seg == 0).mean()
    lm[seg > 0] += wc_1
    lm[seg == 0] += 1 - wc_1
    return lm


def test_weight_unet2d_oracle():
    seg = np.zeros((28, 24), np.uint16)
    seg[3:12, 4:12] = 1
    seg[15:25, 10:20] = 2
    np.testing.assert_allclose(weight_unet2d(seg),
                               _unet_weight_oracle(seg), atol=1e-6)
    # single instance branch
    one = np.zeros((16, 16), np.uint16)
    one[4:10, 5:11] = 3
    np.testing.assert_allclose(weight_unet2d(one),
                               _unet_weight_oracle(one), atol=1e-6)
    vol = np.stack([seg, np.zeros_like(seg)])
    w3 = weight_unet3d(vol)
    np.testing.assert_allclose(w3[0], weight_unet2d(seg), atol=1e-6)
    np.testing.assert_array_equal(w3[1], 0)


def _shift_clamp_np(x, off):
    """edge-clamp shift of (B, D, H, W, C): value at p is x[clip(p+off)]."""
    for axis, o in zip((1, 2, 3), off):
        if o == 0:
            continue
        idx = np.clip(np.arange(x.shape[axis]) + o, 0, x.shape[axis] - 1)
        x = np.take(x, idx, axis=axis)
    return x


def test_affinity_norm6_oracle():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(2, 4, 8, 6, 5)).astype(np.float32)
    offsets = shift_channels_offsets(7)
    n = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    exp = np.stack([(n * _shift_clamp_np(n, [-o for o in off])).sum(-1)
                    for off in offsets], axis=1)
    got = np.asarray(affinity_norm6_3d(jnp.asarray(emb), offsets))
    np.testing.assert_allclose(got, exp, atol=1e-5)

    # EMA form + loss wrapper runs and matches criterion applied manually
    ema = rng.normal(size=emb.shape).astype(np.float32)
    tgt = rng.random((2, len(offsets), 4, 8, 6)).astype(np.float32)
    wm = np.ones_like(tgt)
    loss, affs = embedding_loss_norm6(
        jnp.asarray(emb), jnp.asarray(tgt), jnp.asarray(wm),
        weighted_mse, offsets, ema_embedding=jnp.asarray(ema))
    assert affs.shape == tgt.shape
    np.testing.assert_allclose(
        float(loss), float(weighted_mse(affs, tgt, wm)), rtol=1e-6)


def test_orthogonal_affinity_modes():
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(1, 10, 12, 6)).astype(np.float32)
    offsets = [(-1, 0), (0, -1), (-3, 0)]
    n = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    for mode in ("cos", "l2"):
        got = np.asarray(orthogonal_affinity_2d(jnp.asarray(emb), offsets,
                                                mode=mode))
        for i, (oy, ox) in enumerate(offsets):
            sh = np.roll(n, shift=(-oy, -ox), axis=(1, 2))
            if mode == "cos":
                exp = ((sh * n).sum(-1) + 1) / 2
            else:
                exp = 1 - ((sh - n) ** 2).sum(-1) / 4
            np.testing.assert_allclose(got[:, i], np.clip(exp, 0, 1),
                                       atol=1e-5)

    tgt = rng.random((1, 3, 10, 12)).astype(np.float32)
    wm = np.ones_like(tgt)
    mask = np.ones_like(tgt)
    loss, affs = embedding_loss_orthogonal(
        jnp.asarray(emb), jnp.asarray(tgt), jnp.asarray(wm),
        jnp.asarray(mask), weighted_mse, offsets, affs0_weight=2.0)
    manual = sum(
        float(weighted_mse(affs[:, i], tgt[:, i], wm[:, i]))
        * (2.0 if i < 2 else 1.0) for i in range(3))
    np.testing.assert_allclose(float(loss), manual, rtol=1e-5)
