"""Device-side GT generation: label maps -> affinities/weights/pyramids in-jit.

The reference generates all supervision on the host and ships ~50 MB of
float targets per (2, 544, 544) batch to the device
(scripts_cvppp/main.py:228-238). Everything it computes is elementwise or a
reduction over the label map, so this module builds the targets ON DEVICE
from the int32 labels (~1 MB): the train step's host->device payload shrinks
~12x and the host stops burning CPU on GT generation.

Semantics parity (tested against the numpy path):
* ``gen_affs_jax``          == ops.affinity_np.gen_affs (incl. the padding=1
  out-of-bounds rule; masks mark in-bounds neighbors)
* ``weight_binary_ratio_jax`` == weight_binary_ratio per (batch, channel)
  plane, incl. the uniform-plane -> all-ones special case
* ``label_pyramid_jax``     == cv2.resize(..., INTER_NEAREST, fx=1/2^k),
  which equals strided slicing lab[::2^k, ::2^k] (verified empirically)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .emb2aff import _valid_mask_2d


def gen_affs_jax(labels_bhw: jnp.ndarray, offsets, padding: bool = True,
                 ignore: bool = False):
    """(B, H, W) int labels -> (affs, masks) both (B, K, H, W) float32."""
    h, w = labels_bhw.shape[1], labels_bhw.shape[2]
    affs, masks = [], []
    for off in offsets:
        oy, ox = int(off[0]), int(off[1])
        shifted = jnp.roll(labels_bhw, shift=(-oy, -ox), axis=(1, 2))
        # numpy-path mask: 1 iff p + offset is in bounds (the ones-map
        # shifted by -offset with zero fill) == this static validity mask
        valid = _valid_mask_2d((h, w), (oy, ox), jnp.float32)
        eq = (labels_bhw == shifted).astype(jnp.float32)
        if ignore:
            eq = eq * (labels_bhw != 0) * (shifted != 0)
        a = jnp.where(valid[None].astype(bool), eq,
                      1.0 if padding else 0.0)
        affs.append(a)
        masks.append(jnp.broadcast_to(valid[None],
                                      labels_bhw.shape).astype(jnp.float32))
    return jnp.stack(affs, axis=1), jnp.stack(masks, axis=1)


def weight_binary_ratio_jax(target_bkhw: jnp.ndarray,
                            alpha: float = 1.0) -> jnp.ndarray:
    """Per-(b, k)-plane inverse class-frequency weights (reference formula)."""
    binary = (target_bkhw != 0).astype(jnp.float32)
    frac = jnp.mean(binary, axis=(-2, -1), keepdims=True)
    uniform = (jnp.max(target_bkhw, axis=(-2, -1), keepdims=True)
               == jnp.min(target_bkhw, axis=(-2, -1), keepdims=True))
    frac = jnp.clip(frac, 5e-2, 0.99)
    w_hi = binary + alpha * frac / (1.0 - frac) * (1.0 - binary)
    w_lo = alpha * (1.0 - frac) / frac * binary + (1.0 - binary)
    w = jnp.where(frac > 0.5, w_hi, w_lo)
    return jnp.where(uniform, jnp.ones_like(w), w)


def label_pyramid_jax(labels_bhw: jnp.ndarray, num_levels: int = 4):
    """Nearest-neighbor /2^k pyramids (cv2 INTER_NEAREST parity).

    cv2 sizes outputs with round(n * 2^-k) (banker's) and reads src 2^k * i;
    strided slicing truncated to that size reproduces it exactly."""
    out = []
    h, w = labels_bhw.shape[1], labels_bhw.shape[2]
    for k in range(1, num_levels + 1):
        oh = round(h * 2.0 ** -k)
        ow = round(w * 2.0 ** -k)
        out.append(labels_bhw[:, :: 2 ** k, :: 2 ** k][:, :oh, :ow])
    return out


def build_targets_2d_jax(labels_bhw: jnp.ndarray, offsets, neighbor: int = 4,
                         padding: bool = True):
    """Full 2D supervision pack from labels, on device.

    Returns (affs, wmap, mask, downs) where downs[k] is the channel-stacked
    (affs | weights | masks) tensor for pyramid level k+1 with the truncated
    offset list — the exact layout the train step consumes.
    """
    nb_half = neighbor // 2
    affs, mask = gen_affs_jax(labels_bhw, offsets, padding=padding)
    wmap = weight_binary_ratio_jax(affs)
    downs = []
    for lvl, lab_d in enumerate(label_pyramid_jax(labels_bhw, 4)):
        n_off = nb_half * (4 - lvl)
        a, m = gen_affs_jax(lab_d, offsets[:n_off], padding=padding)
        w = weight_binary_ratio_jax(a)
        downs.append(jnp.concatenate([a, w, m], axis=1))
    return affs, wmap, mask, downs


def _mask_parity_note():
    """The numpy path's mask comes from shifting a ones-map by -offset with
    zero fill: mask[p] = 1 iff p + offset is in bounds — identical to the
    static validity mask used here (see tests/test_device_gt.py)."""


# ---------------------------------------------------------------------------
# 3D device-side GT (AC3/AC4 pipeline): the host ships ONLY the int32 label
# crop; the 12-channel affinities, per-channel inverse-frequency weights and
# xy pyramid targets are built in-jit. Parity targets:
# ops.affinity_np.seg_to_aff_3d / seg_to_aff_3d_12ch / weight_binary_ratio
# (themselves parity-tested against scripts_ac3ac4/data/data_affinity.py:53
# and data_provider_labeled_deep.py:246-263).
# ---------------------------------------------------------------------------


def _aff_channel_3d(labels_bdhw: jnp.ndarray, offset) -> jnp.ndarray:
    """One affinity channel: 1 iff seg[p] == seg[p+offset] and both > 0,
    out-of-bounds region 0 (connectomics pad='' semantics)."""
    oz, oy, ox = (int(offset[0]), int(offset[1]), int(offset[2]))
    shifted = jnp.roll(labels_bdhw, shift=(-oz, -oy, -ox), axis=(1, 2, 3))
    eq = ((labels_bdhw == shifted) & (labels_bdhw > 0)
          & (shifted > 0)).astype(jnp.float32)
    # zero the wrapped region: for negative offsets the INVALID band is the
    # leading |o| indices of each shifted axis (seg[p+o] out of bounds)
    d, h, w = labels_bdhw.shape[1:]
    valid = jnp.ones((d, h, w), jnp.float32)
    for axis_len, o, axis in ((d, oz, 0), (h, oy, 1), (w, ox, 2)):
        idx = jnp.arange(axis_len)
        if o < 0:
            v = (idx >= -o)
        elif o > 0:
            v = (idx < axis_len - o)
        else:
            continue
        shape = [1, 1, 1]
        shape[axis] = axis_len
        valid = valid * v.reshape(shape).astype(jnp.float32)
    return eq * valid[None]


def seg_to_aff_3d_12ch_jax(labels_bdhw: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W) int labels -> (B, 12, D, H, W) GT affinities with the
    fixed shift table (z,y,x) interleaved (seg_to_aff_3d_12ch parity)."""
    groups = [
        ((-1, 0, 0), (0, -1, 0), (0, 0, -1)),
        ((-2, 0, 0), (0, -3, 0), (0, 0, -3)),
        ((-3, 0, 0), (0, -9, 0), (0, 0, -9)),
        ((-4, 0, 0), (0, -27, 0), (0, 0, -27)),
    ]
    chans = [_aff_channel_3d(labels_bdhw, off)
             for g in groups for off in g]
    return jnp.stack(chans, axis=1)


def seg_to_aff_3d_unit_jax(labels_bdhw: jnp.ndarray) -> jnp.ndarray:
    """Unit-nhood (B, 3, D, H, W) affinities with pad='replicate': the
    leading face of each axis is filled with that face's FG mask
    (seg_to_aff_3d default semantics, used for the pyramid levels)."""
    offs = ((-1, 0, 0), (0, -1, 0), (0, 0, -1))
    chans = []
    fg = (labels_bdhw > 0).astype(jnp.float32)
    for e, o in enumerate(offs):
        a = _aff_channel_3d(labels_bdhw, o)
        face = [slice(None)] * 4
        face[e + 1] = slice(0, 1)
        a = a.at[tuple(face)].set(fg[tuple(face)])
        chans.append(a)
    return jnp.stack(chans, axis=1)


def weight_binary_ratio_3d_jax(target_bkdhw: jnp.ndarray,
                               alpha: float = 1.0) -> jnp.ndarray:
    """Per-(b, k)-VOLUME inverse class-frequency weights — the 3D provider
    computes one fraction per channel over the whole (D, H, W) crop."""
    binary = (target_bkdhw != 0).astype(jnp.float32)
    frac = jnp.mean(binary, axis=(-3, -2, -1), keepdims=True)
    uniform = (jnp.max(target_bkdhw, axis=(-3, -2, -1), keepdims=True)
               == jnp.min(target_bkdhw, axis=(-3, -2, -1), keepdims=True))
    frac = jnp.clip(frac, 5e-2, 0.99)
    w_hi = binary + alpha * frac / (1.0 - frac) * (1.0 - binary)
    w_lo = alpha * (1.0 - frac) / frac * binary + (1.0 - binary)
    w = jnp.where(frac > 0.5, w_hi, w_lo)
    return jnp.where(uniform, jnp.ones_like(w), w)


def label_pyramid_xy_jax(labels_bdhw: jnp.ndarray, num_levels: int = 4):
    """xy-only nearest pyramids (cv2 INTER_NEAREST per-slice parity via
    strided slicing, as in label_pyramid_jax)."""
    out = []
    h, w = labels_bdhw.shape[2], labels_bdhw.shape[3]
    for k in range(1, num_levels + 1):
        oh = round(h * 2.0 ** -k)
        ow = round(w * 2.0 ** -k)
        out.append(labels_bdhw[:, :, :: 2 ** k, :: 2 ** k][:, :, :oh, :ow])
    return out


def build_targets_3d_jax(labels_bdhw: jnp.ndarray):
    """Full 3D supervision pack on device: (affs, wmap, downs) where
    downs[k] = (B, 6, D, H/2^{k+1}, W/2^{k+1}) channel-stacked
    (unit affs | weights) — the layout make_train_step_3d consumes."""
    affs = seg_to_aff_3d_12ch_jax(labels_bdhw)
    wmap = weight_binary_ratio_3d_jax(affs)
    downs = []
    for lab_d in label_pyramid_xy_jax(labels_bdhw, 4):
        a = seg_to_aff_3d_unit_jax(lab_d)
        w = weight_binary_ratio_3d_jax(a)
        downs.append(jnp.concatenate([a, w], axis=1))
    return affs, wmap, downs
