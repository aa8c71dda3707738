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
