"""Shared model utilities: align-corners resizes, padding helpers.

All models are channels-last (NHWC / NDHWC) — the TPU-native conv layout.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _align_corners_plan(in_size: int, out_size: int):
    """Static gather plan for 1D align_corners=True linear interpolation."""
    if out_size == 1 or in_size == 1:
        lo = np.zeros(out_size, np.int32)
        return lo, lo, np.zeros(out_size, np.float32)
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(np.int32)
    lo = np.minimum(lo, in_size - 2)
    w = (src - lo).astype(np.float32)
    return lo, lo + 1, w


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out, in) align-corners linear interpolation matrix."""
    lo, hi, w = _align_corners_plan(in_size, out_size)
    a = np.zeros((out_size, in_size), np.float32)
    idx = np.arange(out_size)
    np.add.at(a, (idx, lo), 1.0 - w)
    np.add.at(a, (idx, hi), w)
    return a


def upsample_align_corners(x: jnp.ndarray, axes: tuple[int, ...],
                           factors: tuple[int, ...]) -> jnp.ndarray:
    """Linear upsampling with torch align_corners=True semantics.

    Matches torch nn.Upsample(scale_factor=f, mode='bilinear'/'trilinear',
    align_corners=True) along the given axes. Implemented as a per-axis
    matmul against a static interpolation matrix: on TPU this rides the MXU
    and is ~6x faster than the gather-based formulation (gathers re-read the
    full tensor per take; the matmul is one fused pass).
    """
    import jax

    letters = "bdhwc"[: x.ndim]
    for axis, f in zip(axes, factors):
        if f == 1:
            continue
        in_size = x.shape[axis]
        a = jnp.asarray(_interp_matrix(in_size, in_size * f), dtype=x.dtype)
        in_l = letters[axis]
        spec = f"o{in_l},{letters}->{letters.replace(in_l, 'o')}"
        x = jnp.einsum(spec, a, x,
                       precision=jax.lax.Precision.HIGHEST)
    return x


def replication_pad_to(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Edge-replicate pad trailing spatial dims (H, W of NHWC) up to target.

    Mirrors the reference's ReplicationPad2d concat fix
    (scripts_cvppp/model/unet2d_residual.py:316-322) for odd skip shapes.
    """
    h, w = x.shape[1], x.shape[2]
    ph, pw = target_h - h, target_w - w
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0), (0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 3)
    return jnp.pad(x, pad, mode="edge")
