"""Embedding -> multi-offset affinity, pure-jnp reference implementation.

This is the correctness oracle for the fused Pallas kernel
(:mod:`.emb2aff_pallas`). Embeddings are channels-last (TPU/model-friendly):
(B, H, W, C) or (B, D, H, W, C). Affinities are channels-FIRST —
(B, K, H, W) / (B, K, D, H, W) — one channel per offset, matching what the
host post-processing (mutex watershed etc.) consumes.

Semantics: affinity channel k at pixel p is the dot product of the
L2-normalized embeddings at p and p + offsets[k].

Border modes:
* ``'valid'``   (default): affinity is 0 where p + offset is out of bounds.
  This matches the reference 3D path exactly
  (scripts_ac3ac4/loss/loss_embedding_mse.py:169-194 initializes affs to zero
  and writes only the valid slab) and matches the 2D path everywhere the loss
  mask is 1 / the mutex-watershed reads an edge.
* ``'circular'``: torch.roll wrap-around parity with the reference 2D path
  (scripts_cvppp/loss/loss_embedding_mse.py:7-16) for bit-level comparisons.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalize_embedding(e: jnp.ndarray, axis: int = -1,
                        eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalize, torch.nn.functional.normalize semantics (norm clamped to eps).

    The squared norm gets a denormal-scale floor before the sqrt so the
    gradient at an all-zero vector is 0 (jnp.sqrt would give NaN; torch's
    norm uses the 0 subgradient there). Forward change is < 1e-18.
    """
    norm = jnp.sqrt(jnp.sum(e * e, axis=axis, keepdims=True) + 1e-36)
    return e / jnp.maximum(norm, eps)


def _valid_mask_2d(shape_hw, off, dtype):
    h, w = shape_hw
    oy, ox = off
    ys = np.zeros((h, 1), dtype=bool)
    xs = np.zeros((1, w), dtype=bool)
    yy = np.arange(h)[:, None] + oy
    xx = np.arange(w)[None, :] + ox
    ys = (yy >= 0) & (yy < h)
    xs = (xx >= 0) & (xx < w)
    return jnp.asarray((ys & xs).astype(dtype))


def embedding_to_affinity_2d(embedding: jnp.ndarray,
                             offsets,
                             normalize: bool = True,
                             padding: str = "valid") -> jnp.ndarray:
    """(B, H, W, C) embeddings -> (B, K, H, W) affinities.

    affs[..., k][y, x] = <N[y, x], N[y + oy_k, x + ox_k]>.
    """
    assert padding in ("valid", "circular")
    if normalize:
        n = normalize_embedding(embedding, axis=-1)
    else:
        n = embedding
    h, w = n.shape[1], n.shape[2]
    chans = []
    for off in offsets:
        oy, ox = int(off[0]), int(off[1])
        # neighbor value at p is n[p + off]: roll content by -off
        shifted = jnp.roll(n, shift=(-oy, -ox), axis=(1, 2))
        a = jnp.sum(n * shifted, axis=-1)
        if padding == "valid":
            a = a * _valid_mask_2d((h, w), (oy, ox), a.dtype)[None]
        chans.append(a)
    return jnp.stack(chans, axis=1)


def _shift_valid_nchw(n: jnp.ndarray, oy: int, ox: int) -> jnp.ndarray:
    """shifted[..., y, x] = n[..., y+oy, x+ox], zero where out of bounds."""
    h, w = n.shape[-2], n.shape[-1]

    def axis_shift(t, o, ax, size):
        if o == 0:
            return t
        zeros_shape = list(t.shape)
        zeros_shape[ax] = abs(o)
        z = jnp.zeros(zeros_shape, t.dtype)
        if o > 0:
            kept = jax.lax.slice_in_dim(t, o, size, axis=ax)
            return jnp.concatenate([kept, z], axis=ax)
        kept = jax.lax.slice_in_dim(t, 0, size + o, axis=ax)
        return jnp.concatenate([z, kept], axis=ax)

    return axis_shift(axis_shift(n, oy, -2, h), ox, -1, w)


def affinity_2d_small_batch(embedding: jnp.ndarray, offsets,
                            normalize: bool = True) -> jnp.ndarray:
    """(B, H, W, C) embedding -> (B, K, H, W) valid-padding affinities,
    pure XLA, arranged for small-batch TPU serving.

    Matches ``embedding_to_affinity_2d(e, offsets, padding='valid')`` (and
    therefore the fused Pallas kernel) exactly, but avoids the TPU custom
    call: at B=1 the mere PRESENCE of a Mosaic custom call consuming the
    network output demotes the upstream high-res convs to a slow T(2,128)
    emitter costing ~3.7 ms — measured with a trivial Pallas identity
    kernel in every operand arrangement (docs/profile_b1_arrange.py,
    PERF.md round 5). Design: NCHW arrangement so W rides the 128-lane
    minor dim (the naive NHWC roll chain lane-pads C=16 by 8x and measured
    16.7 ms), pad+slice shifts (no wraparound), one fused multiply-reduce
    per offset, f32 compute.
    """
    e = jnp.transpose(embedding, (0, 3, 1, 2)).astype(jnp.float32)
    if normalize:
        norm = jnp.sqrt(jnp.sum(e * e, axis=1, keepdims=True) + 1e-36)
        n = e / jnp.maximum(norm, 1e-12)
    else:
        n = e
    chans = [jnp.sum(n * _shift_valid_nchw(n, int(o[0]), int(o[1])), axis=1)
             for o in offsets]
    return jnp.stack(chans, axis=1)


def cross_affinity_2d(embedding: jnp.ndarray, other: jnp.ndarray,
                      offsets, normalize: bool = True,
                      padding: str = "valid") -> jnp.ndarray:
    """Cross-view affinities: <N_a[p], N_b[p + offset]> -> (B, K, H, W).

    The EMA-consistency loss dots the student embedding against the
    offset-shifted TEACHER embedding (loss_embedding_mse.py:68-77).
    """
    assert padding in ("valid", "circular")
    n_a = normalize_embedding(embedding, axis=-1) if normalize else embedding
    n_b = normalize_embedding(other, axis=-1) if normalize else other
    h, w = n_a.shape[1], n_a.shape[2]
    chans = []
    for off in offsets:
        oy, ox = int(off[0]), int(off[1])
        shifted = jnp.roll(n_b, shift=(-oy, -ox), axis=(1, 2))
        a = jnp.sum(n_a * shifted, axis=-1)
        if padding == "valid":
            a = a * _valid_mask_2d((h, w), (oy, ox), a.dtype)[None]
        chans.append(a)
    return jnp.stack(chans, axis=1)


def embedding_to_affinity_3d(embedding: jnp.ndarray,
                             shifts=(1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27),
                             normalize: bool = True) -> jnp.ndarray:
    """(B, D, H, W, C) embeddings -> (B, K, D, H, W) affinities.

    Channel i shifts along spatial axis i % 3 (z, y, x) by shifts[i] in the
    negative direction; out-of-bounds slab is zero — exact reference
    ``inf_embedding_loss_norm5`` semantics.
    """
    if normalize:
        n = normalize_embedding(embedding, axis=-1)
    else:
        n = embedding
    b, d, h, w, c = n.shape
    dims = (d, h, w)
    chans = []
    for i, s in enumerate(shifts):
        axis = i % 3
        size = dims[axis]
        sl_hi = [slice(None)] * 3
        sl_lo = [slice(None)] * 3
        sl_hi[axis] = slice(s, size)
        sl_lo[axis] = slice(0, size - s)
        hi = n[(slice(None),) + tuple(sl_hi)]
        lo = n[(slice(None),) + tuple(sl_lo)]
        a = jnp.sum(hi * lo, axis=-1)
        pad_widths = [(0, 0), (0, 0), (0, 0), (0, 0)]
        pad_widths[1 + axis] = (s, 0)
        chans.append(jnp.pad(a, pad_widths))
    return jnp.stack(chans, axis=1)
