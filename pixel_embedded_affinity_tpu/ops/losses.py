"""Embedding->affinity losses and criteria (JAX).

Parity targets (formulas, incl. their normalization quirks):
* WeightedMSE        ~ scripts_cvppp/loss/loss.py:106-124. NOTE: the reference
  normalizes by batch * prod(shape[2:]) of the tensor handed to the criterion;
  for the 2D per-offset call that tensor is (B, H, W), so the normalizer is
  B*W (not B*H*W). We reproduce this exactly — it is a constant loss scale
  that the published checkpoints were trained under.
* WeightedBCE        ~ loss.py:142-152 (mean of weight * BCE).
* embedding_loss     ~ scripts_cvppp/loss/loss_embedding_mse.py:18-47.
* ema_embedding_loss ~ loss_embedding_mse.py:79-95 (student vs rolled teacher;
  first two offsets scaled by affs0_weight).
* embedding_loss_norm1 / norm5 (3D) ~ scripts_ac3ac4/loss/loss_embedding_mse.py:
  7-27 / 169-194: per-channel criterion over the *sliced* slab, normalizer
  B * prod(slab spatial dims).
* BCE-style mask-head loss ~ scripts_cvppp/loss/loss.py:187-194
  (class-weighted cross entropy, weights = class pixel counts of the target).

Affinities flow channels-first (B, K, spatial...); embeddings channels-last.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .emb2aff import (
    normalize_embedding,
    embedding_to_affinity_2d,
)
from .emb2aff_pallas import fused_affinity_2d, fused_affinity_3d


Criterion = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray | None], jnp.ndarray]


# ---------------------------------------------------------------------------
# criteria
# ---------------------------------------------------------------------------

def weighted_mse(pred, target, weight=None):
    """sum(w * (p - t)^2) / (B * prod(shape[2:])) — reference normalization."""
    import numpy as _np
    norm = pred.shape[0] * (int(_np.prod(pred.shape[2:])) if pred.ndim > 2 else 1)
    d = (pred - target) ** 2
    if weight is not None:
        d = weight * d
    return jnp.sum(d) / norm


def mse(pred, target, weight=None):
    return jnp.mean((pred - target) ** 2)


def _bce(pred, target, eps=1e-12):
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def bce(pred, target, weight=None):
    return jnp.mean(_bce(pred, target))


def weighted_bce(pred, target, weight=None):
    b = _bce(pred, target)
    if weight is not None:
        b = weight * b
    return jnp.mean(b)


CRITERIA: dict[str, Criterion] = {
    "WeightedMSELoss": weighted_mse,
    "WeightedBCELoss": weighted_bce,
    "MSELoss": mse,
    "BCELoss": bce,
}


def mask_head_loss(logits_bhwc, target_mask_bhw, weight_rate=(10, 1)):
    """Class-weighted cross entropy on the binary mask head.

    Reference BCE_loss_func: CrossEntropyLoss with per-class weights set to the
    *pixel counts* [count(target==1), count(target==0)] -> weight for class 0
    is count(target==1) and vice versa... the reference passes
    weight=[n_fg, n_bg] as [w_class0, w_class1]; we reproduce that ordering.
    torch CE with class weights divides by the sum of sample weights.
    """
    t = target_mask_bhw.astype(jnp.int32)
    n_fg = jnp.sum(t == 1).astype(jnp.float32)
    n_bg = jnp.sum(t == 0).astype(jnp.float32)
    class_w = jnp.stack([n_fg, n_bg])  # weight[0]=count(1), weight[1]=count(0)
    logp = jax.nn.log_softmax(logits_bhwc, axis=-1)
    pick = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    w = class_w[t]
    return -jnp.sum(w * pick) / jnp.maximum(jnp.sum(w), 1e-12)


# ---------------------------------------------------------------------------
# 2D embedding losses
# ---------------------------------------------------------------------------

def _affs_2d(embedding_bhwc, offsets, use_pallas, interpret=False):
    if use_pallas:
        return fused_affinity_2d(embedding_bhwc, tuple(map(tuple, offsets)),
                                 32, interpret)
    return embedding_to_affinity_2d(embedding_bhwc, offsets, padding="valid")


def embedding_loss_2d(embedding_bhwc: jnp.ndarray,
                      target_bkhw: jnp.ndarray,
                      weightmap_bkhw: jnp.ndarray,
                      mask_bkhw: jnp.ndarray,
                      offsets: Sequence[Sequence[int]],
                      criterion: Criterion = weighted_mse,
                      use_pallas: bool = True,
                      interpret: bool = False,
                      fuse_loss: bool = False):
    """Self-affinity loss over all offsets. Returns (loss, affs (B,K,H,W)).

    Per offset k: criterion(affs_k * mask_k, target_k * mask_k, weight_k) with
    the reference's (B, H, W)-shaped call (normalizer B*W for WeightedMSE);
    losses summed over offsets.

    ``fuse_loss`` (requires use_pallas + WeightedMSE): the criterion is
    folded into the Pallas kernel — per-offset partial sums come out of the
    forward pass and the loss cotangent is formed in-tile on the backward,
    so the (B,K,H,W) target/weight/mask consumption and the affinity
    gradient never round-trip HBM. The returned affs are stop-gradient
    (monitoring only).
    """
    if fuse_loss and use_pallas and criterion is weighted_mse:
        from .emb2aff_pallas import fused_affinity_wmse_2d

        s, affs = fused_affinity_wmse_2d(
            embedding_bhwc, target_bkhw, weightmap_bkhw,
            mask_bkhw.astype(target_bkhw.dtype), tuple(map(tuple, offsets)),
            32, interpret)
        b, _, _, _ = embedding_bhwc.shape
        w = embedding_bhwc.shape[2]
        return jnp.sum(s) / (b * w), affs
    affs = _affs_2d(embedding_bhwc, offsets, use_pallas, interpret)
    mask = mask_bkhw.astype(affs.dtype)
    k = affs.shape[1]
    loss = 0.0
    for i in range(k):
        loss = loss + criterion(affs[:, i] * mask[:, i],
                                target_bkhw[:, i] * mask[:, i],
                                weightmap_bkhw[:, i])
    return loss, affs


def ema_embedding_loss_2d(embedding_bhwc: jnp.ndarray,
                          ema_embedding_bhwc: jnp.ndarray,
                          target_bkhw: jnp.ndarray,
                          weightmap_bkhw: jnp.ndarray,
                          mask_bkhw: jnp.ndarray,
                          offsets: Sequence[Sequence[int]],
                          criterion: Criterion = weighted_mse,
                          affs0_weight: float = 1.0,
                          use_pallas: bool = False,
                          interpret: bool = False,
                          fuse_loss: bool = False):
    """Cross-view loss: student embedding dotted with offset-shifted teacher.

    First two offsets are scaled by affs0_weight (reference parity).
    The caller is expected to pass a stop-gradient'ed (detached) teacher
    embedding: the reference detaches the un-flipped EMA view
    (scripts_cvppp/data/data_consistency.py:36 gt.detach().clone()), so
    gradients flow only through the student branch. train_step.py applies
    jax.lax.stop_gradient before calling this.

    ``fuse_loss``: criterion folded into the kernel (see embedding_loss_2d).
    """
    if fuse_loss and use_pallas and criterion is weighted_mse:
        from .emb2aff_pallas import fused_cross_affinity_wmse_2d

        s, affs = fused_cross_affinity_wmse_2d(
            embedding_bhwc, ema_embedding_bhwc, target_bkhw, weightmap_bkhw,
            mask_bkhw.astype(target_bkhw.dtype), tuple(map(tuple, offsets)),
            32, interpret)
        b = embedding_bhwc.shape[0]
        w = embedding_bhwc.shape[2]
        coeff = jnp.asarray([affs0_weight if i < 2 else 1.0
                             for i in range(len(offsets))], jnp.float32)
        return jnp.dot(s, coeff) / (b * w), affs
    if use_pallas:
        from .emb2aff_pallas import fused_cross_affinity_2d

        affs = fused_cross_affinity_2d(embedding_bhwc, ema_embedding_bhwc,
                                       tuple(map(tuple, offsets)), 32,
                                       interpret)
    else:
        from .emb2aff import cross_affinity_2d

        affs = cross_affinity_2d(embedding_bhwc, ema_embedding_bhwc, offsets)
    mask = mask_bkhw.astype(affs.dtype)
    loss = 0.0
    for i in range(len(offsets)):
        li = criterion(affs[:, i] * mask[:, i],
                       target_bkhw[:, i] * mask[:, i],
                       weightmap_bkhw[:, i])
        loss = loss + (li * affs0_weight if i < 2 else li)
    return loss, affs


def deep_supervision_losses_2d(embeddings: Sequence[jnp.ndarray],
                               downs: Sequence[jnp.ndarray],
                               offsets: Sequence[Sequence[int]],
                               neighbor: int = 4,
                               criterion: Criterion = weighted_mse,
                               use_pallas: bool = True,
                               interpret: bool = False):
    """Losses for the four auxiliary heads (scales 1/2..1/16).

    ``embeddings`` = [emd1(/2), emd2(/4), emd3(/8), emd4(/16)] channels-last.
    ``downs[k]`` packs (affs | weights | masks) along channel dim with
    nb_half * (4 - k) offsets each — reference main.py:284-287 layout.
    """
    nb_half = neighbor // 2
    total = 0.0
    for k, (emb, down) in enumerate(zip(embeddings, downs)):
        n_off = nb_half * (4 - k)
        t = down[:, 0:n_off]
        w = down[:, n_off:2 * n_off]
        m = down[:, 2 * n_off:3 * n_off]
        l, _ = embedding_loss_2d(emb, t, w, m, offsets[:n_off],
                                 criterion=criterion, use_pallas=use_pallas,
                                 interpret=interpret)
        total = total + l
    return total


# ---------------------------------------------------------------------------
# 3D embedding losses (norm1 / norm5)
# ---------------------------------------------------------------------------

def _slab_loss_3d(affs_full, target, weight, i, axis, s, criterion):
    """Apply criterion over the valid slab of channel i (sliced semantics)."""
    sl = [slice(None)] * 3
    sl[axis] = slice(s, None)
    sl = (slice(None),) + tuple(sl)
    a = affs_full[:, i][sl][:, None]  # (B,1,D',H',W')
    t = target[:, i][sl][:, None]
    w = weight[:, i][sl][:, None]
    return criterion(a, t, w)


def embedding_loss_norm1(embedding_bdhwc, target, weightmap,
                         criterion: Criterion = weighted_mse,
                         affs0_weight: float = 1.0, shift: int = 1,
                         ema_embedding_bdhwc=None):
    """3-channel unit-shift 3D loss (z, y, x). Returns (loss, affs (B,3,D,H,W)).

    With ``ema_embedding_bdhwc`` given, computes the cross-view variant
    (student at the high coordinate, teacher at the low coordinate).
    """
    n = normalize_embedding(embedding_bdhwc, axis=-1)
    n_lo = n if ema_embedding_bdhwc is None else normalize_embedding(
        ema_embedding_bdhwc, axis=-1)
    b, d, h, w, c = n.shape
    dims = (d, h, w)
    loss = 0.0
    chans = []
    for axis in range(3):
        s = shift
        sl_hi = [slice(None)] * 3
        sl_lo = [slice(None)] * 3
        sl_hi[axis] = slice(s, dims[axis])
        sl_lo[axis] = slice(0, dims[axis] - s)
        a = jnp.sum(n[(slice(None),) + tuple(sl_hi)] *
                    n_lo[(slice(None),) + tuple(sl_lo)], axis=-1)[:, None]
        sl_t = (slice(None), slice(axis, axis + 1)) + tuple(sl_hi)
        li = criterion(a, target[sl_t], weightmap[sl_t])
        loss = loss + (li * affs0_weight if axis == 0 else li)
        pad = [(0, 0), (0, 0), (0, 0), (0, 0), (0, 0)]
        pad[2 + axis] = (s, 0)
        chans.append(jnp.pad(a, pad))
    return loss, jnp.concatenate(chans, axis=1)


def embedding_loss_norm5(embedding_bdhwc, target, weightmap,
                         criterion: Criterion = weighted_mse,
                         affs0_weight: float = 1.0,
                         shifts=(1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27),
                         ema_embedding_bdhwc=None,
                         use_pallas: bool = True,
                         interpret: bool = False):
    """12-channel interleaved-shift 3D loss. Returns (loss, affs (B,K,D,H,W)).

    Channel i < 3 scaled by affs0_weight. Per-channel normalizer is the sliced
    slab size (reference parity).
    """
    if ema_embedding_bdhwc is None and use_pallas:
        affs = fused_affinity_3d(embedding_bdhwc, tuple(shifts), 32, interpret)
    elif ema_embedding_bdhwc is not None and use_pallas:
        from .emb2aff_pallas import fused_cross_affinity_3d

        affs = fused_cross_affinity_3d(embedding_bdhwc, ema_embedding_bdhwc,
                                       tuple(shifts), 32, interpret)
    else:
        n = normalize_embedding(embedding_bdhwc, axis=-1)
        n_lo = n if ema_embedding_bdhwc is None else normalize_embedding(
            ema_embedding_bdhwc, axis=-1)
        b, d, h, w, c = n.shape
        dims = (d, h, w)
        chans = []
        for i, s in enumerate(shifts):
            axis = i % 3
            sl_hi = [slice(None)] * 3
            sl_lo = [slice(None)] * 3
            sl_hi[axis] = slice(s, dims[axis])
            sl_lo[axis] = slice(0, dims[axis] - s)
            a = jnp.sum(n[(slice(None),) + tuple(sl_hi)] *
                        n_lo[(slice(None),) + tuple(sl_lo)], axis=-1)
            pad = [(0, 0), (0, 0), (0, 0), (0, 0)]
            pad[1 + axis] = (s, 0)
            chans.append(jnp.pad(a, pad))
        affs = jnp.stack(chans, axis=1)

    loss = 0.0
    for i, s in enumerate(shifts):
        li = _slab_loss_3d(affs, target, weightmap, i, i % 3, s, criterion)
        loss = loss + (li * affs0_weight if i < 3 else li)
    return loss, affs
