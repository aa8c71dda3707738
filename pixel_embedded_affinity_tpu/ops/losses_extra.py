"""Loss ablation family (JAX).

Ports of the reference's alternative losses:
* discriminative_loss ~ scripts_cvppp/loss/loss_discriminative.py:7-63
  (pull/push/reg, delta_v=0.5, delta_d=1.5) — jit-compatible via a fixed
  max-instances segment-sum formulation instead of per-label Python loops.
* cosine-similarity variant (mode='official' / loss_embedding_exp.py):
  affinities clamped to [0, 1].
* distance-based embeddings_to_affinities ~ utils/emb2affs.py:63-75:
  ((2*delta - ||e - e'||) / (2*delta)) clamped at 0, squared; replication-pad
  shift semantics.
* rescaled (a+1)/2 variant ~ scripts_ac3ac4/loss/loss_embedding_mse.py
  norm2 (embedding2affs_3d ablations).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .emb2aff import normalize_embedding, _valid_mask_2d


def discriminative_loss(embedding_bhwc, seg_b, max_instances: int = 64,
                        delta_v: float = 0.5, delta_d: float = 1.5,
                        alpha: float = 1.0, beta: float = 1.0,
                        gamma: float = 0.001, include_background: bool = True):
    """Pull-push discriminative loss over instance centroids.

    seg_b: (B, H, W) int labels. Labels are bucketed into [0, max_instances);
    like the reference, background (0) participates as a cluster.
    """
    b, h, w, c = embedding_bhwc.shape
    emb = embedding_bhwc.reshape(b, h * w, c)
    seg = seg_b.reshape(b, h * w).astype(jnp.int32)
    if not include_background:
        valid = seg > 0
    else:
        valid = jnp.ones_like(seg, dtype=bool)
    seg = jnp.clip(seg, 0, max_instances - 1)

    onehot = jax.nn.one_hot(seg, max_instances, dtype=emb.dtype)
    onehot = onehot * valid[..., None]
    counts = onehot.sum(axis=1)  # (B, K)
    present = counts > 0
    sums = jnp.einsum("bnk,bnc->bkc", onehot, emb)
    means = sums / jnp.maximum(counts[..., None], 1.0)  # (B, K, C)

    # var (pull) loss: mean over pixels of relu(||e - mu|| - dv)^2, per label
    mu_per_pixel = jnp.einsum("bnk,bkc->bnc", onehot, means)
    dist = jnp.sqrt(jnp.sum((emb - mu_per_pixel) ** 2, axis=-1) + 1e-12)
    hinge = jax.nn.relu(dist - delta_v) ** 2
    per_label = jnp.einsum("bnk,bn->bk", onehot, hinge) / jnp.maximum(counts, 1.0)
    num_id = present.sum(axis=1).astype(emb.dtype)
    var_loss = (per_label.sum(axis=1) / jnp.maximum(num_id, 1.0)).mean()

    # dist (push) loss between centroids. The reference's Python loop only
    # ever evaluates i != j pairs of PRESENT instances; this vectorized
    # form materializes all pairs, so the sqrt must be epsilon-guarded —
    # norm(0) on the diagonal has a NaN gradient that the post-hoc
    # pair_mask cannot remove (0 * nan = nan in the cotangent).
    diff = means[:, :, None] - means[:, None, :]
    d = jnp.sqrt(jnp.sum(diff ** 2, axis=-1) + 1e-12)
    pair_mask = (present[:, :, None] & present[:, None, :]
                 & ~jnp.eye(max_instances, dtype=bool)[None])
    push = jax.nn.relu(2 * delta_d - d) ** 2 * pair_mask
    denom = jnp.maximum(num_id * (num_id - 1.0), 1.0)
    dist_loss = (push.sum(axis=(1, 2)) / denom / 2.0)
    dist_loss = jnp.where(num_id > 1, dist_loss, 0.0).mean()

    # reg loss on centroid norms (same epsilon guard: absent labels have
    # exactly-zero means)
    reg = jnp.sqrt(jnp.sum(means ** 2, axis=-1) + 1e-12) * present
    reg_loss = (reg.sum(axis=1) / jnp.maximum(num_id, 1.0)).mean()

    return alpha * var_loss + beta * dist_loss + gamma * reg_loss


def cosine_affinity_2d(embedding_bhwc, offsets, eps: float = 1e-6,
                       clamp: bool = True):
    """'official' cosine-similarity affinities (clamped [0,1]), valid padding."""
    n = embedding_bhwc / jnp.maximum(
        jnp.linalg.norm(embedding_bhwc, axis=-1, keepdims=True), eps)
    h, w = n.shape[1], n.shape[2]
    chans = []
    for oy, ox in offsets:
        shifted = jnp.roll(n, shift=(-int(oy), -int(ox)), axis=(1, 2))
        a = jnp.sum(n * shifted, axis=-1)
        if clamp:
            a = jnp.clip(a, 0.0, 1.0)
        a = a * _valid_mask_2d((h, w), (int(oy), int(ox)), a.dtype)[None]
        chans.append(a)
    return jnp.stack(chans, axis=1)


def _shift_replicate(x, off):
    """Replication-pad shift: value at p is x[clip(p + off)] (edge clamp)."""
    spatial_axes = tuple(range(1, x.ndim - 1))
    for axis, o in zip(spatial_axes, off):
        o = int(o)
        if o == 0:
            continue
        n = x.shape[axis]
        idx = jnp.clip(jnp.arange(n) + o, 0, n - 1)
        x = jnp.take(x, idx, axis=axis)
    return x


def embeddings_to_affinities_distance(embedding, offsets, delta: float = 1.5):
    """Distance affinities ((2d - ||e-e'||)/2d, clamped, squared); channels
    first output; replication-pad border semantics (emb2affs.py parity)."""
    chans = []
    for off in offsets:
        shifted = _shift_replicate(embedding, off)
        dist = jnp.linalg.norm(embedding - shifted, axis=-1)
        a = jnp.clip((2 * delta - dist) / (2 * delta), 0.0) ** 2
        chans.append(a)
    return jnp.stack(chans, axis=1)


def rescaled_affinity(affs):
    """(a + 1) / 2 clamped to [0, 1] — norm2-family ablation."""
    return jnp.clip((affs + 1.0) / 2.0, 0.0, 1.0)


def affinity_norm6_3d(embedding_bdhwc, offsets, ema_embedding=None):
    """norm6 affinities: ARBITRARY (z, y, x) offsets via replication-pad
    shifts of the normalized embedding (scripts_ac3ac4/loss/
    loss_embedding_mse.py:346-365; EMA form l.356-365). ``offsets`` as in
    ops.offsets.shift_channels_offsets; channels-first (B, K, D, H, W)."""
    n = normalize_embedding(embedding_bdhwc, axis=-1)
    other = (n if ema_embedding is None
             else normalize_embedding(ema_embedding, axis=-1))
    chans = []
    for off in offsets:
        inv = [-int(o) for o in off]
        shifted = _shift_replicate(other, inv)
        chans.append(jnp.sum(n * shifted, axis=-1))
    return jnp.stack(chans, axis=1)


def embedding_loss_norm6(embedding_bdhwc, target_bkdhw, weight_bkdhw,
                         criterion, offsets, ema_embedding=None):
    """loss + affinities for the norm6 arbitrary-offset path
    (embedding_loss_norm6 / ema_embedding_loss_norm6)."""
    affs = affinity_norm6_3d(embedding_bdhwc, offsets,
                             ema_embedding=ema_embedding)
    return criterion(affs, target_bkdhw, weight_bkdhw), affs


def orthogonal_affinity_2d(embedding_bhwc, offsets, mode: str = "cos"):
    """BBBC 'orthogonal' affinity variants (scripts_bbbc039v1/loss/
    loss_embedding_orthogonal.py:7-20): circular-roll neighbors of the
    normalized embedding; mode='cos' -> (dot + 1) / 2, else the L2 form
    1 - ||e - e'||^2 / 4; both clamped to [0, 1]. Channels-first."""
    n = normalize_embedding(embedding_bhwc, axis=-1)
    chans = []
    for oy, ox in offsets:
        shifted = jnp.roll(n, shift=(-int(oy), -int(ox)), axis=(1, 2))
        if mode == "cos":
            a = (jnp.sum(shifted * n, axis=-1) + 1.0) / 2.0
        else:
            a = 1.0 - jnp.sum((shifted - n) ** 2, axis=-1) / 4.0
        chans.append(jnp.clip(a, 0.0, 1.0))
    return jnp.stack(chans, axis=1)


def embedding_loss_orthogonal(embedding_bhwc, target_bkhw, weight_bkhw,
                              mask_bkhw, criterion, offsets,
                              affs0_weight: float = 1.0, mode: str = "cos"):
    """Orthogonal-variant training loss (loss_embedding_orthogonal.py:22-37):
    per-offset criterion(affs*mask, target*mask, weight), offsets 0-1
    scaled by affs0_weight."""
    affs = orthogonal_affinity_2d(embedding_bhwc, offsets, mode=mode)
    mask = mask_bkhw.astype(affs.dtype)
    loss = 0.0
    for i in range(len(offsets)):
        li = criterion(affs[:, i] * mask[:, i],
                       target_bkhw[:, i] * mask[:, i], weight_bkhw[:, i])
        loss = loss + (li * affs0_weight if i < 2 else li)
    return loss, affs


def local_embedding_loss(embedding_bhwc, seg_bhw, neighbor_bnm,
                         include_bg: bool = True, norm: bool = True):
    """Local cosine embedding loss ~ scripts_cvppp/loss/loss_local.py:53-131.

    Unwired ablation code in the reference (nothing imports loss_local.py);
    ported formula-exact for inventory completeness, jit-compatible via a
    fixed max-instances segment formulation (K = neighbor rows + 1, label
    value == segment id) instead of torch.unique + per-sample loops.

    embedding_bhwc: (B, H, W, E); seg_bhw: (B, H, W) int labels in
    [0, N]; neighbor_bnm: (B, N, M) adjacency lists — row i-1 holds the
    labels adjacent to instance i (0-padded, as the reference's __main__
    fixture implies). Two as-shipped quirks are preserved deliberately:

    * the inter-instance term divides by ``sum(mask) + 1e12`` (sic — the
      reference's literal constant, clearly a typo for 1e-12, which makes
      loss_inter ~ 1e-12 x its numerator), loss_local.py:106;
    * loss_inner is ``+mean(cos(mu, e))`` — minimizing it pushes pixels
      AWAY from their own centroid, loss_local.py:79 (one reason this
      ablation stayed unwired).

    NOTE (silent-merge behavior): labels are clipped to ``[0, N]`` in-jit
    (``jnp.clip`` below) — a seg map with MORE instances than
    ``neighbor_bnm`` has rows silently merges every overflow instance into
    segment N and returns a wrong loss with no error signal. Size
    ``neighbor_bnm`` so that ``N >= seg.max()`` (the
    :func:`instance_neighbor_lists` producer raises/warns when it cannot).
    """
    b, h, w, e = embedding_bhwc.shape
    n_rows = neighbor_bnm.shape[1]
    k = n_rows + 1  # label 0 = background row + one row per instance
    if norm:
        embedding_bhwc = normalize_embedding(embedding_bhwc, axis=-1)

    def one(emb_hwc, seg_hw, neighbor_nm):
        emb = normalize_embedding(emb_hwc.reshape(-1, e), axis=-1)
        lab = jnp.clip(seg_hw.reshape(-1).astype(jnp.int32), 0, k - 1)
        wpx = jnp.ones_like(lab, dtype=emb.dtype) if include_bg \
            else (lab > 0).astype(emb.dtype)

        onehot = jax.nn.one_hot(lab, k, dtype=emb.dtype) * wpx[:, None]
        counts = onehot.sum(axis=0)                     # (K,)
        present = counts > 0
        mu = normalize_embedding(
            jnp.einsum("pk,pe->ke", onehot, emb) / jnp.maximum(counts, 1.0)[:, None],
            axis=-1)

        # inner: mean over (kept) pixels of cos(mu[label], e) — sign as shipped
        cos_px = jnp.sum(mu[lab] * emb, axis=-1)
        loss_inner = jnp.sum(cos_px * wpx) / jnp.maximum(jnp.sum(wpx), 1.0)

        # inter: |1 - cos(mu_i, mu_j)| over present-label pairs allowed by
        # the adjacency indicator (bg row connects to everything but bg;
        # instance rows connect to bg + their neighbor list)
        pair = jnp.abs(1.0 - mu @ mu.T)                 # (K, K)
        cols = jnp.arange(k)
        adj = (jax.nn.one_hot(neighbor_nm.astype(jnp.int32), k).sum(axis=1) > 0)
        indicator = jnp.concatenate(
            [(cols != 0)[None, :],                      # bg row, loss_local.py:97-100
             adj | (cols == 0)[None, :]], axis=0).astype(emb.dtype)
        mask = indicator * present[:, None] * present[None, :]
        # (sic) + 1e12: the reference's literal denominator constant
        loss_inter = jnp.sum(pair * mask) / (jnp.sum(mask) + 1e12)
        return loss_inner + loss_inter

    return jnp.mean(jax.vmap(one)(embedding_bhwc, seg_bhw, neighbor_bnm))


def instance_neighbor_lists(seg_hw, n_rows: int, m: int, dilate: int = 1,
                            strict: bool = False):
    """Build the (N, M) neighbor lists local_embedding_loss consumes.

    The reference never shipped a producer for loss_local.py's `neighbor`
    input (its __main__ uses random ints); this host-side numpy helper
    derives real adjacency from a label map: instances a, b are neighbors
    when some pixel of a lies within `dilate` (Chebyshev) of a pixel of b.
    Row i-1 lists up to `m` neighbors of instance i, 0-padded — matching
    the 0-pad-means-bg convention the loss's prepended-bg-column implies.

    Capacity checks: labels > ``n_rows`` (which local_embedding_loss would
    silently clip-merge) and rows whose adjacency exceeds ``m`` (which
    would silently drop inter pairs) raise when ``strict=True`` and warn
    otherwise.
    """
    seg = np.asarray(seg_hw)
    max_lab = int(seg.max()) if seg.size else 0
    if max_lab > n_rows:
        msg = (f"instance_neighbor_lists: seg has labels up to {max_lab} but "
               f"n_rows={n_rows}; local_embedding_loss will clip-merge the "
               f"overflow instances")
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=2)
    pairs = set()
    for dy in range(-dilate, dilate + 1):
        for dx in range(-dilate, dilate + 1):
            if dy == 0 and dx == 0:
                continue
            a = seg[max(0, dy):seg.shape[0] + min(0, dy),
                    max(0, dx):seg.shape[1] + min(0, dx)]
            b = seg[max(0, -dy):seg.shape[0] + min(0, -dy),
                    max(0, -dx):seg.shape[1] + min(0, -dx)]
            touch = (a != b) & (a > 0) & (b > 0)
            pairs.update(map(tuple, np.unique(
                np.stack([a[touch], b[touch]], axis=1), axis=0)))
    out = np.zeros((n_rows, m), dtype=np.int32)
    fill = {i: 0 for i in range(1, n_rows + 1)}
    dropped = 0
    for a, b in sorted(pairs):
        if 1 <= a <= n_rows:
            if fill[a] < m:
                out[a - 1, fill[a]] = b
                fill[a] += 1
            else:
                dropped += 1
    if dropped:
        msg = (f"instance_neighbor_lists: {dropped} adjacency pairs dropped "
               f"(rows full at m={m}); the loss's inter term will miss them")
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=2)
    return out
