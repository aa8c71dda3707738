"""Oracle tests for the ported dead-ablation losses: superpixel pooling
(ops/spixel.py ~ scripts_cvppp/utils/train_utils.py:77-180 +
model/loss_spixel.py) and the local cosine embedding loss
(ops/losses_extra.py::local_embedding_loss ~ loss/loss_local.py:53-131).

The oracles below are independent loop-based numpy transcriptions of the
published formulas (per-cell / per-pair loops, torch.unique semantics), so
the vectorized jit implementations are pinned to the math rather than to
themselves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_embedded_affinity_tpu.ops.spixel import (
    poolfeat, upfeat, compute_semantic_pos_loss, _NEIGHBOR_OFFSETS,
)
from pixel_embedded_affinity_tpu.ops.losses_extra import local_embedding_loss


# ---------- loop oracles ----------

def _oracle_poolfeat(feat, prob, s):
    b, h, w, c = feat.shape
    ch, cw = h // s, w // s
    feat1 = np.concatenate([feat, np.ones((b, h, w, 1))], axis=-1)
    acc = np.zeros((b, ch, cw, c + 1))
    for k, (dy, dx) in enumerate(_NEIGHBOR_OFFSETS):
        for ci in range(ch):
            for cj in range(cw):
                si, sj = ci - dy, cj - dx  # source cell whose k-channel points here
                if 0 <= si < ch and 0 <= sj < cw:
                    win = feat1[:, si * s:(si + 1) * s, sj * s:(sj + 1) * s, :]
                    pk = prob[:, si * s:(si + 1) * s, sj * s:(sj + 1) * s, k:k + 1]
                    acc[:, ci, cj, :] += (win * pk).mean(axis=(1, 2))
    return acc[..., :-1] / (acc[..., -1:] + 1e-8)


def _oracle_upfeat(feat, prob, s):
    b, ch, cw, c = feat.shape
    out = np.zeros((b, ch * s, cw * s, c))
    for k, (dy, dx) in enumerate(_NEIGHBOR_OFFSETS):
        for i in range(ch * s):
            for j in range(cw * s):
                si, sj = i // s + dy, j // s + dx
                if 0 <= si < ch and 0 <= sj < cw:
                    out[:, i, j, :] += feat[:, si, sj, :] * prob[:, i, j, k:k + 1]
    return out


def _oracle_local(emb_bhwc, seg, neighbor, include_bg, norm):
    def l2n(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    b = emb_bhwc.shape[0]
    total = 0.0
    for bi in range(b):
        x = emb_bhwc[bi].reshape(-1, emb_bhwc.shape[-1])
        if norm:
            x = l2n(x)
        x = l2n(x)
        lab = seg[bi].reshape(-1)
        if not include_bg:
            keep = lab > 0
            lab, x = lab[keep], x[keep]
        uniq = np.unique(lab)
        mu = l2n(np.stack([x[lab == u].mean(axis=0) for u in uniq]))
        idx = {u: i for i, u in enumerate(uniq)}
        loss_inner = np.mean([mu[idx[l]] @ e for l, e in zip(lab, x)])

        n_rows = neighbor.shape[1]
        kmax = n_rows + 1
        indicator = np.zeros((kmax, kmax))
        indicator[0, :] = 1.0
        indicator[0, 0] = 0.0
        for i in range(1, kmax):
            indicator[i, 0] = 1.0  # prepended bg column, loss_local.py:89-91
            for v in neighbor[bi, i - 1]:
                if v < kmax:
                    indicator[i, v] = 1.0
        sub = indicator[np.ix_(uniq, uniq)]
        pair = np.abs(1.0 - mu @ mu.T)
        loss_inter = np.sum(pair * sub) / (np.sum(sub) + 1e12)
        total += loss_inner + loss_inter
    return total / b


# ---------- tests ----------

@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_poolfeat_matches_loop_oracle(rng):
    feat = rng.normal(size=(2, 8, 8, 3))
    prob = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 8, 8, 9))), axis=-1)
    got = np.asarray(poolfeat(jnp.asarray(feat), prob, 2, 2))
    want = _oracle_poolfeat(feat, np.asarray(prob), 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_upfeat_matches_loop_oracle(rng):
    feat = rng.normal(size=(2, 4, 4, 3))
    prob = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 8, 8, 9))), axis=-1)
    got = np.asarray(upfeat(jnp.asarray(feat), prob, 2, 2))
    want = _oracle_upfeat(feat, np.asarray(prob), 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pool_up_roundtrip_identity_on_center_onehot(rng):
    # pure-center assignment + cell-constant features => exact reconstruction
    cellvals = rng.normal(size=(1, 4, 4, 3))
    feat = np.repeat(np.repeat(cellvals, 2, 1), 2, 2)
    prob = np.zeros((1, 8, 8, 9))
    prob[..., 4] = 1.0
    pooled = poolfeat(jnp.asarray(feat), jnp.asarray(prob), 2, 2)
    np.testing.assert_allclose(np.asarray(pooled), cellvals, rtol=1e-5)
    recon = upfeat(pooled, jnp.asarray(prob), 2, 2)
    np.testing.assert_allclose(np.asarray(recon), feat, rtol=1e-5)


def test_semantic_pos_loss_matches_composed_oracle(rng):
    s, c_sem = 4, 5
    prob = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 8, 8, 9))), axis=-1)
    sem = jax.nn.one_hot(jnp.asarray(rng.integers(0, c_sem, (2, 8, 8))), c_sem)
    yy, xx = np.meshgrid(np.arange(8.0), np.arange(8.0), indexing="ij")
    pos = np.broadcast_to(np.stack([xx, yy], -1), (2, 8, 8, 2))
    labxy = jnp.concatenate([sem, jnp.asarray(pos, jnp.float32)], axis=-1)

    total, lsem, lpos = jax.jit(
        lambda p, f: compute_semantic_pos_loss(p, f, kernel_size=s))(prob, labxy)

    pooled = _oracle_poolfeat(np.asarray(labxy), np.asarray(prob), s)
    recon = _oracle_upfeat(pooled, np.asarray(prob), s)
    want_sem = -np.sum(np.log(recon[..., :-2] + 1e-8) * np.asarray(sem)) / 2
    err = recon[..., -2:] - pos
    want_pos = np.sum(np.sqrt((err ** 2).sum(-1))) / 2 * 0.003 / s
    np.testing.assert_allclose(float(lsem), 0.005 * want_sem, rtol=1e-4)
    np.testing.assert_allclose(float(lpos), 0.005 * want_pos, rtol=1e-4)
    np.testing.assert_allclose(float(total), 0.005 * (want_sem + want_pos), rtol=1e-4)


@pytest.mark.parametrize("include_bg", [True, False])
def test_local_embedding_loss_matches_unique_oracle(rng, include_bg):
    b, h, w, e, n_inst = 2, 12, 12, 6, 5
    emb = rng.normal(size=(b, h, w, e)).astype(np.float32)
    seg = rng.integers(0, n_inst + 1, (b, h, w)).astype(np.int32)
    seg[:, 0, 0] = 0  # keep bg + every instance present
    for u in range(1, n_inst + 1):
        seg[:, u, u] = u
    neighbor = rng.integers(0, n_inst + 1, (b, n_inst, 3)).astype(np.int32)

    got = float(jax.jit(
        lambda x, s, nb: local_embedding_loss(x, s, nb, include_bg=include_bg)
    )(jnp.asarray(emb), jnp.asarray(seg), jnp.asarray(neighbor)))
    want = _oracle_local(emb, seg, neighbor, include_bg, norm=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_local_embedding_loss_grad_finite(rng):
    emb = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, 4, (1, 8, 8)).astype(np.int32))
    nb = jnp.asarray(rng.integers(0, 4, (1, 3, 2)).astype(np.int32))
    g = jax.grad(lambda x: local_embedding_loss(x, seg, nb))(emb)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_instance_neighbor_lists_adjacency():
    from pixel_embedded_affinity_tpu.ops.losses_extra import instance_neighbor_lists
    seg = np.zeros((10, 10), np.int32)
    seg[1:4, 1:4] = 1
    seg[1:4, 4:7] = 2   # touches 1
    seg[7:9, 7:9] = 3   # isolated
    nb = instance_neighbor_lists(seg, n_rows=3, m=4)
    assert nb.shape == (3, 4)
    assert 2 in nb[0] and 1 in nb[1]
    assert not nb[2].any()
    # and it feeds the loss end-to-end
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(1, 10, 10, 4)), jnp.float32)
    val = local_embedding_loss(emb, jnp.asarray(seg)[None], jnp.asarray(nb)[None])
    assert bool(jnp.isfinite(val))
