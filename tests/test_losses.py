"""Parity tests for the loss stack against reference formulas.

Oracles are written inline in NumPy (torch.roll semantics via np.roll), and
the mask-head loss is checked against torch.nn.CrossEntropyLoss directly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pixel_embedded_affinity_tpu.ops import multi_offset
from pixel_embedded_affinity_tpu.ops.losses import (
    weighted_mse, weighted_bce, mse, bce,
    embedding_loss_2d, ema_embedding_loss_2d, deep_supervision_losses_2d,
    embedding_loss_norm1, embedding_loss_norm5, mask_head_loss,
)


def np_normalize(e, axis, eps=1e-12):
    n = np.sqrt((e * e).sum(axis=axis, keepdims=True))
    return e / np.maximum(n, eps)


def ref_weighted_mse(pred, target, weight):
    norm = pred.shape[0] * int(np.prod(pred.shape[2:])) if pred.ndim > 2 else pred.shape[0]
    return (weight * (pred - target) ** 2).sum() / norm


def ref_embedding_loss_2d(emb_bchw, target, weight, mask, offsets):
    """Reference loss via np.roll (torch.roll parity), NCHW embedding."""
    n = np_normalize(emb_bchw, axis=1)
    loss = 0.0
    affs = np.zeros_like(target)
    for i, off in enumerate(offsets):
        shift_off = tuple(-x for x in off)
        shifted = np.roll(n, shift=shift_off, axis=(2, 3))
        a = (n * shifted).sum(axis=1)
        m = mask[:, i].astype(np.float64)
        loss += ref_weighted_mse(a * m, target[:, i] * m, weight[:, i])
        affs[:, i] = a
    return loss, affs


def make_2d_case(seed=0, b=2, h=20, w=24, c=8, shifts=(1, 3)):
    rng = np.random.default_rng(seed)
    offsets = multi_offset(list(shifts), neighbor=4)
    emb = rng.normal(size=(b, h, w, c)).astype(np.float32)
    target = (rng.random((b, len(offsets), h, w)) > 0.5).astype(np.float32)
    weight = rng.random((b, len(offsets), h, w)).astype(np.float32) + 0.5
    # validity mask for each offset (neighbor in bounds)
    mask = np.zeros_like(target, dtype=np.uint8)
    for i, (oy, ox) in enumerate(offsets):
        yy = np.arange(h)[:, None] + oy
        xx = np.arange(w)[None, :] + ox
        mask[:, i] = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)).astype(np.uint8)
    return emb, target, weight, mask, offsets


def test_weighted_mse_reference_normalization():
    rng = np.random.default_rng(0)
    p = rng.random((2, 5, 7)).astype(np.float32)
    t = rng.random((2, 5, 7)).astype(np.float32)
    w = rng.random((2, 5, 7)).astype(np.float32)
    got = float(weighted_mse(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w)))
    exp = (w * (p - t) ** 2).sum() / (2 * 7)  # B * prod(shape[2:]) quirk
    assert np.allclose(got, exp, rtol=1e-5)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_embedding_loss_2d_parity(use_pallas):
    emb, target, weight, mask, offsets = make_2d_case(h=40, w=48, shifts=(1, 3, 5))
    got_loss, got_affs = embedding_loss_2d(
        jnp.asarray(emb), jnp.asarray(target), jnp.asarray(weight),
        jnp.asarray(mask), offsets, use_pallas=use_pallas, interpret=use_pallas)
    # oracle works in NCHW with circular roll; mask zeroes the wrap band so
    # the loss matches; affinities compared on the valid region only.
    exp_loss, exp_affs = ref_embedding_loss_2d(
        np.transpose(emb, (0, 3, 1, 2)), target, weight, mask, offsets)
    assert np.allclose(float(got_loss), exp_loss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_affs) * mask, exp_affs * mask,
                               atol=1e-5)


def test_ema_embedding_loss_2d_parity():
    emb, target, weight, mask, offsets = make_2d_case(seed=3)
    rng = np.random.default_rng(4)
    ema = rng.normal(size=emb.shape).astype(np.float32)
    affs0_weight = 2.0
    got_loss, _ = ema_embedding_loss_2d(
        jnp.asarray(emb), jnp.asarray(ema), jnp.asarray(target),
        jnp.asarray(weight), jnp.asarray(mask), offsets,
        affs0_weight=affs0_weight)

    n_s = np_normalize(np.transpose(emb, (0, 3, 1, 2)), axis=1)
    n_t = np_normalize(np.transpose(ema, (0, 3, 1, 2)), axis=1)
    exp = 0.0
    for i, off in enumerate(offsets):
        shifted = np.roll(n_t, shift=tuple(-x for x in off), axis=(2, 3))
        a = (n_s * shifted).sum(1)
        m = mask[:, i]
        li = ref_weighted_mse(a * m, target[:, i] * m, weight[:, i])
        exp += li * affs0_weight if i < 2 else li
    assert np.allclose(float(got_loss), exp, rtol=1e-4)


def test_embedding_loss_norm1_3d():
    rng = np.random.default_rng(5)
    b, d, h, w, c = 1, 5, 10, 12, 6
    emb = rng.normal(size=(b, d, h, w, c)).astype(np.float32)
    target = (rng.random((b, 3, d, h, w)) > 0.5).astype(np.float32)
    weight = rng.random((b, 3, d, h, w)).astype(np.float32)
    got_loss, got_affs = embedding_loss_norm1(
        jnp.asarray(emb), jnp.asarray(target), jnp.asarray(weight),
        affs0_weight=1.5)

    n = np_normalize(emb, axis=-1)
    exp = 0.0
    # z channel
    a0 = (n[:, 1:] * n[:, :-1]).sum(-1)[:, None]
    exp += 1.5 * ref_weighted_mse(a0, target[:, 0:1, 1:], weight[:, 0:1, 1:])
    a1 = (n[:, :, 1:] * n[:, :, :-1]).sum(-1)[:, None]
    exp += ref_weighted_mse(a1, target[:, 1:2, :, 1:], weight[:, 1:2, :, 1:])
    a2 = (n[:, :, :, 1:] * n[:, :, :, :-1]).sum(-1)[:, None]
    exp += ref_weighted_mse(a2, target[:, 2:3, :, :, 1:], weight[:, 2:3, :, :, 1:])
    assert np.allclose(float(got_loss), exp, rtol=1e-4)
    assert got_affs.shape == (b, 3, d, h, w)
    np.testing.assert_allclose(np.asarray(got_affs)[:, 0, 1:], a0[:, 0], atol=1e-5)
    assert np.asarray(got_affs)[:, 0, 0].max() == 0


@pytest.mark.parametrize("use_pallas", [False, True])
def test_embedding_loss_norm5_3d(use_pallas):
    rng = np.random.default_rng(6)
    b, d, h, w, c = 1, 6, 34, 34, 4
    shifts = (1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27)
    emb = rng.normal(size=(b, d, h, w, c)).astype(np.float32)
    target = (rng.random((b, 12, d, h, w)) > 0.5).astype(np.float32)
    weight = rng.random((b, 12, d, h, w)).astype(np.float32)
    got_loss, got_affs = embedding_loss_norm5(
        jnp.asarray(emb), jnp.asarray(target), jnp.asarray(weight),
        shifts=shifts, use_pallas=use_pallas, interpret=use_pallas)

    n = np_normalize(emb, axis=-1)
    dims = (d, h, w)
    exp = 0.0
    for i, s in enumerate(shifts):
        ax = i % 3
        sl_hi = [slice(None)] * 3
        sl_lo = [slice(None)] * 3
        sl_hi[ax] = slice(s, dims[ax])
        sl_lo[ax] = slice(0, dims[ax] - s)
        a = (n[(slice(None),) + tuple(sl_hi)] *
             n[(slice(None),) + tuple(sl_lo)]).sum(-1)[:, None]
        tsl = (slice(None), slice(i, i + 1)) + tuple(sl_hi)
        li = ref_weighted_mse(a, target[tsl], weight[tsl])
        exp += li
    assert np.allclose(float(got_loss), exp, rtol=1e-4)
    assert got_affs.shape == (b, 12, d, h, w)


def test_mask_head_loss_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(2, 10, 12, 2)).astype(np.float32)
    target = (rng.random((2, 10, 12)) > 0.3).astype(np.int64)

    got = float(mask_head_loss(jnp.asarray(logits), jnp.asarray(target)))

    weight = torch.FloatTensor([float((target == 1).sum()),
                                float((target == 0).sum())])
    loss_fn = torch.nn.CrossEntropyLoss(weight=weight)
    t_logits = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    exp = float(loss_fn(t_logits, torch.from_numpy(target)))
    assert np.allclose(got, exp, rtol=1e-4)


def test_deep_supervision_losses_2d_runs():
    rng = np.random.default_rng(8)
    offsets = multi_offset([1, 3, 5, 9, 27], neighbor=4)
    nb_half = 2
    embeddings, downs = [], []
    for k in range(4):
        h = 32 // (2 ** k)
        n_off = nb_half * (4 - k)
        embeddings.append(jnp.asarray(
            rng.normal(size=(1, h, h, 4)).astype(np.float32)))
        downs.append(jnp.asarray(
            rng.random((1, 3 * n_off, h, h)).astype(np.float32)))
    total = deep_supervision_losses_2d(embeddings, downs, offsets,
                                       use_pallas=False)
    assert np.isfinite(float(total))
