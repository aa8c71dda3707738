"""Oracle tests for the jnp embedding->affinity ops (2D and 3D)."""

import numpy as np
import jax.numpy as jnp

from pixel_embedded_affinity_tpu.ops import (
    embedding_to_affinity_2d, embedding_to_affinity_3d,
    normalize_embedding, multi_offset,
)


def np_normalize(e, axis=-1, eps=1e-12):
    n = np.sqrt((e * e).sum(axis=axis, keepdims=True))
    return e / np.maximum(n, eps)


def brute_affinity_2d(emb, offsets, padding):
    """Direct per-pixel oracle. emb (B,H,W,C) -> (B,K,H,W)."""
    n = np_normalize(emb)
    b, h, w, c = n.shape
    out = np.zeros((b, len(offsets), h, w), np.float32)
    for k, (oy, ox) in enumerate(offsets):
        for y in range(h):
            for x in range(w):
                yy, xx = y + oy, x + ox
                if padding == "circular":
                    yy, xx = yy % h, xx % w
                elif not (0 <= yy < h and 0 <= xx < w):
                    continue
                out[:, k, y, x] = (n[:, y, x] * n[:, yy, xx]).sum(-1)
    return out


def test_normalize_matches_torch_semantics():
    rng = np.random.default_rng(0)
    e = rng.normal(size=(2, 5, 5, 16)).astype(np.float32)
    e[0, 0, 0] = 0.0  # zero vector -> clamped norm, stays zero
    got = np.asarray(normalize_embedding(jnp.asarray(e)))
    exp = np_normalize(e)
    np.testing.assert_allclose(got, exp, atol=1e-6)
    assert np.all(got[0, 0, 0] == 0)


def test_affinity_2d_valid_and_circular():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(2, 12, 14, 8)).astype(np.float32)
    offsets = multi_offset([1, 3, 5], neighbor=4)
    for padding in ("valid", "circular"):
        got = np.asarray(embedding_to_affinity_2d(jnp.asarray(emb), offsets,
                                                  padding=padding))
        exp = brute_affinity_2d(emb, offsets, padding)
        np.testing.assert_allclose(got, exp, atol=1e-5)


def test_affinity_2d_neighbor8():
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(1, 10, 10, 4)).astype(np.float32)
    offsets = multi_offset([2], neighbor=8)
    got = np.asarray(embedding_to_affinity_2d(jnp.asarray(emb), offsets))
    exp = brute_affinity_2d(emb, offsets, "valid")
    np.testing.assert_allclose(got, exp, atol=1e-5)


def brute_affinity_3d(emb, shifts):
    n = np_normalize(emb)
    b, d, h, w, c = n.shape
    dims = (d, h, w)
    out = np.zeros((b, len(shifts), d, h, w), np.float32)
    for i, s in enumerate(shifts):
        ax = i % 3
        off = [0, 0, 0]
        off[ax] = -s
        for z in range(d):
            for y in range(h):
                for x in range(w):
                    q = (z + off[0], y + off[1], x + off[2])
                    if all(0 <= qi < di for qi, di in zip(q, dims)):
                        out[:, i, z, y, x] = (n[:, z, y, x] * n[:, q[0], q[1], q[2]]).sum(-1)
    return out


def test_affinity_3d_matches_reference_norm5_semantics():
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(1, 6, 9, 9, 4)).astype(np.float32)
    shifts = (1, 1, 1, 2, 3, 3)
    got = np.asarray(embedding_to_affinity_3d(jnp.asarray(emb), shifts))
    exp = brute_affinity_3d(emb, shifts)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_affinity_3d_unit_norm_self():
    """With constant embeddings all valid affinities are exactly 1."""
    emb = jnp.ones((1, 5, 8, 8, 3))
    affs = np.asarray(embedding_to_affinity_3d(emb, (1, 1, 1)))
    assert np.allclose(affs[:, 0, 1:], 1.0, atol=1e-6)
    assert np.allclose(affs[:, 0, 0], 0.0)
