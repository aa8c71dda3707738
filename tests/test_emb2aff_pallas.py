"""Fused Pallas kernel vs the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_embedded_affinity_tpu.ops import (
    embedding_to_affinity_2d, embedding_to_affinity_3d, multi_offset,
)
from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import (
    fused_affinity_2d, fused_affinity_3d,
)

INTERPRET = jax.devices()[0].platform != "tpu"


def test_fused_2d_matches_oracle():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(2, 96, 80, 16)).astype(np.float32)
    offsets = multi_offset([1, 3, 5, 9, 27], neighbor=4)
    got = np.asarray(fused_affinity_2d(jnp.asarray(emb), tuple(map(tuple, offsets)),
                                       64, INTERPRET))
    exp = np.asarray(embedding_to_affinity_2d(jnp.asarray(emb), offsets,
                                              padding="valid"))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_fused_2d_neighbor8():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(1, 64, 70, 8)).astype(np.float32)
    offsets = multi_offset([1, 3], neighbor=8)
    got = np.asarray(fused_affinity_2d(jnp.asarray(emb), tuple(map(tuple, offsets)),
                                       64, INTERPRET))
    exp = np.asarray(embedding_to_affinity_2d(jnp.asarray(emb), offsets,
                                              padding="valid"))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_fused_2d_nondivisible_height():
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(1, 100, 90, 8)).astype(np.float32)
    offsets = multi_offset([1, 5], neighbor=4)
    got = np.asarray(fused_affinity_2d(jnp.asarray(emb), tuple(map(tuple, offsets)),
                                       32, INTERPRET))
    exp = np.asarray(embedding_to_affinity_2d(jnp.asarray(emb), offsets,
                                              padding="valid"))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_fused_2d_gradient_matches_oracle():
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(1, 32, 40, 4)).astype(np.float32))
    offsets = ((-1, 0), (0, -1), (-3, 0), (0, -3))

    def loss_fused(e):
        return jnp.sum(fused_affinity_2d(e, offsets, 32, INTERPRET) ** 2)

    def loss_oracle(e):
        return jnp.sum(embedding_to_affinity_2d(e, offsets, padding="valid") ** 2)

    g1 = jax.grad(loss_fused)(emb)
    g2 = jax.grad(loss_oracle)(emb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_fused_3d_matches_oracle():
    rng = np.random.default_rng(4)
    emb = rng.normal(size=(1, 6, 64, 70, 8)).astype(np.float32)
    shifts = (1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27)
    got = np.asarray(fused_affinity_3d(jnp.asarray(emb), shifts, 32, INTERPRET))
    exp = np.asarray(embedding_to_affinity_3d(jnp.asarray(emb), shifts))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_fused_3d_gradient():
    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 4)).astype(np.float32))
    shifts = (1, 1, 1, 2, 3, 3)

    g1 = jax.grad(lambda e: jnp.sum(fused_affinity_3d(e, shifts, 32, INTERPRET) ** 2))(emb)
    g2 = jax.grad(lambda e: jnp.sum(embedding_to_affinity_3d(e, shifts) ** 2))(emb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_fused_cross_affinity_matches_oracle():
    from pixel_embedded_affinity_tpu.ops.emb2aff import cross_affinity_2d
    from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import (
        fused_cross_affinity_2d)

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(2, 64, 70, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 64, 70, 8)).astype(np.float32))
    offsets = tuple(map(tuple, multi_offset([1, 3, 9], neighbor=4)))
    got = np.asarray(fused_cross_affinity_2d(a, b, offsets, 32, INTERPRET))
    exp = np.asarray(cross_affinity_2d(a, b, offsets))
    np.testing.assert_allclose(got, exp, atol=1e-5)

    # gradient parity through both inputs
    g1 = jax.grad(lambda x, y: jnp.sum(
        fused_cross_affinity_2d(x, y, offsets, 32, INTERPRET) ** 2),
        argnums=(0, 1))(a, b)
    g2 = jax.grad(lambda x, y: jnp.sum(
        cross_affinity_2d(x, y, offsets) ** 2), argnums=(0, 1))(a, b)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-4)


def test_fused_2d_gradient_neighbor8_nondivisible():
    """Backward kernel: diagonal offsets (positive ox -> term-2 right
    shifts) + non-tile-divisible height + weighted upstream gradient."""
    rng = np.random.default_rng(11)
    emb = jnp.asarray(rng.normal(size=(2, 77, 70, 8)).astype(np.float32))
    offsets = tuple(map(tuple, multi_offset([1, 3, 5], neighbor=8)))
    wgt = jnp.asarray(rng.normal(size=(2, len(offsets), 77, 70))
                      .astype(np.float32))

    def loss_fused(e):
        return jnp.sum(wgt * fused_affinity_2d(e, offsets, 32, INTERPRET))

    def loss_oracle(e):
        return jnp.sum(wgt * embedding_to_affinity_2d(e, offsets,
                                                      padding="valid"))

    g1 = jax.grad(loss_fused)(emb)
    g2 = jax.grad(loss_oracle)(emb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_fused_3d_gradient_full_shift_table():
    """3D backward with the full 12-channel AC3/AC4 shift table (z shifts
    1/2/3/4 + xy shifts up to 27)."""
    rng = np.random.default_rng(12)
    emb = jnp.asarray(rng.normal(size=(1, 6, 40, 36, 6)).astype(np.float32))
    shifts = (1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27)
    wgt = jnp.asarray(rng.normal(size=(1, 12, 6, 40, 36)).astype(np.float32))

    g1 = jax.grad(lambda e: jnp.sum(
        wgt * fused_affinity_3d(e, shifts, 32, INTERPRET)))(emb)
    g2 = jax.grad(lambda e: jnp.sum(
        wgt * embedding_to_affinity_3d(e, shifts)))(emb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_fused_cross_affinity_3d():
    """3D cross-view (EMA) kernel + gradients vs the jnp oracle."""
    from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import (
        fused_cross_affinity_3d)
    from pixel_embedded_affinity_tpu.ops.emb2aff import normalize_embedding

    rng = np.random.default_rng(13)
    a = jnp.asarray(rng.normal(size=(1, 6, 40, 36, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1, 6, 40, 36, 6)).astype(np.float32))
    shifts = (1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27)

    def oracle(x, y):
        nx = normalize_embedding(x, axis=-1)
        ny = normalize_embedding(y, axis=-1)
        d, h, w = x.shape[1:4]
        dims = (d, h, w)
        chans = []
        for i, s in enumerate(shifts):
            ax = i % 3
            hi = [slice(None)] * 3
            lo = [slice(None)] * 3
            hi[ax] = slice(s, dims[ax])
            lo[ax] = slice(0, dims[ax] - s)
            v = jnp.sum(nx[(slice(None),) + tuple(hi)] *
                        ny[(slice(None),) + tuple(lo)], axis=-1)
            pad = [(0, 0)] * 4
            pad[1 + ax] = (s, 0)
            chans.append(jnp.pad(v, pad))
        return jnp.stack(chans, axis=1)

    got = np.asarray(fused_cross_affinity_3d(a, b, shifts, 32, INTERPRET))
    exp = np.asarray(oracle(a, b))
    np.testing.assert_allclose(got, exp, atol=1e-5)

    wgt = jnp.asarray(rng.normal(size=got.shape).astype(np.float32))
    g1 = jax.grad(lambda x, y: jnp.sum(
        wgt * fused_cross_affinity_3d(x, y, shifts, 32, INTERPRET)),
        argnums=(0, 1))(a, b)
    g2 = jax.grad(lambda x, y: jnp.sum(wgt * oracle(x, y)),
                  argnums=(0, 1))(a, b)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-4)


def _wmse_case(seed=0, b=2, h=96, w=80, c=16, levels=(1, 3, 5, 9, 27)):
    rng = np.random.default_rng(seed)
    offsets = multi_offset(list(levels), neighbor=4)
    k = len(offsets)
    emb = rng.normal(size=(b, h, w, c)).astype(np.float32)
    t = (rng.random((b, k, h, w)) > 0.5).astype(np.float32)
    wm = rng.random((b, k, h, w)).astype(np.float32) * 2.0
    m = (rng.random((b, k, h, w)) > 0.2).astype(np.float32)
    return offsets, emb, t, wm, m


def test_fused_wmse_2d_matches_unfused_loss():
    """Loss value + affs of the loss-fused kernel == the unfused oracle."""
    from pixel_embedded_affinity_tpu.ops import losses as L

    offsets, emb, t, wm, m = _wmse_case()
    args = (jnp.asarray(emb), jnp.asarray(t), jnp.asarray(wm),
            jnp.asarray(m))
    loss_f, affs_f = L.embedding_loss_2d(*args, offsets,
                                         use_pallas=True,
                                         interpret=INTERPRET,
                                         fuse_loss=True)
    loss_o, affs_o = L.embedding_loss_2d(*args, offsets, use_pallas=False)
    np.testing.assert_allclose(float(loss_f), float(loss_o), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(affs_f), np.asarray(affs_o),
                               atol=1e-5)


def test_fused_wmse_2d_gradient_matches_oracle():
    """d(loss)/d(embedding) of the in-tile cotangent == jax.vjp oracle."""
    from pixel_embedded_affinity_tpu.ops import losses as L

    offsets, emb, t, wm, m = _wmse_case(seed=3, h=67, w=50)
    t_, wm_, m_ = jnp.asarray(t), jnp.asarray(wm), jnp.asarray(m)

    def loss_fused(e):
        l, _ = L.embedding_loss_2d(e, t_, wm_, m_, offsets,
                                   use_pallas=True, interpret=INTERPRET,
                                   fuse_loss=True)
        return l

    def loss_oracle(e):
        l, _ = L.embedding_loss_2d(e, t_, wm_, m_, offsets,
                                   use_pallas=False)
        return l

    g_f = np.asarray(jax.grad(loss_fused)(jnp.asarray(emb)))
    g_o = np.asarray(jax.grad(loss_oracle)(jnp.asarray(emb)))
    np.testing.assert_allclose(g_f, g_o, atol=2e-5)


def test_fused_cross_wmse_2d_matches_unfused_loss():
    from pixel_embedded_affinity_tpu.ops import losses as L

    offsets, emb, t, wm, m = _wmse_case(seed=5)
    rng = np.random.default_rng(6)
    ema = rng.normal(size=emb.shape).astype(np.float32)
    args = (jnp.asarray(emb), jnp.asarray(ema), jnp.asarray(t),
            jnp.asarray(wm), jnp.asarray(m))
    loss_f, affs_f = L.ema_embedding_loss_2d(*args, offsets,
                                             affs0_weight=2.5,
                                             use_pallas=True,
                                             interpret=INTERPRET,
                                             fuse_loss=True)
    loss_o, affs_o = L.ema_embedding_loss_2d(*args, offsets,
                                             affs0_weight=2.5,
                                             use_pallas=False)
    np.testing.assert_allclose(float(loss_f), float(loss_o), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(affs_f), np.asarray(affs_o),
                               atol=1e-5)


def test_fused_cross_wmse_2d_gradients_match_oracle():
    """Both the student AND (pre-detach) teacher gradients match the
    jax.vjp oracle — the train step detaches the teacher, but the kernel
    must be correct for both."""
    from pixel_embedded_affinity_tpu.ops import losses as L

    offsets, emb, t, wm, m = _wmse_case(seed=7, h=67, w=50)
    rng = np.random.default_rng(8)
    ema = rng.normal(size=emb.shape).astype(np.float32)
    t_, wm_, m_ = jnp.asarray(t), jnp.asarray(wm), jnp.asarray(m)

    def loss(fused):
        def f(a, b):
            l, _ = L.ema_embedding_loss_2d(
                a, b, t_, wm_, m_, offsets, affs0_weight=2.5,
                use_pallas=fused, interpret=INTERPRET, fuse_loss=fused)
            return l
        return f

    ga_f, gb_f = jax.grad(loss(True), argnums=(0, 1))(
        jnp.asarray(emb), jnp.asarray(ema))
    ga_o, gb_o = jax.grad(loss(False), argnums=(0, 1))(
        jnp.asarray(emb), jnp.asarray(ema))
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_o), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_o), atol=2e-5)


def test_affinity_2d_small_batch_matches_oracle():
    """The pure-XLA small-batch serving formulation (no custom call;
    B=1 latency path) must match the valid-padding oracle exactly."""
    from pixel_embedded_affinity_tpu.ops import affinity_2d_small_batch

    rng = np.random.default_rng(11)
    for shape, spec in [((1, 96, 80, 16), [1, 3, 5, 9, 27]),
                        ((3, 40, 56, 8), [1, 2, 11])]:
        emb = rng.normal(size=shape).astype(np.float32)
        offsets = multi_offset(spec, neighbor=8 if shape[0] == 3 else 4)
        got = np.asarray(affinity_2d_small_batch(jnp.asarray(emb),
                                                 tuple(map(tuple, offsets))))
        exp = np.asarray(embedding_to_affinity_2d(jnp.asarray(emb), offsets,
                                                  padding="valid"))
        np.testing.assert_allclose(got, exp, atol=1e-5)
