"""Trainable xy-s2d twin of UNetPNIEmbeddingDeep: exactness tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixel_embedded_affinity_tpu.models.unet3d_pni import (
    UNetPNIEmbeddingDeep)
from pixel_embedded_affinity_tpu.models.unet3d_pni_s2d import (
    UNetPNIEmbeddingDeepS2D)

pytestmark = pytest.mark.slow

KW = dict(filters=(6, 8, 10, 12, 14), emd=6)


def test_param_tree_and_forward_parity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 6, 32, 32, 1)).astype(np.float32))
    ref = UNetPNIEmbeddingDeep(**KW)
    s2d = UNetPNIEmbeddingDeepS2D(**KW)
    v_ref = ref.init(jax.random.PRNGKey(0), x, train=False)
    v_s2d = s2d.init(jax.random.PRNGKey(0), x, train=False)
    shp = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
    assert shp(v_ref["params"]) == shp(v_s2d["params"])
    assert shp(v_ref["batch_stats"]) == shp(v_s2d["batch_stats"])

    o_ref = ref.apply(v_ref, x, train=False)
    o_s2d = s2d.apply(v_ref, x, train=False)
    for a, b in zip(o_ref, o_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)

    o_ref, m_ref = ref.apply(v_ref, x, train=True, mutable=["batch_stats"])
    o_s2d, m_s2d = s2d.apply(v_ref, x, train=True, mutable=["batch_stats"])
    for a, b in zip(o_ref, o_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(m_ref["batch_stats"]),
                    jax.tree_util.tree_leaves(m_s2d["batch_stats"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)


def test_grad_parity_3d():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 1)).astype(np.float32))
    ref = UNetPNIEmbeddingDeep(**KW)
    s2d = UNetPNIEmbeddingDeepS2D(**KW)
    variables = ref.init(jax.random.PRNGKey(2), x, train=False)

    def loss(model, p):
        out, _ = model.apply({"params": p,
                              "batch_stats": variables["batch_stats"]},
                             x, train=True, mutable=["batch_stats"])
        return sum((o ** 2).sum() for o in out)

    g_ref = jax.grad(lambda p: loss(ref, p))(variables["params"])
    g_s2d = jax.grad(lambda p: loss(s2d, p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_s2d)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-2, atol=5e-3)
