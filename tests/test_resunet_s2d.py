"""Trainable s2d twin of ResidualUNet2DDeep: exactness in both modes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
from pixel_embedded_affinity_tpu.models.resunet2d_s2d import (
    ResidualUNet2DDeepS2D)

pytestmark = pytest.mark.slow

KW = dict(out_channels=2, nfeatures=(8, 12, 16, 24, 32), emd=8)


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda a: a.shape, t)


def test_param_tree_identical():
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    v_ref = ResidualUNet2DDeep(**KW).init(jax.random.PRNGKey(0), x,
                                          train=False)
    v_s2d = ResidualUNet2DDeepS2D(**KW).init(jax.random.PRNGKey(0), x,
                                             train=False)
    assert _tree_shapes(v_ref["params"]) == _tree_shapes(v_s2d["params"])
    assert (_tree_shapes(v_ref["batch_stats"])
            == _tree_shapes(v_s2d["batch_stats"]))


def test_forward_and_stats_parity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).astype(np.float32))
    ref = ResidualUNet2DDeep(**KW)
    s2d = ResidualUNet2DDeepS2D(**KW)
    variables = ref.init(jax.random.PRNGKey(1), x, train=False)

    # eval mode
    o_ref = ref.apply(variables, x, train=False)
    o_s2d = s2d.apply(variables, x, train=False)
    for a, b in zip(o_ref, o_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)

    # train mode incl. batch_stats update
    o_ref, m_ref = ref.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    o_s2d, m_s2d = s2d.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    for a, b in zip(o_ref, o_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3)
    fa = jax.tree_util.tree_leaves(m_ref["batch_stats"])
    fb = jax.tree_util.tree_leaves(m_s2d["batch_stats"])
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_grad_parity():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    ref = ResidualUNet2DDeep(**KW)
    s2d = ResidualUNet2DDeepS2D(**KW)
    variables = ref.init(jax.random.PRNGKey(3), x, train=False)

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


def test_odd_shape_fallback():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 34, 30, 3)).astype(np.float32))
    ref = ResidualUNet2DDeep(**KW)
    s2d = ResidualUNet2DDeepS2D(**KW)
    variables = ref.init(jax.random.PRNGKey(5), x, train=False)
    o_ref = ref.apply(variables, x, train=False)
    o_s2d = s2d.apply(variables, x, train=False)
    for a, b in zip(o_ref, o_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
