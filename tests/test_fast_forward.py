"""Optimized s2d inference forward vs the Flax module (exact math)."""

import pytest
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
from pixel_embedded_affinity_tpu.models.fast_forward import (
    build_fast_resunet_forward)
from pixel_embedded_affinity_tpu.ops.s2d import (
    space_to_depth, depth_to_space, s2d_conv_weights)

pytestmark = pytest.mark.slow


def test_s2d_conv_exact():
    rng = np.random.default_rng(0)
    conv = functools.partial(jax.lax.conv_general_dilated,
                             window_strides=(1, 1), padding="SAME",
                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
    for cin, cout in [(16, 16), (3, 16), (32, 64), (96, 32)]:
        x = jnp.asarray(rng.normal(size=(2, 32, 28, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout))
                        .astype(np.float32) * 0.1)
        ref = conv(x, w)
        got = depth_to_space(conv(space_to_depth(x), s2d_conv_weights(w)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


def test_fast_forward_matches_flax_module():
    rng = np.random.default_rng(1)
    model = ResidualUNet2DDeep(out_channels=2, nfeatures=(8, 12, 16, 24, 32),
                               emd=8)
    x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # make BN stats non-trivial
    import flax

    variables = flax.core.unfreeze(variables) if hasattr(
        flax.core, "unfreeze") else dict(variables)
    ref_emb, ref_mask = model.apply(variables, x, train=False)[4:6]

    fwd = build_fast_resunet_forward(variables, dtype=jnp.float32)
    emb, mask = fwd(x)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(mask), np.asarray(ref_mask),
                               atol=2e-4)


def test_fast_forward_packed_input_matches():
    from pixel_embedded_affinity_tpu.models.fast_forward import pack_image_s2d

    rng = np.random.default_rng(2)
    model = ResidualUNet2DDeep(out_channels=2, nfeatures=(8, 12, 16, 24, 32),
                               emd=8)
    x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref_emb, ref_mask = build_fast_resunet_forward(
        variables, dtype=jnp.float32)(x)
    packed = jnp.asarray(pack_image_s2d(np.asarray(x)))
    emb, mask = build_fast_resunet_forward(
        variables, dtype=jnp.float32, input_format="s2d")(packed)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mask), np.asarray(ref_mask),
                               atol=1e-5)


def test_fast_forward_stage_forms_exact():
    """Every legal stage_forms override (the B=1 serving table uses these)
    reproduces the default-table outputs exactly; illegal overrides raise."""
    rng = np.random.default_rng(3)
    model = ResidualUNet2DDeep(out_channels=2, nfeatures=(8, 12, 16, 24, 32),
                               emd=8)
    x = jnp.asarray(rng.normal(size=(1, 64, 48, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref_emb, ref_mask = build_fast_resunet_forward(
        variables, dtype=jnp.float32)(x)

    forms = {"inconv": "2x2", "down1": "2x2", "down2": "dense",
             "up3": "dense", "up4": "2x2"}
    emb, mask = build_fast_resunet_forward(
        variables, dtype=jnp.float32, stage_forms=forms)(x)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(mask), np.asarray(ref_mask),
                               atol=2e-4)

    with pytest.raises(ValueError, match="unknown stage_forms"):
        build_fast_resunet_forward(variables, stage_forms={"bogus": "dense"})
    with pytest.raises(ValueError, match="layout mismatch"):
        build_fast_resunet_forward(variables, stage_forms={"down3": "dense"})
    with pytest.raises(ValueError, match="layout mismatch"):
        build_fast_resunet_forward(variables, stage_forms={"inconv": False})
