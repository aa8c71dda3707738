"""Fused 3x3 conv kernel vs lax.conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_embedded_affinity_tpu.ops.conv3x3_pallas import conv3x3_fused

INTERPRET = jax.devices()[0].platform != "tpu"


@pytest.mark.parametrize("shape", [
    (2, 12, 10, 5, 7),     # odd sizes
    (1, 20, 16, 300, 9),   # channel-chunked (cin > 256)
    (1, 33, 15, 3, 16),    # rgb-like
])
def test_conv3x3_fused_matches_lax(shape):
    b, h, w, cin, cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    got = conv3x3_fused(x, k, sc, sh, relu=True, tile_h=4, interpret=INTERPRET)
    exp = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    exp = jnp.maximum(exp * sc + sh, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5)


def test_conv3x3_fused_no_epilogue():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.1)
    got = conv3x3_fused(x, k, tile_h=8, interpret=INTERPRET)
    exp = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), atol=2e-5)
