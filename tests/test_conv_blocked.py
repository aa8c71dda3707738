"""Blocked-pixel conv kernel vs lax.conv (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_embedded_affinity_tpu.ops.conv3x3_blocked import conv3x3_blocked

INTERPRET = jax.devices()[0].platform != "tpu"

_conv = functools.partial(jax.lax.conv_general_dilated, window_strides=(1, 1),
                          padding="SAME",
                          dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("cin,cout", [(16, 16), (16, 32), (32, 32), (3, 16),
                                      (96, 32), (64, 64), (128, 128),
                                      (192, 64), (256, 256)])
def test_conv3x3_blocked_matches_lax(cin, cout):
    rng = np.random.default_rng(cin * 1000 + cout)
    x = jnp.asarray(rng.normal(size=(2, 33, 40, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
                    * 0.1)
    sc = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = jax.nn.relu(_conv(x, w) * sc + sh)
    got = conv3x3_blocked(x, w, sc, sh, relu=True, tile_h=8,
                          interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("c,k", [(64, 3), (16, 2), (128, 2), (32, 4)])
def test_conv3x3_blocked_chain_matches_lax(c, k):
    """Chained form (one ingest, k convs in the blocked stream, one egress)
    vs the XLA conv chain — exercises the pad re-zeroing mask."""
    from pixel_embedded_affinity_tpu.ops.conv3x3_blocked import (
        conv3x3_blocked_chain)
    rng = np.random.default_rng(c + k)
    x = jnp.asarray(rng.normal(size=(2, 21, 26, c)).astype(np.float32))
    ws = [jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.1)
          for _ in range(k)]
    scs = [jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
           for _ in range(k)]
    shs = [jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
           for _ in range(k)]
    ref = x
    for w, sc, sh in zip(ws, scs, shs):
        ref = jax.nn.relu(_conv(ref, w) * sc + sh)
    got = conv3x3_blocked_chain(x, ws, scs, shs, relu=True,
                                interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)


def test_conv3x3_blocked_inside_jit():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 24, 24, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 16)).astype(np.float32) * 0.1)
    f = jax.jit(lambda x, w: conv3x3_blocked(x, w, tile_h=8,
                                             interpret=INTERPRET))
    np.testing.assert_allclose(np.asarray(f(x, w)),
                               np.asarray(_conv(x, w)), atol=2e-4)
