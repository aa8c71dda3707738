"""Real-Mosaic kernel tests (TPU only).

The regular suite runs all Pallas kernels in interpret mode on the CPU
mesh; this tier compiles them with Mosaic on the actual chip, catching
layout/lowering regressions the interpreter can't. Run with:

    PEA_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_kernels.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                       reason="needs a real TPU (PEA_TPU_TESTS=1)"),
]

from pixel_embedded_affinity_tpu.ops import (
    embedding_to_affinity_2d, embedding_to_affinity_3d, multi_offset,
)
from pixel_embedded_affinity_tpu.ops.emb2aff import cross_affinity_2d
from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import (
    fused_affinity_2d, fused_affinity_3d, fused_cross_affinity_2d,
)
from pixel_embedded_affinity_tpu.ops.conv3x3_blocked import conv3x3_blocked


def test_mosaic_fused_2d_fwd_bwd():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(2, 96, 80, 16)).astype(np.float32))
    offsets = tuple(map(tuple, multi_offset([1, 3, 5, 9, 27], neighbor=4)))

    @jax.jit
    def fused(e):
        return fused_affinity_2d(e, offsets, 32, False)

    got = np.asarray(fused(emb))
    exp = np.asarray(embedding_to_affinity_2d(emb, offsets, padding="valid"))
    np.testing.assert_allclose(got, exp, atol=2e-4)

    g1 = jax.jit(jax.grad(lambda e: jnp.sum(
        fused_affinity_2d(e, offsets, 32, False) ** 2)))(emb)
    g2 = jax.grad(lambda e: jnp.sum(
        embedding_to_affinity_2d(e, offsets, padding="valid") ** 2))(emb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-4)


def test_mosaic_fused_3d():
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(1, 6, 64, 64, 8)).astype(np.float32))
    shifts = (1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27)
    got = np.asarray(jax.jit(lambda e: fused_affinity_3d(
        e, shifts, 32, False))(emb))
    exp = np.asarray(embedding_to_affinity_3d(emb, shifts))
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_mosaic_cross_affinity():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(2, 64, 72, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 64, 72, 8)).astype(np.float32))
    offsets = tuple(map(tuple, multi_offset([1, 3, 9], neighbor=4)))
    got = np.asarray(jax.jit(lambda x, y: fused_cross_affinity_2d(
        x, y, offsets, 32, False))(a, b))
    exp = np.asarray(cross_affinity_2d(a, b, offsets))
    np.testing.assert_allclose(got, exp, atol=2e-4)

    g1 = jax.jit(jax.grad(lambda x, y: jnp.sum(fused_cross_affinity_2d(
        x, y, offsets, 32, False) ** 2), argnums=(0, 1)))(a, b)
    g2 = jax.grad(lambda x, y: jnp.sum(
        cross_affinity_2d(x, y, offsets) ** 2), argnums=(0, 1))(a, b)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=5e-4)


def test_mosaic_conv3x3_blocked():
    rng = np.random.default_rng(3)
    conv = functools.partial(jax.lax.conv_general_dilated,
                             window_strides=(1, 1), padding="SAME",
                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
    for cin, cout in [(16, 16), (96, 32), (128, 128)]:
        x = jnp.asarray(rng.normal(size=(1, 40, 40, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout))
                        .astype(np.float32) * 0.1)
        got = np.asarray(jax.jit(lambda x, w: conv3x3_blocked(
            x, w, tile_h=8))(x, w))
        np.testing.assert_allclose(got, np.asarray(conv(x, w)), atol=2e-3)


def test_mosaic_fused_s2d_block():
    """The fused residual-block kernel Mosaic-compiles and matches the
    direct-resolution block (bf16 tolerance)."""
    from pixel_embedded_affinity_tpu.ops.s2d import (
        space_to_depth, s2d_conv2x2_weights)
    from pixel_embedded_affinity_tpu.ops.s2d_block_pallas import (
        fused_s2d_block)

    conv = functools.partial(jax.lax.conv_general_dilated,
                             window_strides=(1, 1), padding="SAME",
                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rng = np.random.default_rng(0)
    ci, co, h, w = 16, 32, 64, 48
    mkw = lambda a, b: jnp.asarray(
        rng.normal(size=(3, 3, a, b)).astype(np.float32) * 0.2)
    w1, wp, w2 = mkw(ci, co), mkw(ci, co), mkw(co, co)
    h1, hp, h2 = (jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
                  for _ in range(3))
    x = jnp.asarray(rng.normal(size=(2, h, w, ci)).astype(np.float32))
    y1 = jax.nn.relu(conv(x, w1) + h1)
    ref = space_to_depth(jax.nn.relu(conv(y1, w2) + h2 + conv(x, wp) + hp))

    def fuse(wa, wb):
        ka, kb = s2d_conv2x2_weights(wa), s2d_conv2x2_weights(wb)
        kh, kw, cc, _ = ka.shape
        return jnp.concatenate(
            [ka.reshape(kh, kw, cc, 4, -1), kb.reshape(kh, kw, cc, 4, -1)],
            -1).reshape(kh, kw, cc, -1).astype(jnp.bfloat16)

    got = jax.jit(lambda a: fused_s2d_block(
        a, fuse(w1, wp), jnp.tile(jnp.concatenate([h1, hp]), 4)
        .astype(jnp.bfloat16),
        s2d_conv2x2_weights(w2).astype(jnp.bfloat16),
        jnp.tile(h2, 4).astype(jnp.bfloat16),
        co, co, co, tile_h=8))(space_to_depth(x).astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=0.15, rtol=0.05)
