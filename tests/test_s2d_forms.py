"""Exactness of the s2d conv reformulations and the fused Pallas block.

All forms must reproduce a stride-1 SAME 3x3 conv / residual block exactly
(reference block: scripts_cvppp/model/unet2d_residual.py:5-25)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixel_embedded_affinity_tpu.ops.s2d import (
    space_to_depth, depth_to_space, s2d_conv2x2_weights,
    s2d_conv2x2_weights_qx, s2d_conv2x2_slices)
from pixel_embedded_affinity_tpu.ops.s2d_block_pallas import fused_s2d_block

_conv = functools.partial(jax.lax.conv_general_dilated, window_strides=(1, 1),
                          padding="SAME",
                          dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _mkw(rng, ci, co):
    return jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32)
                       * 0.2)


def test_s2d_conv2x2_exact():
    rng = np.random.default_rng(0)
    for ci, co, h, w in [(3, 16, 32, 28), (16, 16, 16, 16), (32, 64, 20, 12)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, ci)).astype(np.float32))
        wk = _mkw(rng, ci, co)
        ref = _conv(x, wk)
        k = s2d_conv2x2_weights(wk)
        v = jax.lax.conv_general_dilated(
            space_to_depth(x), k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = depth_to_space(s2d_conv2x2_slices(v, co))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


def test_s2d_conv2x2_qx_split_exact():
    rng = np.random.default_rng(1)
    ci, co, h, w = 8, 12, 16, 24
    x = jnp.asarray(rng.normal(size=(2, h, w, ci)).astype(np.float32))
    wk = _mkw(rng, ci, co)
    ref_s2d = space_to_depth(_conv(x, wk))
    xs = space_to_depth(x)
    hs = h // 2
    parts = [None] * 4
    for qx in range(2):
        k = s2d_conv2x2_weights_qx(wk, qx)
        pad = ((1, 1), (1, 0)) if qx == 0 else ((1, 1), (0, 1))
        v = jax.lax.conv_general_dilated(
            xs, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for qy in range(2):
            parts[2 * qy + qx] = v[:, qy:qy + hs, :, qy * co:(qy + 1) * co]
    got = jnp.concatenate(parts, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_s2d),
                               atol=1e-4)


def _fuse_full(wa, wb):
    ka = s2d_conv2x2_weights(wa)
    kb = s2d_conv2x2_weights(wb)
    kh, kw, cc, _ = ka.shape
    return jnp.concatenate([ka.reshape(kh, kw, cc, 4, -1),
                            kb.reshape(kh, kw, cc, 4, -1)],
                           -1).reshape(kh, kw, cc, -1)


@pytest.mark.parametrize("split", [None, 4])
def test_fused_s2d_block_pallas_interpret(split):
    rng = np.random.default_rng(2)
    ci, co, h, w = 10, 8, 32, 16
    w1, wp, w2 = _mkw(rng, ci, co), _mkw(rng, ci, co), _mkw(rng, co, co)
    h1, hp, h2 = (jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
                  for _ in range(3))
    x = jnp.asarray(rng.normal(size=(2, h, w, ci)).astype(np.float32))
    y1 = jax.nn.relu(_conv(x, w1) + h1)
    ref = space_to_depth(jax.nn.relu(_conv(y1, w2) + h2 + _conv(x, wp) + hp))

    h1p = jnp.tile(jnp.concatenate([h1, hp]), 4)
    h2t = jnp.tile(h2, 4)
    k2 = s2d_conv2x2_weights(w2)
    if split is None:
        xs = space_to_depth(x)
        k1ps = _fuse_full(w1, wp)
    else:
        xs = (space_to_depth(x[..., :split]), space_to_depth(x[..., split:]))
        k1ps = (_fuse_full(w1[:, :, :split], wp[:, :, :split]),
                _fuse_full(w1[:, :, split:], wp[:, :, split:]))
    got = fused_s2d_block(xs, k1ps, h1p, k2, h2t, co, co, co,
                          tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


def test_fast_forward_pallas_block_mode_interpret():
    """_BlockW(s2d='pallas') must match the dense path (tiny shapes)."""
    from pixel_embedded_affinity_tpu.models import fast_forward as ff

    rng = np.random.default_rng(3)
    ci, co = 6, 8

    def params(ci, co):
        p = {}
        s = {}
        for name, bn, cin in (("conv1", "bn1", ci), ("conv2", "bn2", co),
                              ("project_conv", "project_bn", ci)):
            p[name] = {"kernel": _mkw(rng, cin, co)}
            p[bn] = {"scale": jnp.asarray(
                1 + 0.1 * rng.normal(size=(co,)).astype(np.float32)),
                "bias": jnp.asarray(
                    rng.normal(size=(co,)).astype(np.float32))}
            s[bn] = {"mean": jnp.asarray(
                rng.normal(size=(co,)).astype(np.float32) * 0.1),
                "var": jnp.asarray(
                    1 + 0.1 * np.abs(rng.normal(size=(co,))).astype(
                        np.float32))}
        return p, s

    p, s = params(ci, co)
    x = jnp.asarray(rng.normal(size=(2, 16, 8, 4 * ci)).astype(np.float32))
    ref = ff._BlockW(p, s, jnp.float32, s2d="dense")(x)
    blk = ff._BlockW(p, s, jnp.float32, s2d="pallas")
    blk.interpret = True
    got = blk(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
