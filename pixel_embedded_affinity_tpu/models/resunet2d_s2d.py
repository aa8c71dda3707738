"""Space-to-depth TRAINING variant of ResidualUNet2DDeep (exact math).

The inference fast path (models/fast_forward.py) folds BatchNorm, so it
cannot train. This module IS trainable: same parameter tree, names, and
initializers as ResidualUNet2DDeep (checkpoints interchange freely), but
the lane-starved high-resolution stages compute in s2d form:

* convs apply the block-space kernel ``s2d_conv_weights(kernel)`` — the
  transform is differentiable, so weight gradients flow back to the
  ORIGINAL (3, 3, Cin, Cout) parameter. The backward pass benefits the
  most: the reference-shape weight-grad convolutions at C16/544^2 are
  M=144, N=16 matmuls with a huge K reduction (single-digit MXU
  utilization); in s2d form they are 4x wider on both sides. Measured
  fwd+weight-grad for one C16 conv: 5.8 -> 3.7 ms (B=2, f32, v5e).
* BatchNorm normalizes per ORIGINAL channel: the s2d tensor is viewed as
  (B, h, w, 4, C) so nn.BatchNorm pools statistics over batch, space AND
  the four parity groups — exactly the full-resolution statistics.
* maxpool of an s2d stage is a parity-group max; decoder upsampling uses
  the interpolation-matrix parity matmuls (models/fast_forward.py).

Numerics match ResidualUNet2DDeep to float tolerance in BOTH train and
eval modes, including the batch_stats update (tests/test_resunet_s2d.py).
Inputs whose H or W is not divisible by 4 fall back to the direct graph
(identical parameters either way). Mirrors the reference forward
scripts_cvppp/model/unet2d_residual.py:279-353.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.s2d import space_to_depth, depth_to_space, s2d_conv_weights
from .common import replication_pad_to
from .fast_forward import _upsample2x_to_s2d, _pool_s2d_to_direct
from .resunet2d import ResidualBlock, Down, Up, MaskHead, _concat_skip

_conv = functools.partial(jax.lax.conv_general_dilated, window_strides=(1, 1),
                          padding="SAME",
                          dimension_numbers=("NHWC", "HWIO", "NHWC"))


class S2DConv(nn.Module):
    """3x3 SAME conv on an s2d tensor, parameterized by the DIRECT-space
    (3, 3, Cin, Cout) kernel (nn.Conv-compatible param shapes/init)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s2d):
        cin = x_s2d.shape[-1] // 4
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k = s2d_conv_weights(kernel).astype(self.dtype)
        y = _conv(x_s2d.astype(self.dtype), k)
        return y + jnp.tile(bias, 4).astype(y.dtype)


class ResidualBlockS2D(nn.Module):
    """ResidualBlock computed in s2d space (parameter tree identical to
    models/resunet2d.py::ResidualBlock)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s2d, train: bool):
        def bn(name, v):
            b, h, w, c4 = v.shape
            g = v.reshape(b, h, w, 4, c4 // 4)
            g = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=name)(g)
            return g.reshape(b, h, w, c4)

        y = S2DConv(self.features, self.dtype, name="conv1")(x_s2d)
        y = nn.relu(bn("bn1", y))
        y = S2DConv(self.features, self.dtype, name="conv2")(y)
        y = bn("bn2", y)
        p = S2DConv(self.features, self.dtype, name="project_conv")(x_s2d)
        p = bn("project_bn", p)
        return nn.relu(y + p)


class _ScopedBlockS2D(nn.Module):
    """Param scope shim: Down/Up keep their ResidualBlock under 'block'."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s2d, train: bool):
        return ResidualBlockS2D(self.features, self.dtype,
                                name="block")(x_s2d, train)


def _reorder_concat_s2d(a_s2d, b_s2d):
    """s2d form of concat(a, b): channels (q, [ca | cb]) from two s2d
    tensors whose channels are (q, ca) and (q, cb)."""
    b, h, w, ca4 = a_s2d.shape
    cb4 = b_s2d.shape[-1]
    av = a_s2d.reshape(b, h, w, 4, ca4 // 4)
    bv = b_s2d.reshape(b, h, w, 4, cb4 // 4)
    return jnp.concatenate([av, bv], axis=-1).reshape(
        b, h, w, ca4 + cb4)


class ResidualUNet2DDeepS2D(nn.Module):
    """Trainable s2d twin of ResidualUNet2DDeep: same inputs/outputs and
    parameter tree; high-res stages run in space-to-depth form."""
    out_channels: int = 2
    nfeatures: Sequence[int] = (16, 32, 64, 128, 256)
    emd: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = list(self.nfeatures)
        b, h0, w0, _ = x.shape
        s2d_ok = h0 % 4 == 0 and w0 % 4 == 0

        if s2d_ok:
            xs = space_to_depth(x.astype(self.dtype))
            x1s = ResidualBlockS2D(f[0], self.dtype, name="inconv")(xs, train)
            d1 = _ScopedBlockS2D(f[1], self.dtype, name="down1")(x1s, train)
            x2 = _pool_s2d_to_direct(d1)
            x2s = space_to_depth(x2)
            d2 = _ScopedBlockS2D(f[2], self.dtype, name="down2")(x2s, train)
            x3 = _pool_s2d_to_direct(d2)
        else:
            x1 = ResidualBlock(f[0], self.dtype, name="inconv")(x, train)
            x2 = Down(f[1], self.dtype, name="down1")(x1, train)
            x3 = Down(f[2], self.dtype, name="down2")(x2, train)
        x4 = Down(f[3], self.dtype, name="down3")(x3, train)
        x5 = Down(f[4], self.dtype, name="down4")(x4, train)

        out1 = nn.Conv(self.emd, (1, 1), dtype=self.dtype,
                       name="outconv1")(x5)
        y = Up(f[4], self.dtype, name="up1")(x5, train)
        out2 = nn.Conv(self.emd, (1, 1), dtype=self.dtype, name="outconv2")(y)

        y = _concat_skip(y, x4)
        y = Up(f[3], self.dtype, name="up2")(y, train)
        out3 = nn.Conv(self.emd, (1, 1), dtype=self.dtype, name="outconv3")(y)

        if s2d_ok:
            y = replication_pad_to(y, x3.shape[1], x3.shape[2])
            ys = _reorder_concat_s2d(_upsample2x_to_s2d(y, self.dtype),
                                     _upsample2x_to_s2d(x3, self.dtype))
            ys = _ScopedBlockS2D(f[2], self.dtype, name="up3")(ys, train)
            y = depth_to_space(ys)
        else:
            y = _concat_skip(y, x3)
            y = Up(f[2], self.dtype, name="up3")(y, train)
        out4 = nn.Conv(self.emd, (1, 1), dtype=self.dtype, name="outconv4")(y)

        if s2d_ok:
            y = replication_pad_to(y, x2.shape[1], x2.shape[2])
            ys = _reorder_concat_s2d(_upsample2x_to_s2d(y, self.dtype),
                                     _upsample2x_to_s2d(x2, self.dtype))
            ys = _ScopedBlockS2D(f[1], self.dtype, name="up4")(ys, train)
            y = depth_to_space(ys)
        else:
            y = _concat_skip(y, x2)
            y = Up(f[1], self.dtype, name="up4")(y, train)
        embedding = nn.Conv(self.emd, (1, 1), dtype=self.dtype,
                            name="outconv_emb")(y)
        mask = MaskHead(f[1], self.out_channels, self.dtype,
                        name="binary_seg")(y, train)
        return out1, out2, out3, out4, embedding, mask
