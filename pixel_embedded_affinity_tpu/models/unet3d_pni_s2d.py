"""Space-to-depth TRAINING twin of UNetPNIEmbeddingDeep (exact math).

Same idea as models/resunet2d_s2d.py, for the anisotropic PNI 3D UNet
(reference scripts_ac3ac4/model/model_superhuman.py:336-492): the xy
planes of the two highest-resolution stages (160^2 C28, 80^2 C36/48 at
the default config) are lane-starved on TPU (channels pad to 128), and
the training BACKWARD's weight-grad convolutions there are tiny-M/N
matmuls. This module computes those stages in xy space-to-depth form:

* identical parameter tree / initializers — checkpoints interchange;
* convs are parameterized by the DIRECT-space (kd, k, k, Cin, Cout)
  kernel and apply its differentiable block-space transform
  (ops/s2d.py::s2d_conv_weights per z tap, k in {3, 5});
* BatchNorm pools statistics over the 4 xy parity groups (== full-res);
* (1,2,2) maxpool of an s2d stage is a parity-group max; the trilinear
  (1,2,2) align-corners upsample is emitted in s2d form via the parity
  interpolation matmuls (models/fast_forward.py).

Outputs/stats/grads match UNetPNIEmbeddingDeep to float tolerance
(tests/test_unet3d_s2d.py). Like the direct module, H and W must divide
by 16 (four pool levels with matching 2x upsamples).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.s2d import space_to_depth, depth_to_space, s2d_conv_weights
from .fast_forward import _upsample2x_to_s2d, _pool_s2d_to_direct
from .unet3d_pni import ResBlockPNI, UpsampleConv, MergeBNELU
from .common import upsample_align_corners


def _s2d(x):
    """xy space-to-depth of (B, D, H, W, C)."""
    b, d, h, w, c = x.shape
    return space_to_depth(x.reshape(b * d, h, w, c)).reshape(
        b, d, h // 2, w // 2, 4 * c)


def _d2s(x):
    b, d, h, w, c4 = x.shape
    return depth_to_space(x.reshape(b * d, h, w, c4)).reshape(
        b, d, 2 * h, 2 * w, c4 // 4)


def _pool_s2d(x):
    """(1,2,2) maxpool of the underlying volume from its xy-s2d form."""
    b, d, h, w, c4 = x.shape
    return _pool_s2d_to_direct(x.reshape(b * d, h, w, c4)).reshape(
        b, d, h, w, c4 // 4)


def _up2x_s2d(x, dtype):
    """xy align-corners 2x upsample of (B, D, h, w, C), in s2d form."""
    b, d, h, w, c = x.shape
    y = _upsample2x_to_s2d(x.reshape(b * d, h, w, c), dtype)
    return y.reshape(b, d, h, w, 4 * c)


class S2DConv3D(nn.Module):
    """(kd, k, k) SAME conv on an xy-s2d volume, parameterized by the
    direct-space kernel (nn.Conv-compatible shapes/init)."""
    features: int
    kernel_size: tuple
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s2d):
        kd, ky, kx = self.kernel_size
        cin = x_s2d.shape[-1] // 4
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kd, ky, kx, cin, self.features), jnp.float32)
        ks = jnp.stack([s2d_conv_weights(kernel[z]) for z in range(kd)])
        y = jax.lax.conv_general_dilated(
            x_s2d.astype(self.dtype), ks.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=((kd // 2, kd // 2), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + jnp.tile(bias, 4).astype(y.dtype)
        return y


def _bn_grouped(x_s2d, train, mom, dtype, name):
    b, d, h, w, c4 = x_s2d.shape
    g = x_s2d.reshape(b, d, h, w, 4, c4 // 4)
    g = nn.BatchNorm(use_running_average=not train, momentum=mom,
                     epsilon=1e-5, dtype=dtype, name=name)(g)
    return g.reshape(b, d, h, w, c4)


class ResBlockPNIS2D(nn.Module):
    """ResBlockPNI in xy-s2d space (identical parameter tree)."""
    features: int
    bn_momentum_flax: float = 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s2d, train: bool):
        bn = lambda name, v: _bn_grouped(v, train, self.bn_momentum_flax,
                                         self.dtype, name)
        r = S2DConv3D(self.features, (1, 3, 3), use_bias=False,
                      dtype=self.dtype, name="conv_in")(x_s2d)
        r = nn.elu(bn("bn_in", r))
        y = S2DConv3D(self.features, (3, 3, 3), use_bias=False,
                      dtype=self.dtype, name="conv1")(r)
        y = nn.elu(bn("bn1", y))
        y = S2DConv3D(self.features, (3, 3, 3), use_bias=False,
                      dtype=self.dtype, name="conv2")(y)
        out = r + y
        return nn.elu(bn("bn_out", out))


class _Conv1x1S2D(nn.Module):
    """1x1x1 conv applied per xy parity group (nn.Conv param shapes)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s2d):
        cin = x_s2d.shape[-1] // 4
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        b, d, h, w, _ = x_s2d.shape
        xg = x_s2d.reshape(b, d, h, w, 4, cin).astype(self.dtype)
        y = jnp.einsum("bdhwqi,io->bdhwqo", xg,
                       kernel[0, 0, 0].astype(self.dtype))
        y = y + bias.astype(y.dtype)
        return y.reshape(b, d, h, w, -1)


class UpsampleConvS2D(nn.Module):
    """(1,2,2) align-corners upsample emitted in s2d form + 1x1x1 conv."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_direct):
        ys = _up2x_s2d(x_direct, self.dtype)
        return _Conv1x1S2D(self.features, self.dtype, name="conv")(ys)


class MergeBNELUS2D(nn.Module):
    bn_momentum_flax: float = 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_s2d, train: bool):
        return nn.elu(_bn_grouped(x_s2d, train, self.bn_momentum_flax,
                                  self.dtype, "bn"))


class UNetPNIEmbeddingDeepS2D(nn.Module):
    """Trainable xy-s2d twin of UNetPNIEmbeddingDeep (same params)."""
    filters: Sequence[int] = (28, 36, 48, 64, 80)
    emd: int = 16
    bn_momentum_flax: float = 0.999
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        f2 = [self.filters[0]] + list(self.filters)
        mom = self.bn_momentum_flax
        b, d, h0, w0, _ = x.shape
        # like the direct module (4 pool levels + matching 2x ups), the
        # spatial extent must divide by 16 — no fallback needed.
        assert h0 % 16 == 0 and w0 % 16 == 0, (h0, w0)

        Blk = (nn.remat(ResBlockPNIS2D, static_argnums=(2,))
               if self.remat else ResBlockPNIS2D)
        BlkD = (nn.remat(ResBlockPNI, static_argnums=(2,))
                if self.remat else ResBlockPNI)

        def pool_d(v):
            return nn.max_pool(v, (1, 2, 2), strides=(1, 2, 2))

        xs = _s2d(x.astype(self.dtype))
        y = S2DConv3D(f2[0], (1, 5, 5), dtype=self.dtype,
                      name="embed_in")(xs)
        y = nn.elu(y)

        conv0 = Blk(f2[1], mom, self.dtype, name="conv0")(y, train)   # s2d@h/2
        c1_in = _s2d(_pool_s2d(conv0))
        conv1 = Blk(f2[2], mom, self.dtype, name="conv1")(c1_in, train)  # s2d@h/4
        conv2 = BlkD(f2[3], mom, self.dtype,
                     name="conv2")(_pool_s2d(conv1), train)  # direct @ h/4
        conv3 = BlkD(f2[4], mom, self.dtype, name="conv3")(pool_d(conv2),
                                                           train)
        center = BlkD(f2[5], mom, self.dtype, name="center")(pool_d(conv3),
                                                             train)

        up0 = UpsampleConv(f2[4], self.dtype, name="up0")(center)
        cat0 = MergeBNELU(mom, self.dtype, name="cat0")(up0 + conv3, train)
        conv4 = BlkD(f2[4], mom, self.dtype, name="conv4")(cat0, train)

        up1 = UpsampleConv(f2[3], self.dtype, name="up1")(conv4)
        cat1 = MergeBNELU(mom, self.dtype, name="cat1")(up1 + conv2, train)
        conv5 = BlkD(f2[3], mom, self.dtype, name="conv5")(cat1, train)

        # decoder joins the s2d stages: up2 output in s2d@h/4 + conv1
        up2 = UpsampleConvS2D(f2[2], self.dtype, name="up2")(conv5)
        cat2 = MergeBNELUS2D(mom, self.dtype, name="cat2")(up2 + conv1,
                                                           train)
        conv6 = Blk(f2[2], mom, self.dtype, name="conv6")(cat2, train)

        conv6_d = _d2s(conv6)  # direct @ h/2 for the deep head
        up3 = UpsampleConvS2D(f2[1], self.dtype, name="up3")(conv6_d)
        cat3 = MergeBNELUS2D(mom, self.dtype, name="cat3")(up3 + conv0,
                                                           train)
        conv7 = Blk(f2[1], mom, self.dtype, name="conv7")(cat3, train)

        eo = S2DConv3D(f2[0], (1, 5, 5), dtype=self.dtype,
                       name="embed_out")(conv7)
        eo = nn.elu(eo)

        def head3(name, v_s2d):
            return _d2s(_Conv1x1S2D(self.emd, self.dtype, name=name)(v_s2d))

        head = lambda name: nn.Conv(self.emd, (1, 1, 1), dtype=self.dtype,
                                    name=name)
        out = head3("out_put", eo)
        out1 = head("out_put1")(center)
        out2 = head("out_put2")(conv4)
        out3 = head("out_put3")(conv5)
        out4 = head("out_put4")(conv6_d)
        return out1, out2, out3, out4, out
