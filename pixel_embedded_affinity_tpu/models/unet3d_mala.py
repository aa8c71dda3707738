"""MALA valid-convolution 3D UNet (Flax, NDHWC).

Rebuild of UNet3D_MALA_deep (scripts_ac3ac4/model/unet3d_mala.py:214-316):
valid (unpadded) 3x3x3 convs with LeakyReLU(0.005), (1,3,3) maxpools, grouped
(depthwise) (1,3,3) transposed-conv upsampling + 1x1x1 channel reduction,
center-crop-and-concat skips, final 1x1x1 head to ``emd`` channels.
Input (B, 53, 268, 268, 1) -> embedding (B, 25, 56, 56, emd).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.005)


def _crop_concat(upsampled, bypass):
    """Center-crop bypass (xy only; z must already match) and concat channels."""
    dz = (bypass.shape[1] - upsampled.shape[1]) // 2
    dy = (bypass.shape[2] - upsampled.shape[2]) // 2
    dx = (bypass.shape[3] - upsampled.shape[3]) // 2
    b = bypass[:, dz:bypass.shape[1] - dz,
               dy:bypass.shape[2] - dy,
               dx:bypass.shape[3] - dx, :]
    return jnp.concatenate([upsampled, b], axis=-1)


class _DepthwiseTranspose(nn.Module):
    """Grouped (depthwise) transposed conv, kernel=stride=(1,3,3), no bias.

    kernel == stride means non-overlapping scatter: each input voxel is
    multiplied by its per-channel 3x3 kernel into a disjoint 3x3 output block.
    Expressed as broadcast-multiply + reshape (exact, and cheap on the VPU).
    """
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.features), self.dtype)
        b, d, h, w, c = x.shape
        out = (x[:, :, :, None, :, None, :] *
               k[None, None, None, :, None, :, :])
        return out.reshape(b, d, h * 3, w * 3, c)


class UNet3DMALADeep(nn.Module):
    emd: int = 16
    dtype: jnp.dtype = jnp.float32
    # per-level channel widths; the reference hardcodes (12, 60, 300, 1500)
    # (unet3d_mala.py:221-252). The knob exists so a tiny-geometry golden
    # fixture can witness parity without torch (docs/gen_parity_fixtures.py).
    widths: tuple = (12, 60, 300, 1500)

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, name: nn.Conv(f, k, padding="VALID",
                                          dtype=self.dtype, name=name)
        pool = lambda v: nn.max_pool(v, (1, 3, 3), strides=(1, 3, 3))
        n1, n2, n3, n4 = self.widths

        c1 = _lrelu(conv(n1, (3, 3, 3), "conv1")(x))
        c2 = _lrelu(conv(n1, (3, 3, 3), "conv2")(c1))
        p1 = pool(c2)
        c3 = _lrelu(conv(n2, (3, 3, 3), "conv3")(p1))
        c4 = _lrelu(conv(n2, (3, 3, 3), "conv4")(c3))
        p2 = pool(c4)
        c5 = _lrelu(conv(n3, (3, 3, 3), "conv5")(p2))
        c6 = _lrelu(conv(n3, (3, 3, 3), "conv6")(c5))
        p3 = pool(c6)
        c7 = _lrelu(conv(n4, (3, 3, 3), "conv7")(p3))
        c8 = _lrelu(conv(n4, (3, 3, 3), "conv8")(c7))

        d1 = _DepthwiseTranspose(n4, self.dtype, name="dconv1")(c8)
        c9 = conv(n3, (1, 1, 1), "conv9")(d1)
        m1 = _crop_concat(c9, c6)
        c10 = _lrelu(conv(n3, (3, 3, 3), "conv10")(m1))
        c11 = _lrelu(conv(n3, (3, 3, 3), "conv11")(c10))

        d2 = _DepthwiseTranspose(n3, self.dtype, name="dconv2")(c11)
        c12 = conv(n2, (1, 1, 1), "conv12")(d2)
        m2 = _crop_concat(c12, c4)
        c13 = _lrelu(conv(n2, (3, 3, 3), "conv13")(m2))
        c14 = _lrelu(conv(n2, (3, 3, 3), "conv14")(c13))

        d3 = _DepthwiseTranspose(n2, self.dtype, name="dconv3")(c14)
        c15 = conv(n1, (1, 1, 1), "conv15")(d3)
        m3 = _crop_concat(c15, c2)
        c16 = _lrelu(conv(n1, (3, 3, 3), "conv16")(m3))
        c17 = _lrelu(conv(n1, (3, 3, 3), "conv17")(c16))

        return conv(self.emd, (1, 1, 1), "conv18")(c17)
