"""ResUNet-2D family (Flax, NHWC).

Functional rebuild of the reference ResUNet architecture
(scripts_cvppp/model/unet2d_residual.py): residual conv-BN-ReLU blocks with a
conv-BN projection skip, maxpool encoder over 5 scales, bilinear
(align_corners=True) decoder with concat skips, five 1x1 embedding heads
(deep supervision at 1/16, 1/8, 1/4, 1/2, 1/1) and a binary mask head.

TPU-first choices: channels-last layout, BN with f32 stats under bf16 compute,
padding/convs left to XLA fusion. Parameter-compatible with the reference
checkpoints via train/convert_torch.py.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import upsample_align_corners, replication_pad_to


class ResidualBlock(nn.Module):
    """(conv3x3-BN-ReLU-conv3x3-BN) + (conv3x3-BN skip), then ReLU."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        y = bn("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = bn("bn2")(y)
        p = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="project_conv")(x)
        p = bn("project_bn")(p)
        return nn.relu(y + p)


class Down(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = ResidualBlock(self.features, self.dtype, name="block")(x, train)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class Up(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = upsample_align_corners(x, axes=(1, 2), factors=(2, 2))
        return ResidualBlock(self.features, self.dtype, name="block")(x, train)


def _concat_skip(x_cur, x_prev):
    """Concat along channels, edge-padding x_cur up to x_prev's spatial size."""
    x_cur = replication_pad_to(x_cur, x_prev.shape[1], x_prev.shape[2])
    return jnp.concatenate([x_cur, x_prev], axis=-1)


class MaskHead(nn.Module):
    """1x1 conv - BN - ReLU - 1x1 conv binary segmentation head."""
    hidden: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="conv2")(x)


class ResidualUNet2DDeep(nn.Module):
    """Deep-supervision ResUNet: returns (emb1..emb4, embedding, mask_logits).

    emb1 is at 1/16 scale ... embedding at full scale; all embeddings are
    ``emd``-dim, channels-last. mask_logits has ``out_channels`` classes.
    """
    out_channels: int = 2
    nfeatures: Sequence[int] = (16, 32, 64, 128, 256)
    emd: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = list(self.nfeatures)
        x1 = ResidualBlock(f[0], self.dtype, name="inconv")(x, train)
        x2 = Down(f[1], self.dtype, name="down1")(x1, train)
        x3 = Down(f[2], self.dtype, name="down2")(x2, train)
        x4 = Down(f[3], self.dtype, name="down3")(x3, train)
        x5 = Down(f[4], self.dtype, name="down4")(x4, train)

        out1 = nn.Conv(self.emd, (1, 1), dtype=self.dtype, name="outconv1")(x5)

        y = Up(f[4], self.dtype, name="up1")(x5, train)
        out2 = nn.Conv(self.emd, (1, 1), dtype=self.dtype, name="outconv2")(y)

        y = _concat_skip(y, x4)
        y = Up(f[3], self.dtype, name="up2")(y, train)
        out3 = nn.Conv(self.emd, (1, 1), dtype=self.dtype, name="outconv3")(y)

        y = _concat_skip(y, x3)
        y = Up(f[2], self.dtype, name="up3")(y, train)
        out4 = nn.Conv(self.emd, (1, 1), dtype=self.dtype, name="outconv4")(y)

        y = _concat_skip(y, x2)
        y = Up(f[1], self.dtype, name="up4")(y, train)
        embedding = nn.Conv(self.emd, (1, 1), dtype=self.dtype,
                            name="outconv_emb")(y)

        mask = MaskHead(f[1], self.out_channels, self.dtype,
                        name="binary_seg")(y, train)
        return out1, out2, out3, out4, embedding, mask


class ResidualUNet2D(nn.Module):
    """Single-head variant (embedding only + mask head), ~ ResidualUNet2D_embedding."""
    out_channels: int = 2
    nfeatures: Sequence[int] = (16, 32, 64, 128, 256)
    emd: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = list(self.nfeatures)
        x1 = ResidualBlock(f[0], self.dtype, name="inconv")(x, train)
        x2 = Down(f[1], self.dtype, name="down1")(x1, train)
        x3 = Down(f[2], self.dtype, name="down2")(x2, train)
        x4 = Down(f[3], self.dtype, name="down3")(x3, train)
        x5 = Down(f[4], self.dtype, name="down4")(x4, train)

        y = Up(f[4], self.dtype, name="up1")(x5, train)
        y = _concat_skip(y, x4)
        y = Up(f[3], self.dtype, name="up2")(y, train)
        y = _concat_skip(y, x3)
        y = Up(f[2], self.dtype, name="up3")(y, train)
        y = _concat_skip(y, x2)
        y = Up(f[1], self.dtype, name="up4")(y, train)
        embedding = nn.Conv(self.emd, (1, 1), dtype=self.dtype,
                            name="outconv_emb")(y)
        mask = MaskHead(f[1], self.out_channels, self.dtype,
                        name="binary_seg")(y, train)
        return embedding, mask
