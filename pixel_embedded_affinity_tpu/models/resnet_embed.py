"""ResNet-50/101 pixel-embedding networks (paper model variants).

The reference paper reports ResNet-50/ResNet-101 variants (README.md:124-139)
but only ships the (unwired) re-id classifier StRARes
(scripts_cvppp/model/StRARes.py:94-216). This module reconstructs the
variants under the framework's deep-supervision contract: a torchvision-style
bottleneck ResNet encoder (stride-16, layer4 stride 1 like StRARes'
last_stride=1), an optional StRA-style windowed local-attention stage-4
block, and a light upsampling decoder emitting the same
(emb 1/16, 1/8, 1/4, 1/2, 1/1, mask) tuple as ResidualUNet2DDeep — drop-in
for the training/inference stack.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import upsample_align_corners


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    use_projection: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.use_projection:
            sc = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                         use_bias=False, dtype=self.dtype, name="proj")(x)
            sc = bn("proj_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class LocalAttentionBlock(nn.Module):
    """StRA-style windowed multi-head self-attention over local patches.

    Non-overlapping windows (static shapes, fuses to batched MXU matmuls) —
    the TPU-native counterpart of the reference's unfold-based local
    attention (stru_mask_value.py).
    """
    planes: int
    heads: int = 8
    window: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b, h, w, c = x.shape
        win = self.window
        assert h % win == 0 and w % win == 0, "window must divide spatial dims"
        inner = self.planes
        qkv = nn.Conv(3 * inner, (1, 1), use_bias=False, dtype=self.dtype,
                      name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def windows(t):
            t = t.reshape(b, h // win, win, w // win, win, self.heads,
                          inner // self.heads)
            return t.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
                b, (h // win) * (w // win), self.heads, win * win,
                inner // self.heads)

        qw, kw, vw = windows(q), windows(k), windows(v)
        scale = (inner // self.heads) ** -0.5
        attn = jnp.einsum("bnhqd,bnhkd->bnhqk", qw, kw) * scale
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnhqk,bnhkd->bnhqd", attn, vw)
        out = out.reshape(b, h // win, w // win, self.heads, win, win,
                          inner // self.heads)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, h, w, inner)
        out = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                      name="proj")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn")(out)
        return nn.relu(x + out)


class ResNetEmbedding(nn.Module):
    """ResNet-50/101 encoder + upsampling decoder with 5 embedding heads.

    depth 50 -> layers (3,4,6,3); 101 -> (3,4,23,3). Output contract matches
    ResidualUNet2DDeep: (emb/16, emb/8, emb/4, emb/2, emb/1, mask_logits).
    """
    depth: int = 50
    emd: int = 16
    out_channels: int = 2
    local_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        c1 = y  # /2
        y = nn.max_pool(jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                constant_values=-jnp.inf),
                        (3, 3), strides=(2, 2))

        def stage(y, planes, blocks, stride, name):
            y = Bottleneck(planes, stride, True, self.dtype,
                           name=f"{name}_0")(y, train)
            for i in range(1, blocks):
                y = Bottleneck(planes, 1, False, self.dtype,
                               name=f"{name}_{i}")(y, train)
            return y

        c2 = stage(y, 64, layers[0], 1, "layer1")    # /4
        c3 = stage(c2, 128, layers[1], 2, "layer2")  # /8
        c4 = stage(c3, 256, layers[2], 2, "layer3")  # /16
        c5 = stage(c4, 512, layers[3], 1, "layer4")  # /16 (last_stride=1)
        if self.local_attention:
            c5 = LocalAttentionBlock(512, dtype=self.dtype,
                                     name="layer4_attn")(c5, train)

        head = lambda name: nn.Conv(self.emd, (1, 1), dtype=self.dtype,
                                    name=name)

        def up_block(y, skip, feats, name):
            y = upsample_align_corners(y, (1, 2), (2, 2))
            y = jnp.concatenate([y, skip], axis=-1)
            y = nn.Conv(feats, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(y)
            return nn.relu(bn(f"{name}_bn")(y))

        out1 = head("outconv1")(c5)                         # /16
        d = up_block(c5, c3, 256, "up1")                    # /8
        out2 = head("outconv2")(d)
        d = up_block(d, c2, 128, "up2")                     # /4
        out3 = head("outconv3")(d)
        d = up_block(d, c1, 64, "up3")                      # /2
        out4 = head("outconv4")(d)
        d = upsample_align_corners(d, (1, 2), (2, 2))       # /1
        d = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="up4_conv")(d)
        d = nn.relu(bn("up4_bn")(d))
        embedding = head("outconv_emb")(d)

        m = nn.Conv(64, (1, 1), dtype=self.dtype, name="mask_conv1")(d)
        m = nn.relu(bn("mask_bn")(m))
        mask = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="mask_conv2")(m)
        return out1, out2, out3, out4, embedding, mask
