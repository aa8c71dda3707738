"""PNI "superhuman" anisotropic 3D UNet (Flax, NDHWC).

Rebuild of UNet_PNI_embedding_deep
(scripts_ac3ac4/model/model_superhuman.py:336-492): 1x5x5 in/out convs
(conv+ELU, no BN), four (1,2,2) maxpool stages with residual blocks
(resBlock_pni: 1x3x3 conv-BN-ELU, then 3x3x3 conv-BN-ELU + 3x3x3 conv,
residual add, BN, ELU), trilinear (1,2,2) align_corners=True ups with 1x1x1
conv, add-merge (BN+ELU on the sum), and five 1x1x1 embedding heads.

Default config: filters (28, 36, 48, 64, 80), merge 'add', ELU,
BN momentum 0.001 (torch) -> flax momentum 0.999, input (B, 18, 160, 160, 1).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import upsample_align_corners


class ResBlockPNI(nn.Module):
    """1x3x3 conv-BN-ELU; + (3x3x3 conv-BN-ELU, 3x3x3 conv); add; BN; ELU."""
    features: int
    bn_momentum_flax: float = 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=self.bn_momentum_flax,
                                       epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        r = nn.Conv(self.features, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv_in")(x)
        r = bn("bn_in")(r)
        r = nn.elu(r)
        y = nn.Conv(self.features, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(r)
        y = bn("bn1")(y)
        y = nn.elu(y)
        y = nn.Conv(self.features, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        out = r + y
        out = bn("bn_out")(out)
        return nn.elu(out)


class UpsampleConv(nn.Module):
    """Trilinear (1,2,2) align_corners upsample + 1x1x1 conv (bias)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_align_corners(x, axes=(2, 3), factors=(2, 2))
        return nn.Conv(self.features, (1, 1, 1), dtype=self.dtype,
                       name="conv")(x)


class MergeBNELU(nn.Module):
    """BN + ELU applied to the (added) merge — the reference's cat_i block."""
    bn_momentum_flax: float = 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum_flax, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.elu(x)


class UNetPNIEmbeddingDeep(nn.Module):
    """Returns (out1(1/16), out2(1/8), out3(1/4), out4(1/2), embedding(1/1)).

    All outputs ``emd``-dim channels-last. Spatial downsampling is xy-only
    (anisotropic EM volumes).
    """
    filters: Sequence[int] = (28, 36, 48, 64, 80)
    emd: int = 16
    bn_momentum_flax: float = 0.999  # torch momentum 0.001
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # block-granular rematerialization (training memory)
    # with remat on, blocks NOT in this set keep their activations (their
    # tensors are small at low resolution; storing them skips the
    # backward recompute). None = remat every block.
    remat_skip: tuple = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        f2 = [self.filters[0]] + list(self.filters)
        mom = self.bn_momentum_flax
        # checkpoint residual blocks: only one block's activations are
        # live during backward (the dual-view 3D step needs ~22 GB
        # without any remat)
        remat_blk = nn.remat(ResBlockPNI, static_argnums=(2,))

        def ResBlockPNI_(feat, mom_, dt, name):
            if self.remat and name not in (self.remat_skip or ()):
                return remat_blk(feat, mom_, dt, name=name)
            return ResBlockPNI(feat, mom_, dt, name=name)

        def pool(v):
            return nn.max_pool(v, (1, 2, 2), strides=(1, 2, 2))

        # embed_in: 1x5x5 conv (bias) + ELU, no BN
        y = nn.Conv(f2[0], (1, 5, 5), padding=((0, 0), (2, 2), (2, 2)),
                    dtype=self.dtype, name="embed_in")(x)
        y = nn.elu(y)

        conv0 = ResBlockPNI_(f2[1], mom, self.dtype, name="conv0")(y, train)
        conv1 = ResBlockPNI_(f2[2], mom, self.dtype, name="conv1")(pool(conv0), train)
        conv2 = ResBlockPNI_(f2[3], mom, self.dtype, name="conv2")(pool(conv1), train)
        conv3 = ResBlockPNI_(f2[4], mom, self.dtype, name="conv3")(pool(conv2), train)
        center = ResBlockPNI_(f2[5], mom, self.dtype, name="center")(pool(conv3), train)

        up0 = UpsampleConv(f2[4], self.dtype, name="up0")(center)
        cat0 = MergeBNELU(mom, self.dtype, name="cat0")(up0 + conv3, train)
        conv4 = ResBlockPNI_(f2[4], mom, self.dtype, name="conv4")(cat0, train)

        up1 = UpsampleConv(f2[3], self.dtype, name="up1")(conv4)
        cat1 = MergeBNELU(mom, self.dtype, name="cat1")(up1 + conv2, train)
        conv5 = ResBlockPNI_(f2[3], mom, self.dtype, name="conv5")(cat1, train)

        up2 = UpsampleConv(f2[2], self.dtype, name="up2")(conv5)
        cat2 = MergeBNELU(mom, self.dtype, name="cat2")(up2 + conv1, train)
        conv6 = ResBlockPNI_(f2[2], mom, self.dtype, name="conv6")(cat2, train)

        up3 = UpsampleConv(f2[1], self.dtype, name="up3")(conv6)
        cat3 = MergeBNELU(mom, self.dtype, name="cat3")(up3 + conv0, train)
        conv7 = ResBlockPNI_(f2[1], mom, self.dtype, name="conv7")(cat3, train)

        # embed_out: 1x5x5 conv + ELU, then 1x1x1 heads
        eo = nn.Conv(f2[0], (1, 5, 5), padding=((0, 0), (2, 2), (2, 2)),
                     dtype=self.dtype, name="embed_out")(conv7)
        eo = nn.elu(eo)

        head = lambda name: nn.Conv(self.emd, (1, 1, 1), dtype=self.dtype,
                                    name=name)
        out = head("out_put")(eo)
        out1 = head("out_put1")(center)
        out2 = head("out_put2")(conv4)
        out3 = head("out_put3")(conv5)
        out4 = head("out_put4")(conv6)
        return out1, out2, out3, out4, out
