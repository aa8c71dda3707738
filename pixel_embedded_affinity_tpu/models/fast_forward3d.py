"""Optimized serving forward for UNetPNIEmbeddingDeep (exact math).

Builds a pure function from trained ``variables`` that reproduces
``UNetPNIEmbeddingDeep.apply(..., train=False)``'s final embedding with a
graph shaped for how XLA actually lowers convolutions on this toolchain:

* **z-decomposed 2D convs on a merged (B*D) batch.** The (B, D, H, W, C)
  volume is viewed as B*D images; a 3x3x3 SAME conv becomes ONE 2D 3x3
  conv over the z-concatenated input (channels [x(z-1), x(z), x(z+1)],
  zero-filled at volume ends — exactly conv3d's zero padding). The 2D conv
  path is the one XLA tiles well here (the 2D pipeline reaches ~19-20% MFU
  while the NDHWC 3D graph serves at ~1-3%, docs/PERF.md), and the z-concat
  also improves lane geometry: 3x28 = 84 input lanes instead of a 4.6x
  lane-padded C28. 1x3x3 / 1x5x5 / 1x1x1 convs are plain per-slice 2D convs.
* **inference BatchNorm folded into the conv weights** (scale into the
  kernel's Cout, shift as bias); the residual add's bn_out scale is folded
  into conv2 and applied to the skip as a fused affine.
* **(1,2,2) maxpool / trilinear align-corners upsample** run as 2D ops on
  the merged batch (upsample = two interpolation-matrix einsums; the
  reference upsamples xy-only, model_superhuman.py:425).
* **deep-supervision heads dropped**: serving consumes only the full-res
  embedding (scripts_ac3ac4/inference.py:123-168 uses `embedding` alone).

Numerics match the Flax module to dtype tolerance
(tests/test_fast_forward3d.py). Mirrors the reference forward
scripts_ac3ac4/model/model_superhuman.py:336-492.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fast_forward import _fold_bn, _interp_matrix

_conv = functools.partial(jax.lax.conv_general_dilated, window_strides=(1, 1),
                          padding="SAME",
                          dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _zconcat(x, b, d):
    """(B*D, H, W, C) -> (B*D, H, W, 3C): channels [z-1, z, z+1] with
    zero fill at volume ends (conv3d SAME zero padding in z)."""
    bd, h, w, c = x.shape
    v = x.reshape(b, d, h, w, c)
    zer = jnp.zeros((b, 1, h, w, c), x.dtype)
    prev = jnp.concatenate([zer, v[:, :-1]], axis=1)
    nxt = jnp.concatenate([v[:, 1:], zer], axis=1)
    return jnp.concatenate([prev, v, nxt], axis=-1).reshape(bd, h, w, 3 * c)


def _k3d_to_2d(kernel):
    """(3, ky, kx, Cin, Cout) -> (ky, kx, 3*Cin, Cout) matching _zconcat's
    [z-1, z, z+1] channel order."""
    kd, ky, kx, cin, cout = kernel.shape
    assert kd == 3, kd
    return jnp.concatenate([kernel[0], kernel[1], kernel[2]], axis=2)


class _PNIBlockW:
    """Folded weights of one ResBlockPNI, lowered to 2D-conv form."""

    def __init__(self, p, s, dtype):
        # conv_in (1x3x3, no bias) + bn_in
        sc, sh = _fold_bn(p["bn_in"], s["bn_in"])
        self.w_in = (p["conv_in"]["kernel"][0] * sc).astype(dtype)
        self.b_in = sh.astype(jnp.float32)
        # conv1 (3x3x3, no bias) + bn1
        sc, sh = _fold_bn(p["bn1"], s["bn1"])
        self.w1 = _k3d_to_2d(p["conv1"]["kernel"] * sc).astype(dtype)
        self.b1 = sh.astype(jnp.float32)
        # conv2 (3x3x3, no bias); bn_out folds over (r + conv2):
        # elu(bn(r + c2)) = elu(r*scale + conv2[w*scale] + shift)
        sc, sh = _fold_bn(p["bn_out"], s["bn_out"])
        self.w2 = _k3d_to_2d(p["conv2"]["kernel"] * sc).astype(dtype)
        self.b2 = sh.astype(jnp.float32)
        self.scale_r = sc.astype(jnp.float32)

    def __call__(self, x, b, d):
        r = jax.nn.elu(_conv(x, self.w_in) + self.b_in.astype(x.dtype))
        y = jax.nn.elu(_conv(_zconcat(r, b, d), self.w1)
                       + self.b1.astype(x.dtype))
        y = _conv(_zconcat(y, b, d), self.w2)
        return jax.nn.elu(r * self.scale_r.astype(x.dtype) + y
                          + self.b2.astype(x.dtype))


def _upsample2x_xy(y, dtype):
    """(B*D, h, w, C) -> (B*D, 2h, 2w, C) align-corners bilinear."""
    bd, h, w, c = y.shape
    my = _interp_matrix(2 * h, h).astype(dtype)
    mx = _interp_matrix(2 * w, w).astype(dtype)
    y = jnp.einsum("oi,biwc->bowc", my, y)
    return jnp.einsum("oj,bhjc->bhoc", mx, y)


def build_fast_pni_forward(variables, *, dtype=jnp.bfloat16,
                           filters=(28, 36, 48, 64, 80), emd: int = 16,
                           emb_f32: bool = True):
    """Returns forward(x: (B, D, H, W, 1)) -> embedding (B, D, H, W, emd).

    Exact-math serving twin of UNetPNIEmbeddingDeep.apply(train=False)[-1]
    with folded BN + 2D-conv lowering (module docstring). ``emb_f32`` casts
    the final embedding to f32 (the affinity dot and canvases stay f32 in
    the tiled engine regardless of compute dtype)."""
    p = variables["params"]
    s = variables.get("batch_stats", {})

    w_ein = p["embed_in"]["kernel"][0].astype(dtype)
    b_ein = p["embed_in"]["bias"].astype(jnp.float32)
    blocks = {k: _PNIBlockW(p[k], s[k], dtype)
              for k in ("conv0", "conv1", "conv2", "conv3", "center",
                        "conv4", "conv5", "conv6", "conv7")}
    ups = {k: (p[k]["conv"]["kernel"][0, 0, 0].astype(dtype),
               p[k]["conv"]["bias"].astype(jnp.float32))
           for k in ("up0", "up1", "up2", "up3")}
    cats = {k: _fold_bn(p[k]["bn"], s[k]["bn"])
            for k in ("cat0", "cat1", "cat2", "cat3")}
    w_eout = p["embed_out"]["kernel"][0].astype(dtype)
    b_eout = p["embed_out"]["bias"].astype(jnp.float32)
    w_head = p["out_put"]["kernel"][0, 0, 0].astype(dtype)
    b_head = p["out_put"]["bias"].astype(jnp.float32)

    def pool(v):
        import flax.linen as nn

        return nn.max_pool(v, (2, 2), strides=(2, 2))

    def up_merge(v, skip, up_key, cat_key, b, d):
        wk, bk = ups[up_key]
        u = _upsample2x_xy(v, dtype)
        u = jnp.einsum("bhwi,io->bhwo", u, wk) + bk.astype(v.dtype)
        sc, sh = cats[cat_key]
        return jax.nn.elu((u + skip) * sc.astype(v.dtype)
                          + sh.astype(v.dtype))

    def forward(x):
        b, d, h, w, _ = x.shape
        y = x.reshape(b * d, h, w, x.shape[-1]).astype(dtype)
        y = jax.nn.elu(_conv(y, w_ein) + b_ein.astype(dtype))

        c0 = blocks["conv0"](y, b, d)
        c1 = blocks["conv1"](pool(c0), b, d)
        c2 = blocks["conv2"](pool(c1), b, d)
        c3 = blocks["conv3"](pool(c2), b, d)
        ce = blocks["center"](pool(c3), b, d)

        v = blocks["conv4"](up_merge(ce, c3, "up0", "cat0", b, d), b, d)
        v = blocks["conv5"](up_merge(v, c2, "up1", "cat1", b, d), b, d)
        v = blocks["conv6"](up_merge(v, c1, "up2", "cat2", b, d), b, d)
        v = blocks["conv7"](up_merge(v, c0, "up3", "cat3", b, d), b, d)

        eo = jax.nn.elu(_conv(v, w_eout) + b_eout.astype(v.dtype))
        emb = jnp.einsum("bhwi,io->bhwo", eo, w_head) + b_head.astype(eo.dtype)
        if emb_f32:
            emb = emb.astype(jnp.float32)
        return emb.reshape(b, d, h, w, emd)

    return forward
