"""Fused 3x3 conv (+ folded BN scale/shift + ReLU) Pallas TPU kernel.

XLA's conv on this target runs ~10x off roofline for the high-resolution
low-channel layers that dominate the ResUNet decoder. This kernel computes a
stride-1 SAME 3x3 conv as 9 tap-matmuls on the MXU with the input tile
resident in VMEM, and fuses the BatchNorm-folded scale/shift and ReLU into
the accumulator epilogue — one HBM read of x, one write of y.

Layout trick: spatial dims are pre-flattened to rows of a (rows, C) matrix
(W padded by 1 column each side, H by 1 top halo row), so conv tap (dy, dx)
is a CONTIGUOUS row slice at offset dy*Wp + dx and each tap is a plain
(TH*Wp, Cin) @ (Cin, Cout) matmul. The 2-row halo below a tile comes from a
second input view with 2*Wp-row blocks. Junk columns (x = W, W+1, the wrap
rows) are computed and sliced away outside.

Grid: (B, H-tiles, Cin-chunks). Cin chunks accumulate into a VMEM scratch
that persists across the minor grid dim; the epilogue runs on the last chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_cin_chunks, relu, out_dtype, th, wp,
            cur_ref, halo_ref, w_ref, scale_ref, shift_ref, out_ref, acc_ref):
    # cur: (1, TH*Wp, CC); halo: (1, 2*Wp, CC); w: (1, 3, 3, CC, Cout)
    c = pl.program_id(2)
    cc = cur_ref.shape[2]
    cout = w_ref.shape[4]

    # ((TH+2)*Wp + 8, CC): the trailing zero rows keep the (2,2) tap's slice
    # in range (it overruns by 2 rows, feeding only the junk wrap columns)
    flat = jnp.concatenate(
        [cur_ref[0], halo_ref[0], jnp.zeros((8, cc), cur_ref.dtype)], axis=0)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros((th * wp, cout), jnp.float32)

    # accumulate tap-by-tap into the scratch ref (keeps live temps small)
    for dy in range(3):
        for dx in range(3):
            start = dy * wp + dx  # static per tap
            lhs = flat[start:start + th * wp]
            acc_ref[:] = acc_ref[:] + jnp.dot(
                lhs, w_ref[0, dy, dx], preferred_element_type=jnp.float32)

    @pl.when(c == n_cin_chunks - 1)
    def _():
        res = acc_ref[:] * scale_ref[0] + shift_ref[0]
        if relu:
            res = jnp.maximum(res, 0.0)
        out_ref[0] = res.astype(out_dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def conv3x3_fused(x: jnp.ndarray, w: jnp.ndarray,
                  scale: jnp.ndarray | None = None,
                  shift: jnp.ndarray | None = None,
                  relu: bool = False,
                  tile_h: int = 8,
                  interpret: bool = False) -> jnp.ndarray:
    """SAME stride-1 3x3 conv: x (B,H,W,Cin), w (3,3,Cin,Cout) -> (B,H,W,Cout).

    scale/shift (Cout,) fold bias + BatchNorm: y = conv(x)*scale + shift.
    tile_h must be even (the halo view uses 2-row-block granularity).
    """
    assert tile_h % 2 == 0
    b, h, wd, cin = x.shape
    cout = w.shape[3]
    if scale is None:
        scale = jnp.ones((cout,), jnp.float32)
    if shift is None:
        shift = jnp.zeros((cout,), jnp.float32)

    # channel chunking: single chunk when small, else 128-sized chunks
    if cin <= 256:
        cc = cin
    else:
        cc = 128
    cin_p = _round_up(cin, cc)
    n_chunks = cin_p // cc
    # wp multiple of 8 so halo blocks (2*wp rows) satisfy sublane tiling
    wp = _round_up(wd + 2, 8)
    n_tiles = -(-h // tile_h)
    hp = (n_tiles + 1) * tile_h  # bottom slack so the halo view stays in range

    xp = jnp.pad(x, ((0, 0), (1, hp - h - 1), (1, wp - wd - 1),
                     (0, cin_p - cin)))
    xflat = xp.reshape(b, hp * wp, cin_p)
    wpad = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    wpad = wpad.reshape(3, 3, n_chunks, cc, cout).transpose(2, 0, 1, 3, 4)
    wpad = wpad.astype(x.dtype)

    kernel = functools.partial(_kernel, n_chunks, relu, x.dtype, tile_h, wp)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, tile_h * wp, cc),
                         lambda bi, i, c: (bi, i, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * wp, cc),
                         lambda bi, i, c: (bi, (i + 1) * (tile_h // 2), c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, cc, cout),
                         lambda bi, i, c: (c, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h * wp, cout),
                               lambda bi, i, c: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_h * wp, cout),
                                       x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_h * wp, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xflat, xflat, wpad,
      scale.reshape(1, cout).astype(jnp.float32),
      shift.reshape(1, cout).astype(jnp.float32))
    out = out.reshape(b, n_tiles * tile_h, wp, cout)
    return out[:, :h, :wd, :]
