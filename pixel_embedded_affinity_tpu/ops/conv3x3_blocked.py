"""Blocked-pixel fused 3x3 conv Pallas kernel (+BN scale/shift + ReLU).

The small-channel high-resolution layers that dominate the ResUNet
(Cin 16-96) run at 2.7-8% of MXU peak under XLA: with channels on the lane
axis, a C=16 activation wastes 7/8 of every 128-lane register and the conv
matmul has K=N=16 of 128. This kernel reshapes the problem so every matmul
is full-geometry:

* Activations stay NHWC in HBM; the kernel views the padded flat pixel
  stream (R, Cin) as (R/bx, 128) where bx = 128/Cin consecutive pixels
  share one 128-lane row ("blocked-pixel" layout — a free reshape, no copy).
* A 3x3 conv then decomposes into 6 matmuls per Cin-chunk:
  for each dy in {0,1,2}, the input pixels live in exactly two consecutive
  block-rows, so  out_block = X[j + dy*wpb] @ W[dy,0] + X[j + dy*wpb + 1]
  @ W[dy,1],  where W[dy,s] is a (128, bx*Cout) block-banded matrix with
  W[dy,s][(p,ci),(q,co)] = w[dy, p + bx*s - q, ci, co]. K = 128 always;
  N = bx*Cout >= 128 when Cout >= Cin. Useful-FLOP fraction = 1.5*Cin/128
  (capped at 1): 18.75% for C16, 37.5% for C32, 75% for C64, 100% for
  C>=128 — vs XLA's measured 2.7%/8.4%/30%/87% on the same shapes.
* Cin > 128 (or Cin not in {16,32,64,128}) is handled by zero-padded
  chunks accumulated over the minor grid dimension; the chunk size is
  min(128, next_pow2(max(16, min(Cin, Cout)))) so N stays >= 128.
* BN-folded scale/shift + ReLU run in the f32 accumulator epilogue;
  conv1 + projection-conv of a ResidualBlock can be computed in one pass by
  concatenating their weights on Cout (shared input).

Replaces the reference hot stack scripts_cvppp/model/unet2d_residual.py:5-25
(ResidualBlock conv3x3 pairs) on the TPU inference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chunk_size(cin: int, cout: int) -> int:
    """Largest channel-chunk cc in {16,32,64,128} with cc <= max(cout, 16)
    (so N = (128/cc)*cout >= 128 when possible) and cc covering cin."""
    best = 16
    for cc in (16, 32, 64, 128):
        if cc <= max(cout, 16) and (cc <= cin or best == 16):
            if cc <= max(cin, 16):
                best = cc
    return best


def pack_weights_blocked(w: jnp.ndarray, cc: int) -> jnp.ndarray:
    """(3, 3, Cin, Cout) conv weights -> (n_chunks, 3, n_s, 128, bx*Cout)
    block-banded matmul weights for the blocked-pixel kernel. n_s = 2
    block-row shifts cover the 3 x-taps when bx >= 2; bx == 1 needs 3.
    Traceable (pure jnp), so it can live inside a jit; it only depends on
    the weights, so XLA hoists it out of any iteration loop."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    bx = 128 // cc
    n_s = 3 if bx == 1 else 2
    cin_p = _round_up(cin, cc)
    n_chunks = cin_p // cc
    wf = jnp.pad(w.astype(jnp.float32), ((0, 0), (0, 0),
                                         (0, cin_p - cin), (0, 0)))
    zero = jnp.zeros((cc, cout), jnp.float32)
    chunks = []
    for ch in range(n_chunks):
        dys = []
        for dy in range(3):
            ss = []
            for s in range(n_s):
                rows = []
                for p in range(bx):
                    cols = []
                    for q in range(bx):
                        dx = p + bx * s - q
                        if 0 <= dx <= 2:
                            cols.append(wf[dy, dx, ch * cc:(ch + 1) * cc])
                        else:
                            cols.append(zero)
                    rows.append(jnp.concatenate(cols, axis=1))
                ss.append(jnp.concatenate(rows, axis=0))
            dys.append(jnp.stack(ss))
        chunks.append(jnp.stack(dys))
    return jnp.stack(chunks)


def _kernel(n_chunks, n_s, wpb, th_blocks, relu, out_dtype,
            cur_ref, halo_ref, w_ref, scale_ref, shift_ref, out_ref,
            acc_ref):
    # cur: (1, th_blocks, 128); halo: (1, 4*wpb, 128);
    # w: (1, 3, n_s, 128, bx*Cout); out: (1, th_blocks, bx*Cout)
    # wpb is a multiple of the sublane tile, so all dy*wpb slices of `flat`
    # are free aligned views; the +s block-row misalignments are realized
    # ONCE as whole-buffer shifted copies (`shifted[s]`), not per-matmul.
    c = pl.program_id(2)
    flat = jnp.concatenate([cur_ref[0, 0], halo_ref[0, 0]], axis=0)
    span = th_blocks + 2 * wpb + n_s  # rows any (dy, s) slice can touch
    shifted = [flat]
    for s in range(1, n_s):
        shifted.append(flat[s:s + span])

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for dy in range(3):
        base = dy * wpb
        for s in range(n_s):
            lhs = shifted[s][base:base + th_blocks]
            acc_ref[:] = acc_ref[:] + jnp.dot(
                lhs, w_ref[0, dy, s], preferred_element_type=jnp.float32)

    @pl.when(c == n_chunks - 1)
    def _():
        res = acc_ref[:] * scale_ref[0] + shift_ref[0]
        if relu:
            res = jnp.maximum(res, 0.0)
        out_ref[0] = res.astype(out_dtype)


def conv3x3_blocked(x: jnp.ndarray, w: jnp.ndarray,
                    scale: jnp.ndarray | None = None,
                    shift: jnp.ndarray | None = None,
                    relu: bool = False,
                    tile_h: int = 16,
                    interpret: bool = False) -> jnp.ndarray:
    """SAME stride-1 3x3 conv: x (B,H,W,Cin), w (3,3,Cin,Cout) -> NHWC out.

    y = conv(x) * scale + shift (then ReLU if requested); scale/shift fold
    bias + inference BatchNorm. tile_h must be a multiple of 4.
    """
    assert tile_h % 4 == 0
    b, h, wd, cin = x.shape
    cout = w.shape[3]
    cc = _chunk_size(cin, cout)
    bx = 128 // cc
    cin_p = _round_up(cin, cc)
    n_chunks = cin_p // cc

    if scale is None:
        scale = jnp.ones((cout,), jnp.float32)
    if shift is None:
        shift = jnp.zeros((cout,), jnp.float32)
    scale_t = jnp.tile(scale.astype(jnp.float32), bx).reshape(1, bx * cout)
    shift_t = jnp.tile(shift.astype(jnp.float32), bx).reshape(1, bx * cout)

    # x padding: 1 col left (+ right up to a multiple of 16*bx so image rows
    # are an exact number of SUBLANE-TILE-aligned block rows: dy*wpb slices
    # in the kernel are then free views), 1 row top, bottom slack for halo
    wp = _round_up(wd + 2, 16 * bx)
    wpb = wp // bx  # block-rows per image row... (bx pixels per block-row)
    n_tiles = -(-h // tile_h)
    hp = (n_tiles + 1) * tile_h  # one tile of bottom slack covers the halo
    xp = jnp.pad(x, ((0, 0), (1, hp - h - 1), (1, wp - wd - 1),
                     (0, cin_p - cin)))
    # (B, hp, wp, cin_p) -> blocked view (B, n_chunks interleave?): chunks
    # are channel slices; keep chunks as a leading dim of the lane axis by
    # splitting channels then blocking pixels per chunk.
    if n_chunks > 1:
        xp = xp.reshape(b, hp * wp, n_chunks, cc).transpose(0, 2, 1, 3)
        xflat = xp.reshape(b, n_chunks, hp * wp // bx, 128)
    else:
        xflat = xp.reshape(b, 1, hp * wp // bx, 128)

    wpk = pack_weights_blocked(w, cc).astype(x.dtype)

    n_s = 3 if bx == 1 else 2
    th_blocks = tile_h * wpb
    kern = functools.partial(_kernel, n_chunks, n_s, wpb, th_blocks, relu,
                             x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, th_blocks, 128),
                         lambda bi, i, c: (bi, c, i, 0),
                         memory_space=pltpu.VMEM),
            # halo: 4 image rows starting right after the tile
            pl.BlockSpec((1, 1, 4 * wpb, 128),
                         lambda bi, i, c: (bi, c, (i + 1) * (tile_h // 4), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_s, 128, bx * cout),
                         lambda bi, i, c: (c, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bx * cout), lambda bi, i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bx * cout), lambda bi, i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th_blocks, bx * cout),
                               lambda bi, i, c: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * th_blocks, bx * cout),
                                       x.dtype),
        scratch_shapes=[pltpu.VMEM((th_blocks, bx * cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xflat, xflat, wpk, scale_t, shift_t)
    # (B, R8, bx*Cout) -> (B, R8*bx, Cout) is a free reshape (pixel-major)
    out = out.reshape(b, n_tiles * tile_h, wp, cout)
    return out[:, :h, :wd, :]


# --------------------------------------------------------------------------
# Chained form: blocked layout carried END-TO-END through a conv stack
# (VERDICT r3 #5 / docs/PERF.md "the next lever"). One NHWC->blocked ingest,
# k convs that stay in the padded blocked stream, one egress. Each conv
# shifts the image up-left by one pixel inside the padded canvas (the same
# alignment the single-shot kernel uses before its crop); the epilogue
# re-zeroes everything outside the shifted image so the output is directly
# the next conv's zero-padded input. Restricted to C->C convs with
# C in {16, 32, 64, 128} (one channel chunk) — the s2d stage case
# (272^2 x C64) this lever targets.
# --------------------------------------------------------------------------


def _kernel_chain(wpb, th_blocks, n_s, bx, cc, oy, ox, h, wd, relu,
                  out_dtype, cur_ref, halo_ref, w_ref, scale_ref, shift_ref,
                  out_ref):
    i = pl.program_id(1)
    flat = jnp.concatenate([cur_ref[0, 0], halo_ref[0, 0]], axis=0)
    span = th_blocks + 2 * wpb + n_s
    shifted = [flat]
    for s in range(1, n_s):
        shifted.append(flat[s:s + span])

    acc = jnp.zeros((th_blocks, out_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        base = dy * wpb
        for s in range(n_s):
            lhs = shifted[s][base:base + th_blocks]
            acc = acc + jnp.dot(lhs, w_ref[0, dy, s],
                                preferred_element_type=jnp.float32)

    res = acc * scale_ref[0] + shift_ref[0]
    if relu:
        res = jnp.maximum(res, 0.0)
    # mask: the output image sits at rows [oy, oy+h) x cols [ox, ox+wd) of
    # the padded canvas; everything else (incl. the garbage the last grid
    # tile computes from uncovered slack rows) must be EXACTLY zero so the
    # result chains as the next conv's zero-padded input.
    row = i * th_blocks + jax.lax.broadcasted_iota(jnp.int32,
                                                   (th_blocks, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (th_blocks, 128), 1)
    y_p = row // wpb
    px = (row % wpb) * bx + lane // cc
    valid = ((y_p >= oy) & (y_p < oy + h) & (px >= ox) & (px < ox + wd))
    out_ref[0] = jnp.where(valid, res, 0.0).astype(out_dtype)


class BlockedGeom:
    """Static geometry of a padded blocked pixel stream."""

    def __init__(self, b, h, wd, cc, top, left, tile_h):
        bx = 128 // cc
        self.b, self.h, self.wd, self.cc, self.bx = b, h, wd, cc, bx
        self.top, self.left, self.tile_h = top, left, tile_h
        self.wp = _round_up(wd + left + 2, 16 * bx)
        self.hp = _round_up(top + h + 2, tile_h) + tile_h
        self.alloc = self.hp + tile_h  # slack tile: halo reads stay in-bounds
        self.wpb = self.wp // bx
        self.th_blocks = tile_h * self.wpb
        self.n_tiles = self.hp // tile_h


def blocked_ingest(x: jnp.ndarray, top: int, left: int,
                   tile_h: int = 16) -> tuple[jnp.ndarray, BlockedGeom]:
    """(B, H, W, C) NHWC -> padded blocked stream (B, 1, R, 128) with the
    image at rows [top, top+H) x cols [left, left+W); zeros elsewhere."""
    b, h, wd, c = x.shape
    g = BlockedGeom(b, h, wd, c, top, left, tile_h)
    xp = jnp.pad(x, ((0, 0), (top, g.alloc - top - h),
                     (left, g.wp - left - wd), (0, 0)))
    return xp.reshape(b, 1, g.alloc * g.wpb, 128), g


def conv3x3_blocked_flat(xflat: jnp.ndarray, w: jnp.ndarray,
                         g: BlockedGeom, oy: int, ox: int,
                         scale: jnp.ndarray | None = None,
                         shift: jnp.ndarray | None = None,
                         relu: bool = False,
                         interpret: bool = False) -> jnp.ndarray:
    """One SAME 3x3 conv on a padded blocked stream whose image sits at
    (oy, ox); returns the same-shape stream with the image at (oy-1, ox-1).
    Requires Cout == Cin == g.cc (so the output IS the next conv's input)."""
    cc, bx, wpb, th_blocks = g.cc, g.bx, g.wpb, g.th_blocks
    cout = w.shape[3]
    assert w.shape[2] == cc and cout == cc, "chain form needs C->C convs"
    assert oy >= 1 and ox >= 1, "image must keep a zero border to shift into"
    n_s = 3 if bx == 1 else 2
    if scale is None:
        scale = jnp.ones((cout,), jnp.float32)
    if shift is None:
        shift = jnp.zeros((cout,), jnp.float32)
    scale_t = jnp.tile(scale.astype(jnp.float32), bx).reshape(1, bx * cout)
    shift_t = jnp.tile(shift.astype(jnp.float32), bx).reshape(1, bx * cout)
    wpk = pack_weights_blocked(w, cc).astype(xflat.dtype)

    kern = functools.partial(_kernel_chain, wpb, th_blocks, n_s, bx, cc,
                             oy - 1, ox - 1, g.h, g.wd, relu, xflat.dtype)
    out = pl.pallas_call(
        kern,
        grid=(g.b, g.n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, th_blocks, 128),
                         lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4 * wpb, 128),
                         lambda bi, i: (bi, 0, (i + 1) * (g.tile_h // 4), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_s, 128, bx * cout),
                         lambda bi, i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bx * cout), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bx * cout), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th_blocks, 128),
                               lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g.b, g.alloc * wpb, 128),
                                       xflat.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xflat, xflat, wpk, scale_t, shift_t)
    return out[:, None]


def blocked_egress(yflat: jnp.ndarray, g: BlockedGeom, oy: int,
                   ox: int) -> jnp.ndarray:
    """Padded blocked stream -> NHWC image at (oy, ox)."""
    y = yflat.reshape(g.b, g.alloc, g.wp, g.cc)
    return y[:, oy:oy + g.h, ox:ox + g.wd, :]


def conv3x3_blocked_chain(x: jnp.ndarray, weights, scales=None, shifts=None,
                          relu: bool = True, tile_h: int = 16,
                          interpret: bool = False) -> jnp.ndarray:
    """k chained SAME 3x3 C->C convs (each + scale/shift + optional ReLU)
    paying ONE blocked ingest + ONE egress. x: (B, H, W, C), C in
    {16, 32, 64, 128}; weights: list of (3, 3, C, C)."""
    k = len(weights)
    scales = scales if scales is not None else [None] * k
    shifts = shifts if shifts is not None else [None] * k
    xflat, g = blocked_ingest(x, top=tile_h, left=k + 1, tile_h=tile_h)
    oy, ox = tile_h, k + 1
    for w, sc, sh in zip(weights, scales, shifts):
        xflat = conv3x3_blocked_flat(xflat, w, g, oy, ox, sc, sh, relu,
                                     interpret=interpret)
        oy, ox = oy - 1, ox - 1
    return blocked_egress(xflat[:, 0], g, oy, ox)
