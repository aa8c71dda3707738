"""Fused Pallas TPU kernel: embedding -> multi-offset affinities.

Replaces the reference's per-offset roll+multiply+reduce chain
(scripts_cvppp/loss/loss_embedding_mse.py:7-16: ~2 full-tensor reads and one
write per offset, x10 offsets) with ONE pass over the embedding that emits all
K offset channels, with L2 normalization fused in. The op is HBM-bandwidth
bound, so fusing K channels into one read is the dominant win.

Design:
* Kernel layout is (B, C, H, W) so the last two dims (H, W) map onto TPU
  (sublane, lane) tiles. The public wrapper takes channels-last (B, H, W, C)
  embeddings (what the Flax models emit) and emits (B, K, H, W) affinities.
* Grid = (B, H/TILE_H). Each step reads its row-block plus the PREVIOUS
  row-block (offsets look upward: neighbor of row y is y - s), giving a halo
  without overlapping BlockSpecs.
* Valid-padding semantics (affinity 0 where the neighbor is out of bounds)
  fall out of zero padding: the wrapper pads TOP rows with `halo` zero rows
  and right/bottom up to tile multiples; zero embeddings normalize to zero
  vectors, so dots against the pad are exactly 0.
* Backward pass: hand-written fused bwd kernel (one pass over g + embedding
  per tile, all K offsets). For affinity a_k(p) = <n(p), n(p+o_k)> the
  embedding gradient is
      dn(p) = sum_k [ g_k(p) * n(p+o_k) + g_k(p-o_k) * n(p-o_k) ]
      de    = (dn - n * <n, dn>) / max(||e||, eps)
  The kernel reads prev/cur/next row-tiles of n (term 1 looks up, term 2
  looks down) and cur/next row-tiles of g, and emits de directly. Verified
  for exact parity against jax.vjp through the jnp oracle
  (tests/test_emb2aff_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .emb2aff import embedding_to_affinity_2d, embedding_to_affinity_3d

# Scoped-VMEM budget granted to each Mosaic kernel. This is not just a
# cap on the kernel: XLA's allocator treats it as RESERVED around the
# custom call, so an oversized value evicts the surrounding program's
# VMEM-resident intermediates (measured: the B=1 544^2 serving graph
# loses ~3.7 ms with 100 MB here — docs/profile_b1_fix.py / PERF.md r5).
# 100 MB is needed only by the fat f32 train-path tiles; override for
# experiments via PEA_PALLAS_VMEM_MB.
import os as _os

_VMEM_LIMIT = int(_os.environ.get("PEA_PALLAS_VMEM_MB", "100")) * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _normalize(e, eps=1e-12):
    # e: (C, TH, W); normalize over C (torch.nn.functional.normalize
    # semantics; grad-safe at zero vectors like ops.emb2aff)
    norm = jnp.sqrt(jnp.sum(e * e, axis=0, keepdims=True) + 1e-36)
    return e / jnp.maximum(norm, eps)


def _affinity_kernel(offsets, normalized, cur_ref, prev_ref, out_ref):
    # blocks: cur/prev (1, C, TH, W), out (1, K, TH, W). Compute is f32
    # regardless of the storage dtype (bf16 inputs halve HBM traffic; the
    # normalize/dot runs in registers).
    cur = cur_ref[0].astype(jnp.float32)
    prev = prev_ref[0].astype(jnp.float32)
    if not normalized:
        cur = _normalize(cur)
        prev = _normalize(prev)
    th = cur.shape[1]
    w = cur.shape[2]
    for k, (oy, ox) in enumerate(offsets):
        sy = -oy  # offsets look upward / leftward: oy <= 0 -> sy >= 0
        assert 0 <= sy <= th, "row shift must fit in one tile"
        # rows of the neighbor map: value at row r is N[r - sy]
        if sy == 0:
            rows = cur
        else:
            rows = jnp.concatenate([prev[:, th - sy:, :], cur[:, : th - sy, :]],
                                   axis=1)
        if ox < 0:
            s = -ox
            zeros = jnp.zeros((rows.shape[0], th, s), rows.dtype)
            shifted = jnp.concatenate([zeros, rows[:, :, : w - s]], axis=2)
        elif ox > 0:
            zeros = jnp.zeros((rows.shape[0], th, ox), rows.dtype)
            shifted = jnp.concatenate([rows[:, :, ox:], zeros], axis=2)
        else:
            shifted = rows
        out_ref[0, k] = jnp.sum(cur * shifted, axis=0).astype(out_ref.dtype)


def _fused_affinity_2d_fwd_impl(embedding_bhwc: jnp.ndarray,
                                offsets,
                                normalized: bool,
                                tile_h: int,
                                interpret: bool) -> jnp.ndarray:
    b, h, w, c = embedding_bhwc.shape
    max_sy = max(-int(o[0]) for o in offsets)
    max_sx = max(abs(int(o[1])) for o in offsets)
    assert max_sy >= 0
    assert tile_h >= max_sy, "tile_h must cover the largest row shift"

    e = jnp.transpose(embedding_bhwc, (0, 3, 1, 2))  # (B, C, H, W)
    # top halo pad + tile alignment; zero pad == valid-affinity semantics
    h_pad = tile_h + _round_up(h, tile_h) - h  # one full tile of top halo
    w_pad = _round_up(max(w, 128), 128) - w
    e = jnp.pad(e, ((0, 0), (0, 0), (tile_h, h_pad - tile_h), (0, w_pad)))
    hp = e.shape[2]
    wp = e.shape[3]
    n_tiles = hp // tile_h
    k = len(offsets)

    kernel = functools.partial(_affinity_kernel, tuple(map(tuple, offsets)),
                               normalized)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tile_h, wp),
                         lambda bi, i: (bi, 0, jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, hp, wp), embedding_bhwc.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(e, e)
    return out[:, :, tile_h:tile_h + h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_affinity_2d(embedding_bhwc: jnp.ndarray,
                      offsets,
                      tile_h: int = 32,
                      interpret: bool = False) -> jnp.ndarray:
    """(B, H, W, C) embedding -> (B, K, H, W) affinities (valid padding).

    Equivalent to ``embedding_to_affinity_2d(e, offsets, padding='valid')``
    (up to the torch.roll wraparound band, which the loss masks and the
    decoders never read), but one fused pass on TPU.
    """
    return _fused_affinity_2d_fwd_impl(embedding_bhwc, tuple(map(tuple, offsets)),
                                       False, tile_h, interpret)


def _fused_affinity_2d_fwd(embedding_bhwc, offsets, tile_h, interpret):
    out = _fused_affinity_2d_fwd_impl(embedding_bhwc, offsets, False,
                                      tile_h, interpret)
    return out, embedding_bhwc


# -- fused backward kernel helpers -------------------------------------------

def _rows_up(cur, prev, sy):
    """value at row r is src[r - sy]; first sy rows come from the prev tile."""
    if sy == 0:
        return cur
    th = cur.shape[-2]
    return jnp.concatenate([prev[..., th - sy:, :], cur[..., : th - sy, :]],
                           axis=-2)


def _rows_down(cur, nxt, sy):
    """value at row r is src[r + sy]; last sy rows come from the next tile."""
    if sy == 0:
        return cur
    return jnp.concatenate([cur[..., sy:, :], nxt[..., :sy, :]], axis=-2)


def _cols(x, s):
    """value at col c is src[c - s]; zero fill (valid-padding semantics)."""
    if s == 0:
        return x
    w = x.shape[-1]
    z = jnp.zeros(x.shape[:-1] + (abs(s),), x.dtype)
    if s > 0:
        return jnp.concatenate([z, x[..., : w - s]], axis=-1)
    return jnp.concatenate([x[..., -s:], z], axis=-1)


def _normalize_vjp(e, n, dn, eps=1e-12):
    """VJP of n = e / max(sqrt(sum(e^2) + 1e-36), eps) over axis 0 —
    bit-matches jax.vjp through normalize_embedding (the >= eps branch
    carries the maximum's subgradient exactly like jnp.maximum)."""
    norm = jnp.sqrt(jnp.sum(e * e, axis=0, keepdims=True) + 1e-36)
    m = jnp.maximum(norm, eps)
    ndot = jnp.sum(n * dn, axis=0, keepdims=True)
    proj = jnp.where(norm >= eps, ndot, jnp.zeros_like(ndot))
    return (dn - n * proj) / m


def _affinity_bwd_kernel(offsets, normalized,
                         e_prev_ref, e_cur_ref, e_next_ref,
                         g_cur_ref, g_next_ref, out_ref):
    """One pass emitting the embedding gradient for all K offsets.

    dn(p) = sum_k [ g_k(p) * n(p+o_k) + g_k(p-o_k) * n(p-o_k) ];
    with ``normalized`` the inputs are already unit vectors and dn is
    emitted raw (the caller applies the normalization VJP); otherwise the
    kernel normalizes in-tile and emits de directly.
    """
    e_cur = e_cur_ref[0]
    if normalized:
        n_prev, n_cur, n_next = e_prev_ref[0], e_cur, e_next_ref[0]
    else:
        n_prev = _normalize(e_prev_ref[0])
        n_cur = _normalize(e_cur)
        n_next = _normalize(e_next_ref[0])
    g_cur = g_cur_ref[0]
    g_next = g_next_ref[0]
    dn = jnp.zeros_like(n_cur)
    for k, (oy, ox) in enumerate(offsets):
        sy = -oy
        # term 1: g_k(p) * n(p + o_k)   (neighbor up/left)
        nb = _cols(_rows_up(n_cur, n_prev, sy), -ox)
        dn = dn + g_cur[k][None] * nb
        # term 2: g_k(p - o_k) * n(p - o_k)   (down/right)
        gd = _cols(_rows_down(g_cur[k], g_next[k], sy), ox)
        nd = _cols(_rows_down(n_cur, n_next, sy), ox)
        dn = dn + gd[None] * nd
    if normalized:
        out_ref[0] = dn
    else:
        out_ref[0] = _normalize_vjp(e_cur, n_cur, dn)


def _fused_affinity_2d_bwd_impl(e_bhwc, g_bkhw, offsets, normalized,
                                tile_h, interpret):
    b, h, w, c = e_bhwc.shape
    k = len(offsets)
    max_sy = max(-int(o[0]) for o in offsets)
    assert tile_h >= max_sy >= 0
    e = jnp.transpose(e_bhwc, (0, 3, 1, 2))
    h_aligned = _round_up(h, tile_h)
    w_pad = _round_up(max(w, 128), 128) - w
    # one full halo tile above AND below (term 1 looks up, term 2 down)
    pads = ((0, 0), (0, 0), (tile_h, h_aligned - h + tile_h), (0, w_pad))
    e = jnp.pad(e, pads)
    g = jnp.pad(g_bkhw.astype(e.dtype), pads[:2] + pads[2:])
    hp, wp = e.shape[2], e.shape[3]
    n_tiles = h_aligned // tile_h

    kern = functools.partial(_affinity_bwd_kernel,
                             tuple(map(tuple, offsets)), normalized)
    vm = pltpu.VMEM
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=vm),
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i + 1, 0),
                         memory_space=vm),
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i + 2, 0),
                         memory_space=vm),
            pl.BlockSpec((1, k, tile_h, wp), lambda bi, i: (bi, 0, i + 1, 0),
                         memory_space=vm),
            pl.BlockSpec((1, k, tile_h, wp), lambda bi, i: (bi, 0, i + 2, 0),
                         memory_space=vm),
        ],
        out_specs=pl.BlockSpec((1, c, tile_h, wp),
                               lambda bi, i: (bi, 0, i + 1, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), e.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(e, e, e, g, g)
    de = out[:, :, tile_h:tile_h + h, :w]
    return jnp.transpose(de, (0, 2, 3, 1))


def _fused_affinity_2d_bwd(offsets, tile_h, interpret, residual, g):
    return (_fused_affinity_2d_bwd_impl(residual, g,
                                        tuple(map(tuple, offsets)), False,
                                        tile_h, interpret),)


fused_affinity_2d.defvjp(_fused_affinity_2d_fwd, _fused_affinity_2d_bwd)


# ---------------------------------------------------------------------------
# Cross-view variant: dot the STUDENT embedding against the offset-shifted
# TEACHER embedding (EMA consistency loss). Same tiling; the student tile
# needs no halo, the teacher provides cur+prev blocks.
# ---------------------------------------------------------------------------

def _cross_affinity_kernel(offsets, a_ref, b_cur_ref, b_prev_ref, out_ref):
    a = _normalize(a_ref[0].astype(jnp.float32))
    b_cur = _normalize(b_cur_ref[0].astype(jnp.float32))
    b_prev = _normalize(b_prev_ref[0].astype(jnp.float32))
    th = a.shape[1]
    w = a.shape[2]
    for k, (oy, ox) in enumerate(offsets):
        sy = -oy
        if sy == 0:
            rows = b_cur
        else:
            rows = jnp.concatenate(
                [b_prev[:, th - sy:, :], b_cur[:, : th - sy, :]], axis=1)
        if ox < 0:
            s = -ox
            zeros = jnp.zeros((rows.shape[0], th, s), rows.dtype)
            shifted = jnp.concatenate([zeros, rows[:, :, : w - s]], axis=2)
        elif ox > 0:
            zeros = jnp.zeros((rows.shape[0], th, ox), rows.dtype)
            shifted = jnp.concatenate([rows[:, :, ox:], zeros], axis=2)
        else:
            shifted = rows
        out_ref[0, k] = jnp.sum(a * shifted, axis=0).astype(out_ref.dtype)


def _fused_cross_affinity_2d_impl(a_bhwc, b_bhwc, offsets, tile_h, interpret):
    b, h, w, c = a_bhwc.shape
    max_sy = max(-int(o[0]) for o in offsets)
    assert tile_h >= max_sy >= 0

    at = jnp.transpose(a_bhwc, (0, 3, 1, 2))
    bt = jnp.transpose(b_bhwc, (0, 3, 1, 2))
    h_pad = tile_h + _round_up(h, tile_h) - h
    w_pad = _round_up(max(w, 128), 128) - w
    pads = ((0, 0), (0, 0), (tile_h, h_pad - tile_h), (0, w_pad))
    at = jnp.pad(at, pads)
    bt = jnp.pad(bt, pads)
    hp, wp = at.shape[2], at.shape[3]
    n_tiles = hp // tile_h
    k = len(offsets)

    kernel = functools.partial(_cross_affinity_kernel,
                               tuple(map(tuple, offsets)))
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, tile_h, wp),
                         lambda bi, i: (bi, 0, jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, hp, wp), a_bhwc.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(at, bt, bt)
    return out[:, :, tile_h:tile_h + h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_cross_affinity_2d(a_bhwc, b_bhwc, offsets, tile_h: int = 32,
                            interpret: bool = False):
    """(student, teacher) (B,H,W,C) -> (B,K,H,W) cross affinities (valid)."""
    return _fused_cross_affinity_2d_impl(a_bhwc, b_bhwc,
                                         tuple(map(tuple, offsets)),
                                         tile_h, interpret)


def _fused_cross_fwd(a, b, offsets, tile_h, interpret):
    return _fused_cross_affinity_2d_impl(a, b, offsets, tile_h, interpret), (a, b)


def _cross_bwd_kernel(offsets, normalized,
                      a_cur_ref, a_next_ref, b_prev_ref, b_cur_ref,
                      g_cur_ref, g_next_ref, da_ref, db_ref):
    """Cross-affinity gradients for both views in one pass:
    dna(p) = sum_k g_k(p) * nb(p+o_k);  dnb(p) = sum_k g_k(p-o_k) * na(p-o_k).
    With ``normalized`` the inputs are unit vectors and dn is emitted raw
    (the caller applies the normalization VJP)."""
    a_cur = a_cur_ref[0]
    b_cur = b_cur_ref[0]
    if normalized:
        na_cur, na_next = a_cur, a_next_ref[0]
        nb_cur, nb_prev = b_cur, b_prev_ref[0]
    else:
        na_cur = _normalize(a_cur)
        na_next = _normalize(a_next_ref[0])
        nb_cur = _normalize(b_cur)
        nb_prev = _normalize(b_prev_ref[0])
    g_cur = g_cur_ref[0]
    g_next = g_next_ref[0]
    dna = jnp.zeros_like(na_cur)
    dnb = jnp.zeros_like(nb_cur)
    for k, (oy, ox) in enumerate(offsets):
        sy = -oy
        nb_sh = _cols(_rows_up(nb_cur, nb_prev, sy), -ox)
        dna = dna + g_cur[k][None] * nb_sh
        gd = _cols(_rows_down(g_cur[k], g_next[k], sy), ox)
        na_d = _cols(_rows_down(na_cur, na_next, sy), ox)
        dnb = dnb + gd[None] * na_d
    if normalized:
        da_ref[0] = dna
        db_ref[0] = dnb
    else:
        da_ref[0] = _normalize_vjp(a_cur, na_cur, dna)
        db_ref[0] = _normalize_vjp(b_cur, nb_cur, dnb)


def _fused_cross_bwd_impl(a_bhwc, b_bhwc, g_bkhw, offsets, tile_h, interpret,
                          normalized=False):
    b, h, w, c = a_bhwc.shape
    k = len(offsets)
    max_sy = max(-int(o[0]) for o in offsets)
    assert tile_h >= max_sy >= 0
    at = jnp.transpose(a_bhwc, (0, 3, 1, 2))
    bt = jnp.transpose(b_bhwc, (0, 3, 1, 2))
    h_aligned = _round_up(h, tile_h)
    w_pad = _round_up(max(w, 128), 128) - w
    pads = ((0, 0), (0, 0), (tile_h, h_aligned - h + tile_h), (0, w_pad))
    at = jnp.pad(at, pads)
    bt = jnp.pad(bt, pads)
    g = jnp.pad(g_bkhw.astype(at.dtype), pads)
    hp, wp = at.shape[2], at.shape[3]
    n_tiles = h_aligned // tile_h

    kern = functools.partial(_cross_bwd_kernel, tuple(map(tuple, offsets)),
                             normalized)
    vm = pltpu.VMEM
    da, db = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i + 1, 0),
                         memory_space=vm),   # a cur
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i + 2, 0),
                         memory_space=vm),   # a next
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=vm),   # b prev
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i + 1, 0),
                         memory_space=vm),   # b cur
            pl.BlockSpec((1, k, tile_h, wp), lambda bi, i: (bi, 0, i + 1, 0),
                         memory_space=vm),   # g cur
            pl.BlockSpec((1, k, tile_h, wp), lambda bi, i: (bi, 0, i + 2, 0),
                         memory_space=vm),   # g next
        ],
        out_specs=(
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i + 1, 0),
                         memory_space=vm),
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i + 1, 0),
                         memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, hp, wp), at.dtype),
            jax.ShapeDtypeStruct((b, c, hp, wp), at.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(at, at, bt, bt, g, g)
    da = jnp.transpose(da[:, :, tile_h:tile_h + h, :w], (0, 2, 3, 1))
    db = jnp.transpose(db[:, :, tile_h:tile_h + h, :w], (0, 2, 3, 1))
    return da, db


def _fused_cross_bwd(offsets, tile_h, interpret, res, g):
    a, b = res
    return _fused_cross_bwd_impl(a, b, g, tuple(map(tuple, offsets)),
                                 tile_h, interpret)


fused_cross_affinity_2d.defvjp(_fused_cross_fwd, _fused_cross_bwd)


# ---------------------------------------------------------------------------
# 3D: ONE kernel pass per (slab, row-tile) emits all K channels — the xy
# shifts read the current slab (+ prev row-tile halo), the z shifts read the
# z-s neighbor slabs directly (zero-padded at the volume front, so the
# out-of-bounds slab is exactly 0). Replaces the r1 composite (2D kernel for
# xy + XLA slicing for z) with a single fused pass: ~1.7x less HBM traffic
# and no materialized normalized volume.
# ---------------------------------------------------------------------------

def _affinity_3d_kernel(xy_list, z_list, n_z_refs, *refs):
    # refs: e_cur, e_prev_row, one per unique z shift, out
    e_cur_ref, e_prev_ref = refs[0], refs[1]
    z_refs = refs[2:2 + n_z_refs]
    out_ref = refs[2 + n_z_refs]
    cur = _normalize(e_cur_ref[0, :, 0].astype(jnp.float32))
    prev = _normalize(e_prev_ref[0, :, 0].astype(jnp.float32))
    for (oy, ox), oi in xy_list:
        sy = -oy
        shifted = _cols(_rows_up(cur, prev, sy), -ox)
        out_ref[0, oi, 0] = jnp.sum(cur * shifted, axis=0).astype(out_ref.dtype)
    for ri, oi in z_list:
        nz = _normalize(z_refs[ri][0, :, 0].astype(jnp.float32))
        out_ref[0, oi, 0] = jnp.sum(cur * nz, axis=0).astype(out_ref.dtype)


def _fused_affinity_3d_impl(embedding_bdhwc, shifts, tile_h, interpret):
    b, d, h, w, c = embedding_bdhwc.shape
    xy_list, z_list, uniq = [], [], []
    for i, s in enumerate(shifts):
        ax = i % 3
        if ax == 0:
            s = int(s)
            if s not in uniq:
                uniq.append(s)
            z_list.append((uniq.index(s), i))
        elif ax == 1:
            xy_list.append(((-int(s), 0), i))
        else:
            xy_list.append(((0, -int(s)), i))
    max_sy = max((-o[0] for (o, _) in xy_list), default=0)
    assert tile_h >= max_sy >= 0
    max_sz = max(uniq) if uniq else 0

    e = jnp.transpose(embedding_bdhwc, (0, 4, 1, 2, 3))  # (B, C, D, H, W)
    h_pad = tile_h + _round_up(h, tile_h) - h
    w_pad = _round_up(max(w, 128), 128) - w
    e = jnp.pad(e, ((0, 0), (0, 0), (max_sz, 0),
                    (tile_h, h_pad - tile_h), (0, w_pad)))
    hp, wp = e.shape[3], e.shape[4]
    n_tiles = hp // tile_h
    k = len(shifts)
    vm = pltpu.VMEM

    kern = functools.partial(_affinity_3d_kernel, tuple(xy_list),
                             tuple(z_list), len(uniq))
    blk = (1, c, 1, tile_h, wp)
    in_specs = [
        pl.BlockSpec(blk, lambda bi, zi, i, m=max_sz: (bi, 0, zi + m, i, 0),
                     memory_space=vm),
        pl.BlockSpec(blk, lambda bi, zi, i, m=max_sz:
                     (bi, 0, zi + m, jnp.maximum(i - 1, 0), 0),
                     memory_space=vm),
    ]
    for s in uniq:
        in_specs.append(pl.BlockSpec(
            blk, lambda bi, zi, i, s=s, m=max_sz: (bi, 0, zi + m - s, i, 0),
            memory_space=vm))
    out = pl.pallas_call(
        kern,
        grid=(b, d, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, k, 1, tile_h, wp),
                               lambda bi, zi, i: (bi, 0, zi, i, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((b, k, d, hp, wp),
                                       embedding_bdhwc.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*([e] * (2 + len(uniq))))
    return out[:, :, :, tile_h:tile_h + h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_affinity_3d(embedding_bdhwc: jnp.ndarray,
                      shifts=(1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27),
                      tile_h: int = 32,
                      interpret: bool = False) -> jnp.ndarray:
    """(B, D, H, W, C) embedding -> (B, K, D, H, W), norm5 semantics."""
    return _fused_affinity_3d_impl(embedding_bdhwc, tuple(shifts), tile_h,
                                   interpret)


def _fused_affinity_3d_fwd(embedding_bdhwc, shifts, tile_h, interpret):
    return (_fused_affinity_3d_impl(embedding_bdhwc, shifts, tile_h, interpret),
            embedding_bdhwc)


def _fused_affinity_3d_bwd(shifts, tile_h, interpret, residual, g):
    """Fused 3D backward: xy-channel gradients through the Pallas bwd kernel
    (normalized=True -> emits dn), z-channel gradients as slab updates, then
    one normalization VJP (exact oracle parity)."""
    from .emb2aff import normalize_embedding

    e = residual
    b, d, h, w, c = e.shape
    n, nvjp = jax.vjp(lambda x: normalize_embedding(x, axis=-1), e)

    xy_offsets, xy_idx, z_shifts, z_idx = [], [], [], []
    for i, s in enumerate(shifts):
        ax = i % 3
        if ax == 0:
            z_shifts.append(int(s))
            z_idx.append(i)
        elif ax == 1:
            xy_offsets.append((-int(s), 0))
            xy_idx.append(i)
        else:
            xy_offsets.append((0, -int(s)))
            xy_idx.append(i)

    dn = jnp.zeros_like(n)
    if xy_offsets:
        # g[:, xy_idx]: (B, Kxy, D, H, W) -> (B*D, Kxy, H, W)
        g_xy = jnp.moveaxis(g[:, jnp.asarray(xy_idx)], 1, 2)
        g_xy = g_xy.reshape(b * d, len(xy_offsets), h, w)
        dn_flat = _fused_affinity_2d_bwd_impl(
            n.reshape(b * d, h, w, c), g_xy, tuple(xy_offsets), True,
            tile_h, interpret)
        dn = dn + dn_flat.reshape(b, d, h, w, c)
    for s, i in zip(z_shifts, z_idx):
        gi = g[:, i, s:, :, :, None]  # fwd zero-padded the first s slabs
        dn = dn.at[:, s:].add(gi * n[:, : d - s])
        dn = dn.at[:, : d - s].add(gi * n[:, s:])
    return (nvjp(dn)[0],)


fused_affinity_3d.defvjp(_fused_affinity_3d_fwd, _fused_affinity_3d_bwd)


# ---------------------------------------------------------------------------
# 3D cross-view (EMA) affinities: student dotted against the shifted TEACHER
# embedding, one kernel pass for all K channels (the AC3/AC4 cross loss,
# reference ema_embedding_loss_norm5, loss_embedding_mse.py:263-289).
# ---------------------------------------------------------------------------

def _cross_affinity_3d_kernel(xy_list, z_list, n_z_refs, *refs):
    a_ref, b_cur_ref, b_prev_ref = refs[0], refs[1], refs[2]
    z_refs = refs[3:3 + n_z_refs]
    out_ref = refs[3 + n_z_refs]
    na = _normalize(a_ref[0, :, 0].astype(jnp.float32))
    nb_cur = _normalize(b_cur_ref[0, :, 0].astype(jnp.float32))
    nb_prev = _normalize(b_prev_ref[0, :, 0].astype(jnp.float32))
    for (oy, ox), oi in xy_list:
        sy = -oy
        shifted = _cols(_rows_up(nb_cur, nb_prev, sy), -ox)
        out_ref[0, oi, 0] = jnp.sum(na * shifted, axis=0).astype(out_ref.dtype)
    for ri, oi in z_list:
        nz = _normalize(z_refs[ri][0, :, 0].astype(jnp.float32))
        out_ref[0, oi, 0] = jnp.sum(na * nz, axis=0).astype(out_ref.dtype)


def _split_shifts(shifts):
    xy_list, z_list, uniq = [], [], []
    for i, s in enumerate(shifts):
        ax = i % 3
        if ax == 0:
            s = int(s)
            if s not in uniq:
                uniq.append(s)
            z_list.append((uniq.index(s), i))
        elif ax == 1:
            xy_list.append(((-int(s), 0), i))
        else:
            xy_list.append(((0, -int(s)), i))
    return xy_list, z_list, uniq


def _fused_cross_affinity_3d_impl(a_bdhwc, b_bdhwc, shifts, tile_h,
                                  interpret):
    b, d, h, w, c = a_bdhwc.shape
    xy_list, z_list, uniq = _split_shifts(shifts)
    max_sy = max((-o[0] for (o, _) in xy_list), default=0)
    assert tile_h >= max_sy >= 0
    max_sz = max(uniq) if uniq else 0

    def prep(e):
        e = jnp.transpose(e, (0, 4, 1, 2, 3))
        h_pad = tile_h + _round_up(h, tile_h) - h
        w_pad = _round_up(max(w, 128), 128) - w
        return jnp.pad(e, ((0, 0), (0, 0), (max_sz, 0),
                           (tile_h, h_pad - tile_h), (0, w_pad)))

    at = prep(a_bdhwc)
    bt = prep(b_bdhwc)
    hp, wp = at.shape[3], at.shape[4]
    n_tiles = hp // tile_h
    k = len(shifts)
    vm = pltpu.VMEM

    kern = functools.partial(_cross_affinity_3d_kernel, tuple(xy_list),
                             tuple(z_list), len(uniq))
    blk = (1, c, 1, tile_h, wp)
    in_specs = [
        pl.BlockSpec(blk, lambda bi, zi, i, m=max_sz: (bi, 0, zi + m, i, 0),
                     memory_space=vm),                    # a cur
        pl.BlockSpec(blk, lambda bi, zi, i, m=max_sz: (bi, 0, zi + m, i, 0),
                     memory_space=vm),                    # b cur
        pl.BlockSpec(blk, lambda bi, zi, i, m=max_sz:
                     (bi, 0, zi + m, jnp.maximum(i - 1, 0), 0),
                     memory_space=vm),                    # b prev row
    ]
    for s in uniq:
        in_specs.append(pl.BlockSpec(
            blk, lambda bi, zi, i, s=s, m=max_sz: (bi, 0, zi + m - s, i, 0),
            memory_space=vm))
    out = pl.pallas_call(
        kern,
        grid=(b, d, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, k, 1, tile_h, wp),
                               lambda bi, zi, i: (bi, 0, zi, i, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((b, k, d, hp, wp), a_bdhwc.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(at, *([bt] * (2 + len(uniq))))
    return out[:, :, :, tile_h:tile_h + h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_cross_affinity_3d(a_bdhwc, b_bdhwc,
                            shifts=(1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27),
                            tile_h: int = 32,
                            interpret: bool = False):
    """(student, teacher) (B,D,H,W,C) -> (B,K,D,H,W) cross affinities."""
    return _fused_cross_affinity_3d_impl(a_bdhwc, b_bdhwc, tuple(shifts),
                                         tile_h, interpret)


def _fused_cross_3d_fwd(a, b, shifts, tile_h, interpret):
    return (_fused_cross_affinity_3d_impl(a, b, shifts, tile_h, interpret),
            (a, b))


def _fused_cross_3d_bwd(shifts, tile_h, interpret, res, g):
    from .emb2aff import normalize_embedding

    a, b = res
    bsz, d, h, w, c = a.shape
    na, vjp_a = jax.vjp(lambda x: normalize_embedding(x, axis=-1), a)
    nb, vjp_b = jax.vjp(lambda x: normalize_embedding(x, axis=-1), b)
    xy_list, z_list, _ = _split_shifts(shifts)

    dna = jnp.zeros_like(na)
    dnb = jnp.zeros_like(nb)
    if xy_list:
        xy_offsets = tuple(o for (o, _) in xy_list)
        xy_idx = [i for (_, i) in xy_list]
        g_xy = jnp.moveaxis(g[:, jnp.asarray(xy_idx)], 1, 2)
        g_xy = g_xy.reshape(bsz * d, len(xy_offsets), h, w)
        da_f, db_f = _fused_cross_bwd_impl(
            na.reshape(bsz * d, h, w, c), nb.reshape(bsz * d, h, w, c),
            g_xy, xy_offsets, tile_h, interpret, normalized=True)
        dna = dna + da_f.reshape(bsz, d, h, w, c)
        dnb = dnb + db_f.reshape(bsz, d, h, w, c)
    for ri, i in z_list:
        s = int(shifts[i])
        gi = g[:, i, s:, :, :, None]
        dna = dna.at[:, s:].add(gi * nb[:, : d - s])
        dnb = dnb.at[:, : d - s].add(gi * na[:, s:])
    return vjp_a(dna)[0], vjp_b(dnb)[0]


fused_cross_affinity_3d.defvjp(_fused_cross_3d_fwd, _fused_cross_3d_bwd)


# ---------------------------------------------------------------------------
# Loss-fused variants (VERDICT r3 #4): the WeightedMSE consumption of the
# affinities is folded INTO the kernels. Forward co-emits per-offset partial
# sums  S_k = sum_p w_k (a_k m_k - t_k m_k)^2  while target/weight/mask are
# streamed through VMEM once; backward recomputes a_k in-tile and forms the
# WMSE cotangent g_k = gS_k * 2 w_k m_k (a_k m_k - t_k m_k) in registers, so
# the (B, K, H, W) loss gradient never round-trips HBM (the reference
# materializes affinities AND their grad per offset,
# scripts_cvppp/loss/loss_embedding_mse.py:18-47).
#
# Contract: the affinities output is for MONITORING (relu'd pred) only — it
# carries stop-gradient semantics; gradients flow exclusively through the
# per-offset sums output. train_step returns pred as a no-grad aux, so this
# loses nothing.
# ---------------------------------------------------------------------------


def _affinity_wmse_kernel(offsets, cur_ref, prev_ref, t_ref, w_ref, m_ref,
                          out_ref, psum_ref):
    cur = _normalize(cur_ref[0].astype(jnp.float32))
    prev = _normalize(prev_ref[0].astype(jnp.float32))
    for k, (oy, ox) in enumerate(offsets):
        sy = -oy
        shifted = _cols(_rows_up(cur, prev, sy), -ox)
        a = jnp.sum(cur * shifted, axis=0)
        out_ref[0, k] = a.astype(out_ref.dtype)
        tk = t_ref[0, k].astype(jnp.float32)
        wk = w_ref[0, k].astype(jnp.float32)
        mk = m_ref[0, k].astype(jnp.float32)
        d = a * mk - tk * mk
        # per-offset partial sum, splat over one (8,128) tile (the minimal
        # block shape the TPU lowering accepts for an output)
        psum_ref[0, 0, k] = jnp.full((8, 128), jnp.sum(wk * d * d),
                                     jnp.float32)


def _pad_khw(x, tile_h, h, w, dtype=None):
    """Pad a (B, K, H, W) tensor with the fwd halo/tile-alignment zeros."""
    h_pad = tile_h + _round_up(h, tile_h) - h
    w_pad = _round_up(max(w, 128), 128) - w
    x = x if dtype is None else x.astype(dtype)
    return jnp.pad(x, ((0, 0), (0, 0), (tile_h, h_pad - tile_h), (0, w_pad)))


def _fused_wmse_2d_fwd_impl(e_bhwc, t, w_map, m, offsets, tile_h, interpret):
    b, h, w, c = e_bhwc.shape
    max_sy = max(-int(o[0]) for o in offsets)
    assert tile_h >= max_sy >= 0
    e = jnp.transpose(e_bhwc, (0, 3, 1, 2))
    h_pad = tile_h + _round_up(h, tile_h) - h
    w_pad = _round_up(max(w, 128), 128) - w
    e = jnp.pad(e, ((0, 0), (0, 0), (tile_h, h_pad - tile_h), (0, w_pad)))
    hp, wp = e.shape[2], e.shape[3]
    n_tiles = hp // tile_h
    k = len(offsets)
    tp = _pad_khw(t, tile_h, h, w)
    wmp = _pad_khw(w_map, tile_h, h, w)
    mp = _pad_khw(m, tile_h, h, w)

    kern = functools.partial(_affinity_wmse_kernel, tuple(map(tuple, offsets)))
    vm = pltpu.VMEM
    blk_e = pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=vm)
    blk_ep = pl.BlockSpec((1, c, tile_h, wp),
                          lambda bi, i: (bi, 0, jnp.maximum(i - 1, 0), 0),
                          memory_space=vm)
    blk_k = pl.BlockSpec((1, k, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=vm)
    affs, psums = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[blk_e, blk_ep, blk_k, blk_k, blk_k],
        out_specs=(blk_k,
                   pl.BlockSpec((1, 1, k, 8, 128),
                                lambda bi, i: (bi, i, 0, 0, 0),
                                memory_space=vm)),
        out_shape=(jax.ShapeDtypeStruct((b, k, hp, wp), e_bhwc.dtype),
                   jax.ShapeDtypeStruct((b, n_tiles, k, 8, 128),
                                        jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(e, e, tp, wmp, mp)
    return (psums[:, :, :, 0, 0].sum(axis=(0, 1)),
            affs[:, :, tile_h:tile_h + h, :w])


def _wmse_grad(gs, a, tk, wk, mk):
    d = a * mk - tk * mk
    return gs * 2.0 * wk * mk * d


def _affinity_wmse_bwd_kernel(offsets, gs_ref,
                              e_prev_ref, e_cur_ref, e_next_ref,
                              t_cur_ref, t_next_ref, w_cur_ref, w_next_ref,
                              m_cur_ref, m_next_ref, out_ref):
    """Backward with the WMSE cotangent formed in-tile: for each offset the
    affinity is recomputed on the cur AND next row-tiles (the down-looking
    term needs g below), g = gs_k * 2 w m (a m - t m), then the usual
    dn(p) = sum_k [ g_k(p) n(p+o_k) + g_k(p-o_k) n(p-o_k) ]."""
    n_prev = _normalize(e_prev_ref[0].astype(jnp.float32))
    n_cur = _normalize(e_cur_ref[0].astype(jnp.float32))
    n_next = _normalize(e_next_ref[0].astype(jnp.float32))
    dn = jnp.zeros_like(n_cur)
    for k, (oy, ox) in enumerate(offsets):
        sy = -oy
        gs = gs_ref[k]
        nb_cur = _cols(_rows_up(n_cur, n_prev, sy), -ox)
        a_cur = jnp.sum(n_cur * nb_cur, axis=0)
        g_cur = _wmse_grad(gs, a_cur,
                           t_cur_ref[0, k].astype(jnp.float32),
                           w_cur_ref[0, k].astype(jnp.float32),
                           m_cur_ref[0, k].astype(jnp.float32))
        dn = dn + g_cur[None] * nb_cur
        nb_next = _cols(_rows_up(n_next, n_cur, sy), -ox)
        a_next = jnp.sum(n_next * nb_next, axis=0)
        g_next = _wmse_grad(gs, a_next,
                            t_next_ref[0, k].astype(jnp.float32),
                            w_next_ref[0, k].astype(jnp.float32),
                            m_next_ref[0, k].astype(jnp.float32))
        gd = _cols(_rows_down(g_cur, g_next, sy), ox)
        nd = _cols(_rows_down(n_cur, n_next, sy), ox)
        dn = dn + gd[None] * nd
    out_ref[0] = _normalize_vjp(e_cur_ref[0].astype(jnp.float32), n_cur,
                                dn).astype(out_ref.dtype)


def _fused_wmse_2d_bwd_impl(e_bhwc, t, w_map, m, g_s, offsets, tile_h,
                            interpret):
    b, h, w, c = e_bhwc.shape
    k = len(offsets)
    max_sy = max(-int(o[0]) for o in offsets)
    assert tile_h >= max_sy >= 0
    e = jnp.transpose(e_bhwc, (0, 3, 1, 2))
    h_aligned = _round_up(h, tile_h)
    w_pad = _round_up(max(w, 128), 128) - w
    pads = ((0, 0), (0, 0), (tile_h, h_aligned - h + tile_h), (0, w_pad))
    e = jnp.pad(e, pads)
    tp = jnp.pad(t.astype(jnp.float32), pads)
    wmp = jnp.pad(w_map.astype(jnp.float32), pads)
    mp = jnp.pad(m.astype(jnp.float32), pads)
    hp, wp = e.shape[2], e.shape[3]
    n_tiles = h_aligned // tile_h

    kern = functools.partial(_affinity_wmse_bwd_kernel,
                             tuple(map(tuple, offsets)))
    vm = pltpu.VMEM
    blk_c = lambda off: pl.BlockSpec(  # noqa: E731
        (1, c, tile_h, wp), lambda bi, i, off=off: (bi, 0, i + off, 0),
        memory_space=vm)
    blk_k = lambda off: pl.BlockSpec(  # noqa: E731
        (1, k, tile_h, wp), lambda bi, i, off=off: (bi, 0, i + off, 0),
        memory_space=vm)
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gs (K,)
            blk_c(0), blk_c(1), blk_c(2),           # e prev/cur/next
            blk_k(1), blk_k(2),                     # t cur/next
            blk_k(1), blk_k(2),                     # w cur/next
            blk_k(1), blk_k(2),                     # m cur/next
        ],
        out_specs=pl.BlockSpec((1, c, tile_h, wp),
                               lambda bi, i: (bi, 0, i + 1, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), e_bhwc.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(g_s.astype(jnp.float32), e, e, e, tp, tp, wmp, wmp, mp, mp)
    de = out[:, :, tile_h:tile_h + h, :w]
    return jnp.transpose(de, (0, 2, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_affinity_wmse_2d(e_bhwc, target, weight, mask, offsets,
                           tile_h: int = 32, interpret: bool = False):
    """(e, t, w, m) -> (per-offset WMSE sums (K,), affs (B, K, H, W)).

    S_k = sum_{b,h,w} w_k (a_k m_k - t_k m_k)^2 — the caller applies the
    criterion normalizer and any per-offset scaling. The affinities output
    is stop-gradient (monitoring only); gradients flow through S.
    """
    return _fused_wmse_2d_fwd_impl(e_bhwc, target, weight, mask,
                                   tuple(map(tuple, offsets)), tile_h,
                                   interpret)


def _fused_wmse_2d_fwd(e, t, w, m, offsets, tile_h, interpret):
    out = _fused_wmse_2d_fwd_impl(e, t, w, m, tuple(map(tuple, offsets)),
                                  tile_h, interpret)
    return out, (e, t, w, m)


def _fused_wmse_2d_bwd(offsets, tile_h, interpret, res, g):
    e, t, w, m = res
    g_s, _ = g  # affs cotangent ignored by contract (stop-gradient output)
    de = _fused_wmse_2d_bwd_impl(e, t, w, m, g_s,
                                 tuple(map(tuple, offsets)), tile_h,
                                 interpret)
    return (de, jnp.zeros_like(t), jnp.zeros_like(w), jnp.zeros_like(m))


fused_affinity_wmse_2d.defvjp(_fused_wmse_2d_fwd, _fused_wmse_2d_bwd)


def _cross_wmse_kernel(offsets, a_ref, b_cur_ref, b_prev_ref,
                       t_ref, w_ref, m_ref, out_ref, psum_ref):
    na = _normalize(a_ref[0].astype(jnp.float32))
    nb_cur = _normalize(b_cur_ref[0].astype(jnp.float32))
    nb_prev = _normalize(b_prev_ref[0].astype(jnp.float32))
    for k, (oy, ox) in enumerate(offsets):
        sy = -oy
        shifted = _cols(_rows_up(nb_cur, nb_prev, sy), -ox)
        a = jnp.sum(na * shifted, axis=0)
        out_ref[0, k] = a.astype(out_ref.dtype)
        tk = t_ref[0, k].astype(jnp.float32)
        wk = w_ref[0, k].astype(jnp.float32)
        mk = m_ref[0, k].astype(jnp.float32)
        d = a * mk - tk * mk
        # per-offset partial sum, splat over one (8,128) tile (the minimal
        # block shape the TPU lowering accepts for an output)
        psum_ref[0, 0, k] = jnp.full((8, 128), jnp.sum(wk * d * d),
                                     jnp.float32)


def _fused_cross_wmse_2d_fwd_impl(a_bhwc, b_bhwc, t, w_map, m, offsets,
                                  tile_h, interpret):
    b, h, w, c = a_bhwc.shape
    max_sy = max(-int(o[0]) for o in offsets)
    assert tile_h >= max_sy >= 0
    at = jnp.transpose(a_bhwc, (0, 3, 1, 2))
    bt = jnp.transpose(b_bhwc, (0, 3, 1, 2))
    h_pad = tile_h + _round_up(h, tile_h) - h
    w_pad = _round_up(max(w, 128), 128) - w
    pads = ((0, 0), (0, 0), (tile_h, h_pad - tile_h), (0, w_pad))
    at = jnp.pad(at, pads)
    bt = jnp.pad(bt, pads)
    hp, wp = at.shape[2], at.shape[3]
    n_tiles = hp // tile_h
    k = len(offsets)
    tp = _pad_khw(t, tile_h, h, w)
    wmp = _pad_khw(w_map, tile_h, h, w)
    mp = _pad_khw(m, tile_h, h, w)

    kern = functools.partial(_cross_wmse_kernel, tuple(map(tuple, offsets)))
    vm = pltpu.VMEM
    blk_c = pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=vm)
    blk_cp = pl.BlockSpec((1, c, tile_h, wp),
                          lambda bi, i: (bi, 0, jnp.maximum(i - 1, 0), 0),
                          memory_space=vm)
    blk_k = pl.BlockSpec((1, k, tile_h, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=vm)
    affs, psums = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[blk_c, blk_c, blk_cp, blk_k, blk_k, blk_k],
        out_specs=(blk_k,
                   pl.BlockSpec((1, 1, k, 8, 128),
                                lambda bi, i: (bi, i, 0, 0, 0),
                                memory_space=vm)),
        out_shape=(jax.ShapeDtypeStruct((b, k, hp, wp), a_bhwc.dtype),
                   jax.ShapeDtypeStruct((b, n_tiles, k, 8, 128),
                                        jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(at, bt, bt, tp, wmp, mp)
    return (psums[:, :, :, 0, 0].sum(axis=(0, 1)),
            affs[:, :, tile_h:tile_h + h, :w])


def _cross_wmse_bwd_kernel(offsets, gs_ref,
                           a_cur_ref, a_next_ref, b_prev_ref, b_cur_ref,
                           b_next_ref,
                           t_cur_ref, t_next_ref, w_cur_ref, w_next_ref,
                           m_cur_ref, m_next_ref, da_ref, db_ref):
    """Cross-affinity WMSE backward, cotangent formed in-tile:
    dna(p) = sum_k g_k(p) nb(p+o_k);  dnb(p) = sum_k g_k(p-o_k) na(p-o_k),
    where a_k on the cur/next row tiles is recomputed from (na, nb)."""
    na_cur = _normalize(a_cur_ref[0].astype(jnp.float32))
    na_next = _normalize(a_next_ref[0].astype(jnp.float32))
    nb_prev = _normalize(b_prev_ref[0].astype(jnp.float32))
    nb_cur = _normalize(b_cur_ref[0].astype(jnp.float32))
    nb_next = _normalize(b_next_ref[0].astype(jnp.float32))
    dna = jnp.zeros_like(na_cur)
    dnb = jnp.zeros_like(nb_cur)
    for k, (oy, ox) in enumerate(offsets):
        sy = -oy
        gs = gs_ref[k]
        nb_sh_cur = _cols(_rows_up(nb_cur, nb_prev, sy), -ox)
        aff_cur = jnp.sum(na_cur * nb_sh_cur, axis=0)
        g_cur = _wmse_grad(gs, aff_cur,
                           t_cur_ref[0, k].astype(jnp.float32),
                           w_cur_ref[0, k].astype(jnp.float32),
                           m_cur_ref[0, k].astype(jnp.float32))
        dna = dna + g_cur[None] * nb_sh_cur
        nb_sh_next = _cols(_rows_up(nb_next, nb_cur, sy), -ox)
        aff_next = jnp.sum(na_next * nb_sh_next, axis=0)
        g_next = _wmse_grad(gs, aff_next,
                            t_next_ref[0, k].astype(jnp.float32),
                            w_next_ref[0, k].astype(jnp.float32),
                            m_next_ref[0, k].astype(jnp.float32))
        gd = _cols(_rows_down(g_cur, g_next, sy), ox)
        na_d = _cols(_rows_down(na_cur, na_next, sy), ox)
        dnb = dnb + gd[None] * na_d
    da_ref[0] = _normalize_vjp(a_cur_ref[0].astype(jnp.float32), na_cur,
                               dna).astype(da_ref.dtype)
    db_ref[0] = _normalize_vjp(b_cur_ref[0].astype(jnp.float32), nb_cur,
                               dnb).astype(db_ref.dtype)


def _fused_cross_wmse_2d_bwd_impl(a_bhwc, b_bhwc, t, w_map, m, g_s, offsets,
                                  tile_h, interpret):
    b, h, w, c = a_bhwc.shape
    k = len(offsets)
    max_sy = max(-int(o[0]) for o in offsets)
    assert tile_h >= max_sy >= 0
    at = jnp.transpose(a_bhwc, (0, 3, 1, 2))
    bt = jnp.transpose(b_bhwc, (0, 3, 1, 2))
    h_aligned = _round_up(h, tile_h)
    w_pad = _round_up(max(w, 128), 128) - w
    pads = ((0, 0), (0, 0), (tile_h, h_aligned - h + tile_h), (0, w_pad))
    at = jnp.pad(at, pads)
    bt = jnp.pad(bt, pads)
    tp = jnp.pad(t.astype(jnp.float32), pads)
    wmp = jnp.pad(w_map.astype(jnp.float32), pads)
    mp = jnp.pad(m.astype(jnp.float32), pads)
    hp, wp = at.shape[2], at.shape[3]
    n_tiles = h_aligned // tile_h

    kern = functools.partial(_cross_wmse_bwd_kernel,
                             tuple(map(tuple, offsets)))
    vm = pltpu.VMEM
    blk_c = lambda off: pl.BlockSpec(  # noqa: E731
        (1, c, tile_h, wp), lambda bi, i, off=off: (bi, 0, i + off, 0),
        memory_space=vm)
    blk_k = lambda off: pl.BlockSpec(  # noqa: E731
        (1, k, tile_h, wp), lambda bi, i, off=off: (bi, 0, i + off, 0),
        memory_space=vm)
    da, db = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gs (K,)
            blk_c(1), blk_c(2),                     # a cur/next
            blk_c(0), blk_c(1), blk_c(2),           # b prev/cur/next
            blk_k(1), blk_k(2),                     # t cur/next
            blk_k(1), blk_k(2),                     # w cur/next
            blk_k(1), blk_k(2),                     # m cur/next
        ],
        out_specs=(
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i + 1, 0),
                         memory_space=vm),
            pl.BlockSpec((1, c, tile_h, wp), lambda bi, i: (bi, 0, i + 1, 0),
                         memory_space=vm),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, c, hp, wp), a_bhwc.dtype),
                   jax.ShapeDtypeStruct((b, c, hp, wp), b_bhwc.dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(g_s.astype(jnp.float32), at, at, bt, bt, bt, tp, tp, wmp, wmp, mp, mp)
    da = jnp.transpose(da[:, :, tile_h:tile_h + h, :w], (0, 2, 3, 1))
    db = jnp.transpose(db[:, :, tile_h:tile_h + h, :w], (0, 2, 3, 1))
    return da, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_cross_affinity_wmse_2d(a_bhwc, b_bhwc, target, weight, mask,
                                 offsets, tile_h: int = 32,
                                 interpret: bool = False):
    """Cross-view (student, teacher) loss-fused variant; see
    fused_affinity_wmse_2d. Returns (per-offset sums (K,), affs)."""
    return _fused_cross_wmse_2d_fwd_impl(a_bhwc, b_bhwc, target, weight,
                                         mask, tuple(map(tuple, offsets)),
                                         tile_h, interpret)


def _fused_cross_wmse_fwd(a, b, t, w, m, offsets, tile_h, interpret):
    out = _fused_cross_wmse_2d_fwd_impl(a, b, t, w, m,
                                        tuple(map(tuple, offsets)), tile_h,
                                        interpret)
    return out, (a, b, t, w, m)


def _fused_cross_wmse_bwd(offsets, tile_h, interpret, res, g):
    a, b, t, w, m = res
    g_s, _ = g  # affs output is stop-gradient by contract
    da, db = _fused_cross_wmse_2d_bwd_impl(a, b, t, w, m, g_s,
                                           tuple(map(tuple, offsets)),
                                           tile_h, interpret)
    return (da, db, jnp.zeros_like(t), jnp.zeros_like(w),
            jnp.zeros_like(m))


fused_cross_affinity_wmse_2d.defvjp(_fused_cross_wmse_fwd,
                                    _fused_cross_wmse_bwd)
