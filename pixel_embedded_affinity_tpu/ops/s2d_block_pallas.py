"""Fused Pallas TPU kernel: one s2d residual block in a single pass.

Computes relu(conv2(relu(conv1(x))) + project(x)) for an s2d-layout tensor
(B, H, W, 4C) — the ResidualBlock of the reference ResUNet
(scripts_cvppp/model/unet2d_residual.py:5-25) with inference BN folded into
the weights — without any intermediate leaving VMEM.

Why: on v5e the XLA version of this block at 272^2 shapes spends most of
its time in HBM glue (parity realignment, concats, elementwise passes run
5-20x off STREAM bandwidth — docs/PERF.md). In-kernel, the convs use the
2x2 parity form (ops/s2d.py::s2d_conv2x2_weights: 16/9 = 1.78x direct
FLOPs, vs 4x for the dense block-space kernel) and the parity realignment
is VMEM slicing, which is free by comparison.

Layout: rows = leading dim, W = sublane, channels = lane. Grid (B, H/TH);
each step reads its row tile plus prev/next tiles for the two-conv halo
(conv2 needs conv1 on rows [-1, TH+1), which needs x on [-2, TH+2)).

Index bookkeeping (y axis, per conv): with P[j] = x[j-1] (zero-padded),
V[j] = K[0] P[j] + K[1] P[j+1], and output parity qy at block row g is
V[g + qy]. The kernel materializes V1 on rows [t0-1, t0+TH+2), assembles
y1 = relu(V1 parity slices) on [t0-1, t0+TH+1), then V2 on [t0, t0+TH+1)
and emits out_q = relu(V2[g+qy] + proj_q) for g in the tile. The x axis
is handled identically via zero-padded sublane shifts (width W+1 arrays).

conv1 and project share the block input, so their taps run as one matmul
with output groups (qy, qx, [conv1 | project]). Split inputs (decoder
virtual skip concats) accumulate V1 over the two parts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_w(x, left: int, right: int):
    """zero-pad the W (second-to-last) axis of (R, W, C)."""
    parts = []
    if left:
        parts.append(jnp.zeros((x.shape[0], left, x.shape[2]), x.dtype))
    parts.append(x)
    if right:
        parts.append(jnp.zeros((x.shape[0], right, x.shape[2]), x.dtype))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _conv2x2_rows(xs, ks, rows_out: int, w_out: int):
    """V[j, w] = sum_parts sum_{by,bx in 2x2} K[by,bx] . X[j+by, w+bx].

    xs: list of (R, Wp, C4) VMEM arrays with R >= rows_out + 1 and
    Wp >= w_out + 1 (callers zero-pad the W axis for the conv's SAME
    semantics and supply real halo rows);
    ks: list of (2, 2, C4, N) tap matrices. Returns (rows_out, w_out, N) f32.

    The matmul operand widths are kept sublane-aligned (8): Mosaic's
    (R, W, C) -> (R*W, C) collapse for dot_general requires W % 8 == 0.
    """
    w_dot = _round_up(w_out, 8)
    acc = None
    for x, k in zip(xs, ks):
        if x.shape[1] < w_dot + 1:
            x = _pad_w(x, 0, w_dot + 1 - x.shape[1])
        for by in range(2):
            rows = x[by:by + rows_out]
            for bx in range(2):
                cols = rows[:, bx:bx + w_dot]
                # pin DEFAULT precision: a global jax_default_matmul_
                # precision="highest" would request an fp32-contract
                # matmul on bf16 vectors, which Mosaic rejects
                term = jax.lax.dot_general(
                    cols, k[by, bx], (((2,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
                acc = term if acc is None else acc + term
    return acc[:, :w_out]


def _block_kernel(c1, cp, c2, th, n_parts, n_tiles, *refs):
    # refs: per part (prev, cur, next), then k1p parts, 4 per-parity k2
    # slices, h1p, h2, and 4 per-parity outputs. Mosaic cannot concatenate
    # or store at unaligned LANE offsets, so the four parity groups never
    # merge in-kernel: conv2 consumes them as separate K-slices of k2 and
    # each parity's result goes to its own output ref (XLA concatenates
    # outside, which is cheap — docs/PERF.md).
    xs_prev = [refs[3 * i][0] for i in range(n_parts)]
    xs_cur = [refs[3 * i + 1][0] for i in range(n_parts)]
    xs_next = [refs[3 * i + 2][0] for i in range(n_parts)]
    k1p_refs = refs[3 * n_parts:4 * n_parts]
    k2_refs = refs[4 * n_parts:4 * n_parts + 4]
    h1p_ref = refs[4 * n_parts + 4]
    h2_ref = refs[4 * n_parts + 5]
    out_refs = refs[4 * n_parts + 6:]

    w = xs_cur[0].shape[1]
    g1 = c1 + cp

    # X = x rows [t0-2, t0+TH+2), W zero-padded by 2 both sides.
    # V1 is computed ONE COLUMN WIDER on each side than needed for the
    # parity slices (cols v' in [0, W+3) <-> conv-output col v = v'-1 in
    # [-1, W+2)) so that conv2's zero-padded y inputs can be produced by
    # masking slices instead of concatenation (Mosaic cannot concatenate
    # values whose layouts carry different lane/sublane offsets).
    # Rows: V1[jj] needs x[(t0-1+jj)-1+by] = X[jj+by];
    # cols: v1 col v' needs x col v'-2+bx = Xw[v'+bx] with Xw 2-left-padded.
    # widths: v2 contracts at w_dot2 = round_up(w+1, 8) sublane-aligned
    # columns, so the y parts must be w_dot2+1 wide WITHOUT further
    # padding (padding sliced values would need an offset-layout concat,
    # which Mosaic rejects); v1 is therefore computed w2 = w_dot2+8 wide.
    w_dot2 = _round_up(w + 1, 8)
    w2 = w_dot2 + 8
    xs = [_pad_w(jnp.concatenate([p[th - 2:], c, n[:2]], axis=0), 2,
                 w2 + 1 - (w + 2))
          for p, c, n in zip(xs_prev, xs_cur, xs_next)]
    v1 = _conv2x2_rows(xs, [kr[...] for kr in k1p_refs], th + 3, w2)
    v1 = v1 + h1p_ref[...].astype(jnp.float32)[None]

    # y rows [t0-1, t0+TH+1), cols [-1, W+1): y_q = relu(V1 slice), zeroed
    # where the row/col falls outside the tensor (the reference's SAME
    # conv2 sees ZEROS there, not relu(shift)).
    dt = xs_cur[0].dtype
    wy = w2 - 1  # y part width: cols [-1, wy-1) in y coords
    ti = pl.program_id(1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wy, 1), 0)
    ci_ = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wy, 1), 1)
    valid = ((((ri > 0) | (ti > 0))
              & ((ri < th + 1) | (ti < n_tiles - 1)))
             & (ci_ > 0) & (ci_ < w + 1))
    y_parts = []
    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            blk = v1[qy:qy + th + 2, qx:qx + wy, q * g1:q * g1 + c1]
            y = jax.nn.relu(blk).astype(dt)
            y_parts.append(jnp.where(valid, y, jnp.zeros_like(y)))

    # V2 rows [t0, t0+TH+1): V2[jj2] needs y1[(t0+jj2)-1+by] = Y[jj2+by]
    # and col v+bx-1 = Yext[v+bx] (Yext col 0 is y col -1); conv2's
    # 4*c1-channel contraction runs as four K=c1 matmuls, one per input
    # parity group.
    v2 = _conv2x2_rows(y_parts, [kr[...] for kr in k2_refs], th + 1, w + 1)
    v2 = v2 + h2_ref[...].astype(jnp.float32)[None]

    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            o2 = v2[qy:qy + th, qx:qx + w, q * c2:(q + 1) * c2]
            # proj: V1 rows jj = (g - t0) + qy + 1 for g in [t0, t0+TH);
            # cols j_out + qx in old-v coords = slice [qx+1, qx+1+W) of v'
            pr = v1[qy + 1:qy + 1 + th, qx + 1:qx + 1 + w,
                    q * g1 + c1:(q + 1) * g1]
            out_refs[q][0] = jax.nn.relu(o2 + pr).astype(dt)


def fused_s2d_block(xs, k1ps, h1p, k2, h2, c1: int, cp: int, c2: int,
                    tile_h: int = 32, interpret: bool = False):
    """xs: s2d tensor (B, H, W, 4Cin) or tuple of parts (virtual concat);
    k1ps: (2,2,4Cin_part, 4*(c1+cp)) fused conv1+project tap matrices, one
    per part (ops/s2d.py::s2d_conv2x2_weights channel orders, N groups
    (qy, qx, [c1|cp])); k2: (2,2,4*c1,4*c2); h1p: (4*(c1+cp),) shift,
    h2: (4*c2,). Returns the block output (B, H, W, 4*c2).
    """
    if not isinstance(xs, (tuple, list)):
        xs = (xs,)
        k1ps = (k1ps,)
    n_parts = len(xs)
    b, h, w, _ = xs[0].shape
    assert h % tile_h == 0, (h, tile_h)
    assert tile_h >= 2
    n_tiles = h // tile_h

    # one zero tile above and below for the row halo
    xs_p = [jnp.pad(x, ((0, 0), (tile_h, tile_h), (0, 0), (0, 0)))
            for x in xs]

    kern = functools.partial(_block_kernel, c1, cp, c2, tile_h, n_parts,
                             n_tiles)
    in_specs = []
    args = []
    for x in xs_p:
        c4 = x.shape[-1]
        for di in range(3):
            in_specs.append(pl.BlockSpec(
                (1, tile_h, w, c4),
                functools.partial(lambda bi, i, d: (bi, i + d, 0, 0), d=di),
                memory_space=pltpu.VMEM))
            args.append(x)
    k2qs = [k2[:, :, q * c1:(q + 1) * c1, :] for q in range(4)]
    for k in list(k1ps) + k2qs:
        in_specs.append(pl.BlockSpec(k.shape, lambda bi, i: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(k)
    for hvec in (h1p, h2):
        hvec = hvec.reshape(1, -1)
        in_specs.append(pl.BlockSpec(hvec.shape, lambda bi, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(hvec)

    out_spec = pl.BlockSpec((1, tile_h, w, c2), lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_sh = jax.ShapeDtypeStruct((b, h, w, c2), xs[0].dtype)
    outs = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=(out_spec,) * 4,
        out_shape=(out_sh,) * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return jnp.concatenate(outs, axis=-1)
