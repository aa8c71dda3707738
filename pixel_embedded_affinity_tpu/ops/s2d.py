"""Space-to-depth conv reformulation (exact) for small-channel layers.

XLA's TPU convs run near peak for C >= 128 but at 2.7-8% for C in {16, 32}
(the channel minor dim is lane-padded to 128, wasting both bandwidth and
MXU geometry). A stride-1 SAME 3x3 conv at (H, W, C) is EXACTLY equal to a
3x3 conv at (H/2, W/2, 4C) on the space-to-depth layout with a
structured-sparse (4C, 4C') kernel: output parity q=(qy,qx) at block (i,j)
needs input rows 2i+qy-1..2i+qy+1, which span blocks i-1..i+1, so the
block-space kernel stays 3x3 and entry
    W'[by, bx, (py,px,ci), (qy,qx,co)] = w[dy+1, dx+1, ci, co]
      where dy = 2*(by-1) + py - qy, dx = 2*(bx-1) + px - qx,
      zero unless dy, dx in {-1, 0, 1}.
The dense s2d conv does 4x the FLOPs (25% of W' is nonzero) but runs at
C>=64 efficiency: measured 2-3x faster end-to-end for the C16/C32 layers
(docs/PERF.md). Used by models/fast_forward.py for the high-resolution
stage of ResidualUNet2DDeep (reference unet2d_residual.py:279-353).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (py, px, c)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) -> (B, 2H, 2W, C), inverse of space_to_depth."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def s2d_conv2x2_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (2, 2, 4*Cin, 4*Cout) per-output-parity kernel.

    A stride-1 SAME 3x3 conv at (H, W, C) is ALSO exactly one 2x2 VALID
    conv over the 1-padded s2d tensor, with the four output parities
    stacked along Cout and recovered by parity-offset slices (see
    ``s2d_conv2x2``). Derivation (per axis): output parity qy at block i is
        o_q[i] = sum_dy w[dy+1] x_full[2i + qy + dy]
    and with P[j] = x_s2d[j-1] (the padded tensor) this equals
        V_q[i + qy],  V_q[j] = sum_b K_q[b] P[j + b],
        K_q[b, py] = w[qy + 2b + py - 1]   (zero when the index leaves 0..2).
    Only 9 of 16 (b, py, bx, px) slots are nonzero, so this form does
    16/9 = 1.78x the direct-conv FLOPs — 2.25x fewer than the dense 3x3
    block-space kernel (``s2d_conv_weights``, 4x) — while the matmul K and
    N dims stay 4x wider than the direct conv's. Channel orders match
    space_to_depth: input (py, px, ci), output (qy, qx, co)."""
    return _s2d_conv2x2_build(w, (0, 1), (0, 1))


def s2d_conv2x2_weights_qx(w: jnp.ndarray, qx: int) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (2, 2, 4*Cin, 2*Cout) kernel for ONE x output
    parity, output channel order (qy, co).

    W-axis offset slices of the combined-parity form cost a sublane
    relayout pass (~3 ms at 272^2 on v5e — docs/PERF.md); splitting qx
    into two convs with asymmetric W padding ((1,0) for qx=0, (0,1) for
    qx=1) absorbs the W shift into the conv, leaving only cheap H-offset
    and channel-group slices."""
    return _s2d_conv2x2_build(w, (0, 1), (qx,))


def _s2d_conv2x2_build(w, qys, qxs):
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    zero = jnp.zeros((cin, cout), w.dtype)

    def tap(q, b, p):
        i = q + 2 * b + p - 1
        return i if 0 <= i <= 2 else None

    rows = []
    for by in range(2):
        cols = []
        for bx in range(2):
            prow = []
            for py in range(2):
                for px in range(2):
                    qcol = []
                    for qy in qys:
                        for qx in qxs:
                            iy = tap(qy, by, py)
                            ix = tap(qx, bx, px)
                            qcol.append(zero if iy is None or ix is None
                                        else w[iy, ix])
                    prow.append(jnp.concatenate(qcol, axis=1))
            cols.append(jnp.concatenate(prow, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def s2d_conv2x2_slices(v: jnp.ndarray, cout: int) -> jnp.ndarray:
    """Recover the s2d-form conv output from the 2x2-valid-conv tensor.

    ``v``: (B, h+1, w+1, 4*cout) result of convolving the 1-padded s2d
    tensor with an ``s2d_conv2x2_weights`` kernel (padding=((1,1),(1,1))).
    Output parity (qy, qx)'s plane is v[:, qy:qy+h, qx:qx+w, g*cout:...]."""
    b, h1, w1, _ = v.shape
    h, w = h1 - 1, w1 - 1
    parts = []
    for qy in range(2):
        for qx in range(2):
            g = 2 * qy + qx
            parts.append(v[:, qy:qy + h, qx:qx + w,
                           g * cout:(g + 1) * cout])
    return jnp.concatenate(parts, axis=-1)


def s2d_conv_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(K, K, Cin, Cout) -> (3, 3, 4*Cin, 4*Cout) s2d-space kernel for
    K in {3, 5} (a 5-tap window still spans <= 3 blocks per axis).

    Traceable: assembled from slices of a zero-padded copy of w via a
    constant gather, so it can sit inside a jit (weights-only, hoisted)."""
    kh, kw, cin, cout = w.shape
    assert kh == kw and kh in (3, 5), (kh, kw)
    half = kh // 2

    def tap(by, py, qy):
        dy = 2 * (by - 1) + py - qy
        return dy + half if -half <= dy <= half else None

    zero = jnp.zeros((cin, cout), w.dtype)
    rows = []
    for by in range(3):
        cols = []
        for bx in range(3):
            # block (4Cin, 4Cout) for kernel position (by, bx)
            prow = []
            for py in range(2):
                for px in range(2):
                    qcol = []
                    for qy in range(2):
                        for qx in range(2):
                            iy = tap(by, py, qy)
                            ix = tap(bx, px, qx)
                            qcol.append(zero if iy is None or ix is None
                                        else w[iy, ix])
                    prow.append(jnp.concatenate(qcol, axis=1))
            cols.append(jnp.concatenate(prow, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)
