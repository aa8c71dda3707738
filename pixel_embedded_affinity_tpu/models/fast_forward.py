"""Optimized inference forward for ResidualUNet2DDeep (exact math).

Builds a pure function from trained `variables` that reproduces
ResidualUNet2DDeep.apply(..., train=False)'s (embedding, mask) outputs with:

* the high-resolution small-channel stages computed in SPACE-TO-DEPTH form
  (ops/s2d.py): a 544^2 x C16 conv becomes a 272^2 x C64 conv, which XLA
  runs 2-3x faster (C16 tensors are lane-padded 8x; C>=64 shapes run near
  the MXU geometry bound). The reformulation is exact — see s2d.py.
* inference BatchNorm folded to per-channel scale/shift applied in the
  conv epilogue (XLA fuses the affine+ReLU into one elementwise pass),
* 2x2 maxpool of an s2d stage as a parity-group max (no relayout of the
  full-res tensor),
* align-corners bilinear upsampling emitted DIRECTLY in s2d form via
  per-parity interpolation-matrix matmuls (the full-res tensor never
  materializes in pixel layout).

Numerics match the Flax module to dtype tolerance
(tests/test_fast_forward.py). Mirrors the reference forward
scripts_cvppp/model/unet2d_residual.py:279-353.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.quant import (act_scale_from_absmax, conv_i8, quantize_act,
                         quantize_weights_per_cout)
from ..ops.s2d import (space_to_depth, depth_to_space, s2d_conv_weights,
                       s2d_conv2x2_weights, s2d_conv2x2_weights_qx)
from ..ops.s2d_block_pallas import fused_s2d_block
from .common import upsample_align_corners, replication_pad_to

_conv = functools.partial(jax.lax.conv_general_dilated, window_strides=(1, 1),
                          padding="SAME",
                          dimension_numbers=("NHWC", "HWIO", "NHWC"))
_conv2x2_x0 = functools.partial(jax.lax.conv_general_dilated,
                                window_strides=(1, 1),
                                padding=((1, 1), (1, 0)),
                                dimension_numbers=("NHWC", "HWIO", "NHWC"))
_conv2x2_x1 = functools.partial(jax.lax.conv_general_dilated,
                                window_strides=(1, 1),
                                padding=((1, 1), (0, 1)),
                                dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fold_bn(bn_params, bn_stats, conv_bias=None, eps=1e-5):
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    shift = bn_params["bias"] - bn_stats["mean"] * scale
    if conv_bias is not None:
        shift = shift + conv_bias * scale
    return scale.astype(jnp.float32), shift.astype(jnp.float32)


def _interp_matrix(n_out: int, n_in: int):
    """Align-corners bilinear interpolation matrix (n_out, n_in)."""
    import numpy as np

    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += 1 - frac
    m[np.arange(n_out), hi] += frac
    return jnp.asarray(m)


def _upsample2x_to_s2d(y, dtype):
    """(B, H, W, C) -> s2d view of the 2x align-corners upsample:
    (B, H, W, 4C) with channel order (qy, qx, c). The (2H, 2W) tensor never
    materializes: per-parity rows of the interpolation matrix are applied
    as separate matmuls. (A two-tap shift-blend form was measured SLOWER
    than these einsums on chip — see docs/PERF.md.)"""
    b, h, w, c = y.shape
    my = _interp_matrix(2 * h, h).astype(dtype)
    mx = _interp_matrix(2 * w, w).astype(dtype)
    parts = []
    for qy in range(2):
        a = jnp.einsum("oi,biwc->bowc", my[qy::2], y)
        for qx in range(2):
            parts.append(jnp.einsum("oj,bhjc->bhoc", mx[qx::2], a))
    return jnp.concatenate(parts, axis=-1)


class _BlockW:
    """Folded weights of one ResidualBlock, in direct or s2d form.

    ``split_at``: Cin index where the block input is a VIRTUAL concat of
    two tensors (decoder skip): conv(concat(a, b), W) is computed as
    conv(a, W[:, :, :split]) + conv(b, W[:, :, split:]) — the concat never
    materializes and (in s2d form) the fat 4*(Ca+Cb)-channel conv becomes
    two slimmer ones.

    ``int8_c1``/``int8_c2``: run that conv in int8 (symmetric, per-output-
    channel weight scales over the PREPARED kernel, static activation scale
    from ``scales`` — see ops/quant.py). Measured 1.3-1.6x at the fat
    decoder shapes on v5e (docs/profile_int8.py); per-stage opt-in because
    thin-channel convs LOSE in int8. ``collect``: a dict that __call__
    fills with max|x| at each quantization site (calibration mode)."""

    def __init__(self, p, s, dtype, s2d, split_at: int | None = None,
                 name: str = "", int8_c1: bool = False,
                 int8_c2: bool = False, scales: dict | None = None,
                 collect: dict | None = None,
                 collect_q: float | None = None):
        # s2d: False = direct-resolution convs; "dense" = dense 3x3
        # block-space kernels (4x direct FLOPs, fewest ops); "2x2" = per-
        # output-parity 2x2 kernels (1.78x FLOPs) in XLA; "pallas" = the
        # whole block as ONE fused Pallas kernel (2x2 parity matmuls with
        # VMEM-resident intermediates — ops/s2d_block_pallas.py).
        # Measured per-stage on v5e, see docs/PERF.md.
        if s2d is True:
            s2d = "dense"
        self.s2d = s2d
        self.split_at = split_at
        self.interpret = False  # pallas interpret mode (tests)
        self.name = name
        self.int8_c1 = int8_c1
        self.int8_c2 = int8_c2
        self.scales = scales or {}
        self.collect = collect
        self.collect_q = collect_q
        if (int8_c1 or int8_c2) and s2d == "pallas":
            raise ValueError("int8 not supported on the pallas block form")

        folded = {}
        for conv_name, bn_name in (("conv1", "bn1"), ("conv2", "bn2"),
                                   ("project_conv", "project_bn")):
            scale, shift = _fold_bn(p[bn_name], s[bn_name],
                                    p[conv_name].get("bias"))
            # fold the BN scale into the conv weights (exact: per-output-
            # channel column scaling commutes with the conv), leaving a
            # shift-and-ReLU epilogue that XLA fuses into the conv output —
            # no separate f32 elementwise pass over the activations.
            folded[conv_name] = (p[conv_name]["kernel"].astype(jnp.float32)
                                 * scale, shift)

        self.dtype = dtype
        if s2d is False or s2d == "dense":
            # conv1 and project share the block input: run them as ONE
            # conv with output channels [conv1-block | project-block]
            # (s2d kernels concatenated AFTER the block-space transform,
            # so each half stays channel-contiguous for slicing)
            w1, h1 = folded["conv1"]
            wp, hp = folded["project_conv"]
            w2, h2 = folded["conv2"]
            self.c1 = w1.shape[3]

            def prep(wpart):
                if s2d == "dense":
                    wpart = s2d_conv_weights(wpart)
                return wpart  # f32; cast/quantize below

            def prep1p(wa, wb):
                return jnp.concatenate([prep(wa), prep(wb)], axis=3)

            if s2d == "dense":
                h1 = jnp.tile(h1, 4)
                hp = jnp.tile(hp, 4)
                h2 = jnp.tile(h2, 4)
            if split_at is not None:
                w1p = (prep1p(w1[:, :, :split_at], wp[:, :, :split_at]),
                       prep1p(w1[:, :, split_at:], wp[:, :, split_at:]))
            else:
                w1p = prep1p(w1, wp)
            h1p = jnp.concatenate([h1, hp])
            if int8_c1:
                self.sx1 = act_scale_from_absmax(self.scales["c1"])
                if split_at is not None:
                    self.sx1b = act_scale_from_absmax(self.scales["c1b"])
                    qa, sa = quantize_weights_per_cout(w1p[0])
                    qb, sb = quantize_weights_per_cout(w1p[1])
                    self.w1p = (qa, qb)
                    self.o1p = (sa * self.sx1, sb * self.sx1b)
                else:
                    q, sw = quantize_weights_per_cout(w1p)
                    self.w1p, self.o1p = q, sw * self.sx1
                self.h1p_ = h1p.astype(jnp.float32)
            else:
                self.w1p = (tuple(w.astype(dtype) for w in w1p)
                            if split_at is not None else w1p.astype(dtype))
                self.h1p_ = h1p.astype(dtype)
            if int8_c2:
                self.sx2 = act_scale_from_absmax(self.scales["c2"])
                q, sw = quantize_weights_per_cout(prep(w2))
                self.w2, self.o2 = q, sw * self.sx2
                self.h2_ = h2.astype(jnp.float32)
            else:
                self.w2 = prep(w2).astype(dtype)
                self.h2_ = h2.astype(dtype)
            self.n1 = (4 if s2d == "dense" else 1) * self.c1
            return

        # s2d 2x2 parity form (ops/s2d.py::s2d_conv2x2_weights_qx): conv1
        # and project share the block input, so they run fused, one conv
        # per x output parity (asymmetric W padding absorbs the W shift);
        # output groups per conv are (qy, [conv1 | project]). conv2 is a
        # second pair of 2x2 convs whose sliced outputs are summed with
        # the project slices.
        w1, h1 = folded["conv1"]
        wp, hp = folded["project_conv"]
        w2, h2 = folded["conv2"]
        self.c1, self.cp, self.c2 = (w1.shape[3], wp.shape[3], w2.shape[3])

        def fuse(wa, wb, qx):
            ka = s2d_conv2x2_weights_qx(wa, qx)
            kb = s2d_conv2x2_weights_qx(wb, qx)
            kh, kw, ci, _ = ka.shape
            ka = ka.reshape(kh, kw, ci, 2, -1)
            kb = kb.reshape(kh, kw, ci, 2, -1)
            return (jnp.concatenate([ka, kb], axis=-1)
                    .reshape(kh, kw, ci, -1))  # f32; cast/quantize below

        def fuse_full(wa, wb):
            ka = s2d_conv2x2_weights(wa)
            kb = s2d_conv2x2_weights(wb)
            kh, kw, ci, _ = ka.shape
            ka = ka.reshape(kh, kw, ci, 4, -1)
            kb = kb.reshape(kh, kw, ci, 4, -1)
            return (jnp.concatenate([ka, kb], axis=-1)
                    .reshape(kh, kw, ci, -1).astype(dtype))

        if s2d == "pallas":
            if split_at is not None:
                self.k1p = (fuse_full(w1[:, :, :split_at],
                                      wp[:, :, :split_at]),
                            fuse_full(w1[:, :, split_at:],
                                      wp[:, :, split_at:]))
            else:
                self.k1p = fuse_full(w1, wp)
            self.h1p = jnp.tile(jnp.concatenate([h1, hp]), 4).astype(dtype)
            self.k2 = s2d_conv2x2_weights(w2).astype(dtype)
            self.h2 = jnp.tile(h2, 4).astype(dtype)
            return

        if split_at is not None:
            # each split part arrives as its own s2d tensor, so the 2x2
            # kernels are built from the per-part direct kernels
            k1p = tuple(
                (fuse(w1[:, :, :split_at], wp[:, :, :split_at], qx),
                 fuse(w1[:, :, split_at:], wp[:, :, split_at:], qx))
                for qx in range(2))
        else:
            k1p = tuple(fuse(w1, wp, qx) for qx in range(2))
        h1p = jnp.tile(jnp.concatenate([h1, hp]), 2)
        k2 = tuple(s2d_conv2x2_weights_qx(w2, qx) for qx in range(2))
        h2t = jnp.tile(h2, 2)
        if int8_c1:
            self.sx1 = act_scale_from_absmax(self.scales["c1"])
            if split_at is not None:
                self.sx1b = act_scale_from_absmax(self.scales["c1b"])
                qs = tuple((quantize_weights_per_cout(ka),
                            quantize_weights_per_cout(kb))
                           for ka, kb in k1p)
                self.k1p = tuple((a[0], b[0]) for a, b in qs)
                self.o1p = tuple((a[1] * self.sx1, b[1] * self.sx1b)
                                 for a, b in qs)
            else:
                qs = tuple(quantize_weights_per_cout(k) for k in k1p)
                self.k1p = tuple(q for q, _ in qs)
                self.o1p = tuple(sw * self.sx1 for _, sw in qs)
            self.h1p = h1p.astype(jnp.float32)
        else:
            self.k1p = jax.tree.map(lambda k: k.astype(dtype), k1p)
            self.h1p = h1p.astype(dtype)
        if int8_c2:
            self.sx2 = act_scale_from_absmax(self.scales["c2"])
            qs = tuple(quantize_weights_per_cout(k) for k in k2)
            self.k2 = tuple(q for q, _ in qs)
            self.o2 = tuple(sw * self.sx2 for _, sw in qs)
            self.h2 = h2t.astype(jnp.float32)
        else:
            self.k2 = tuple(k.astype(dtype) for k in k2)
            self.h2 = h2t.astype(dtype)

    def _in_conv(self, x, w, conv=_conv):
        if self.split_at is not None:
            a, b = x
            wa, wb = w
            return conv(a, wa) + conv(b, wb)
        return conv(x, w)

    def _cstat(self, x):
        """Calibration statistic at a quantization site: max|x|, or the
        collect_q quantile of |x| (percentile clipping)."""
        ax = jnp.abs(x).astype(jnp.float32)
        if self.collect_q is not None:
            return jnp.quantile(ax.ravel(), self.collect_q)
        return jnp.max(ax)

    def _record_c1(self, x):
        if self.split_at is not None:
            a, b = x
            self.collect[f"{self.name}.c1"] = self._cstat(a)
            self.collect[f"{self.name}.c1b"] = self._cstat(b)
        else:
            self.collect[f"{self.name}.c1"] = self._cstat(x)

    def _c1_int8(self, x, conv=_conv):
        """conv1+project in int8; returns the f32 pre-activation."""
        if self.split_at is not None:
            a, b = x
            return (conv_i8(conv, quantize_act(a, self.sx1),
                            self.w1p[0], self.o1p[0])
                    + conv_i8(conv, quantize_act(b, self.sx1b),
                              self.w1p[1], self.o1p[1]))
        return conv_i8(conv, quantize_act(x, self.sx1), self.w1p, self.o1p)

    def __call__(self, x):
        if self.s2d == "pallas":
            xs = x if self.split_at is not None else (x,)
            k1ps = self.k1p if self.split_at is not None else (self.k1p,)
            h = xs[0].shape[1]
            tile_h = max(t for t in (32, 16, 8, 4, 2) if h % t == 0)
            return fused_s2d_block(xs, k1ps, self.h1p, self.k2, self.h2,
                                   self.c1, self.cp, self.c2,
                                   tile_h=tile_h, interpret=self.interpret)
        if self.s2d == "2x2":
            return self._call_s2d(x)
        if self.collect is not None:
            self._record_c1(x)
        if self.int8_c1:
            v = self._c1_int8(x) + self.h1p_
        else:
            v = self._in_conv(x, self.w1p) + self.h1p_
        y = jax.nn.relu(v[..., :self.n1])
        proj = v[..., self.n1:]
        if self.collect is not None:
            self.collect[f"{self.name}.c2"] = self._cstat(y)
        if self.int8_c2:
            y2 = conv_i8(_conv, quantize_act(y, self.sx2), self.w2,
                         self.o2, self.h2_)
        else:
            y2 = _conv(y.astype(self.dtype), self.w2) + self.h2_
        return jax.nn.relu(y2 + proj).astype(self.dtype)

    def _call_s2d(self, x):
        convs = (_conv2x2_x0, _conv2x2_x1)
        g = self.c1 + self.cp
        y_parts, p_parts = [None] * 4, [None] * 4
        h = None
        if self.collect is not None:
            self._record_c1(x)
        if self.int8_c1:
            # quantize the input once; both qx convs share it
            if self.split_at is not None:
                xq = (quantize_act(x[0], self.sx1),
                      quantize_act(x[1], self.sx1b))
            else:
                xq = quantize_act(x, self.sx1)
        for qx in range(2):
            if self.int8_c1:
                if self.split_at is not None:
                    v = (conv_i8(convs[qx], xq[0], self.k1p[qx][0],
                                 self.o1p[qx][0])
                         + conv_i8(convs[qx], xq[1], self.k1p[qx][1],
                                   self.o1p[qx][1]) + self.h1p)
                else:
                    v = conv_i8(convs[qx], xq, self.k1p[qx],
                                self.o1p[qx], self.h1p)
            else:
                v = self._in_conv(x, self.k1p[qx], conv=convs[qx]) + self.h1p
            h = v.shape[1] - 1
            for qy in range(2):
                blk = v[:, qy:qy + h, :, qy * g:(qy + 1) * g]
                y_parts[2 * qy + qx] = jax.nn.relu(blk[..., :self.c1])
                p_parts[2 * qy + qx] = blk[..., self.c1:]
        y1 = jnp.concatenate(y_parts, axis=-1)
        if self.collect is not None:
            self.collect[f"{self.name}.c2"] = self._cstat(y1)
        if self.int8_c2:
            y1q = quantize_act(y1, self.sx2)
        elif self.int8_c1:
            y1 = y1.astype(self.dtype)
        outs = [None] * 4
        for qx in range(2):
            if self.int8_c2:
                v2 = conv_i8(convs[qx], y1q, self.k2[qx], self.o2[qx],
                             self.h2)
            else:
                v2 = convs[qx](y1, self.k2[qx]) + self.h2
            for qy in range(2):
                q = 2 * qy + qx
                outs[q] = jax.nn.relu(
                    v2[:, qy:qy + h, :, qy * self.c2:(qy + 1) * self.c2]
                    + p_parts[q])
        return jnp.concatenate(outs, axis=-1).astype(self.dtype)


def _pool_s2d_to_direct(x_s2d):
    """maxpool 2x2 stride 2 of the underlying full-res tensor, from its s2d
    form: the pool windows are exactly the parity groups."""
    b, h, w, c4 = x_s2d.shape
    c = c4 // 4
    return jnp.max(x_s2d.reshape(b, h, w, 4, c), axis=3)


def pack_image_s2d(image_nhwc):
    """Host-side image packing for ``input_format='s2d'``: (B, H, W, 3) ->
    (B, H/2, W/2, 12), channel order (py, px, c). A free numpy transform
    on the host; on device the 3-channel NHWC tensor would be lane-padded
    42x (C pads to 128), so uploading the packed form makes the input
    read ~10x cheaper."""
    import numpy as np

    x = np.asarray(image_nhwc)
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(x.reshape(b, h // 2, w // 2, 4 * c))


# int8 stage sites that WIN on v5e (docs/profile_int8.py isolated probe +
# docs/profile_int8_ctx.py in-context A/B, docs/PERF.md round 3): every
# conv EXCEPT the thin-channel K-starved ones (inconv.c1 Cin=12,
# down1.c1/down3.c1 Cin<=64), which measured slower in int8. In-context:
# 38.4 -> 35.0 ms on the B=8 544^2 bench forward (+9.9%).
INT8_DEFAULT_SITES = (
    "inconv.c2", "down1.c2", "down2.c1", "down2.c2", "down3.c2",
    "down4.c1", "down4.c2", "up1.c1", "up1.c2", "up2.c1", "up2.c2",
    "up3.c1", "up3.c2", "up4.c1", "up4.c2")


def build_fast_resunet_forward(variables, *, dtype=jnp.bfloat16,
                               with_mask: bool = True,
                               input_format: str = "nhwc",
                               int8_sites=None, act_ranges=None,
                               collect_ranges: bool = False,
                               collect_quantile: float | None = None,
                               stage_forms: dict | None = None,
                               head_at_fullres: bool = False):
    """Returns fn(image) -> (embedding, mask_logits) matching
    ResidualUNet2DDeep.apply(variables, image, train=False)[4:6].

    input_format="s2d": the function takes a host-packed image
    (pack_image_s2d) instead of NHWC.

    int8_sites + act_ranges: run the named stage convs in int8
    (ops/quant.py; sites like "up4.c1"; act_ranges maps site -> calibrated
    max|activation|, from calibrate_int8_ranges). collect_ranges=True
    instead makes the returned fn yield (emb, mask, ranges) where ranges
    maps every candidate site to max|x| of the call (calibration mode).

    stage_forms: optional {stage: form} overriding the measured default
    per-stage kernel-form table (form in {False, "dense", "2x2",
    "pallas"}; stages "inconv", "down1"..."down4", "up1"..."up4"). The
    defaults were tuned at B=8 (docs/PERF.md); B=1 serving uses a
    separately measured table (docs/profile_b1_forms.py)."""
    import flax.linen as nn

    params = variables["params"]
    stats = variables["batch_stats"]
    int8_sites = frozenset(int8_sites or ())
    if int8_sites and not collect_ranges:
        missing = {s for s in int8_sites
                   if s not in (act_ranges or {})}
        if missing:
            raise ValueError(f"int8 sites lack calibrated ranges: {missing}")
    ranges_out: dict = {}

    def blk(scope, s2d, split_at=None):
        scales = {k[len(scope) + 1:]: v for k, v in (act_ranges or {}).items()
                  if k.startswith(scope + ".")}
        if f"{scope}.c1" in int8_sites and split_at is not None \
                and "c1b" not in scales:
            raise ValueError(f"{scope}.c1 is split; calibrate {scope}.c1b")
        return _BlockW(params[scope]["block"] if "block" in params[scope]
                       else params[scope],
                       stats[scope]["block"] if "block" in stats[scope]
                       else stats[scope], dtype, s2d, split_at=split_at,
                       name=scope,
                       int8_c1=f"{scope}.c1" in int8_sites,
                       int8_c2=f"{scope}.c2" in int8_sites,
                       scales=scales,
                       collect=ranges_out if collect_ranges else None,
                       collect_q=collect_quantile)

    f1 = params["down1"]["block"]["conv2"]["kernel"].shape[3]   # 32
    f2 = params["down2"]["block"]["conv2"]["kernel"].shape[3]   # 64
    f3 = params["down3"]["block"]["conv2"]["kernel"].shape[3]   # 128
    f4 = params["down4"]["block"]["conv2"]["kernel"].shape[3]   # 256

    # per-stage kernel form, measured on v5e (docs/PERF.md): 2x2 parity
    # kernels win at <=136^2; at 272^2 the extra slice/concat passes cost
    # more than the 2.25x FLOP reduction saves, so those stay dense.
    forms = {"inconv": "dense", "down1": "dense", "down2": "2x2",
             "down3": False, "down4": False, "up1": False, "up2": False,
             "up3": "2x2", "up4": "dense"}
    if stage_forms:
        unknown = set(stage_forms) - set(forms)
        if unknown:
            raise ValueError(f"unknown stage_forms keys: {unknown}")
        direct = {"down3", "down4", "up1", "up2"}
        bad = {k for k, v in stage_forms.items()
               if (k in direct) != (v is False)}
        if bad:
            raise ValueError(
                f"stage_forms layout mismatch for {bad}: stages "
                f"{sorted(direct)} are wired direct-resolution (form "
                f"False); the others take/produce s2d tensors "
                f"(form 'dense'|'2x2'|'pallas')")
        forms.update(stage_forms)
    b_in = blk("inconv", s2d=forms["inconv"])
    b_d1 = blk("down1", s2d=forms["down1"])
    b_d2 = blk("down2", s2d=forms["down2"])
    b_d3 = blk("down3", s2d=forms["down3"])
    b_d4 = blk("down4", s2d=forms["down4"])
    b_u1 = blk("up1", s2d=forms["up1"])
    b_u2 = blk("up2", s2d=forms["up2"], split_at=f4)
    b_u3 = blk("up3", s2d=forms["up3"], split_at=f3)
    b_u4 = blk("up4", s2d=forms["up4"], split_at=f2)

    def conv1x1(x, scope, f32_out=True):
        p = params[scope]
        y = jax.lax.dot_general(x, p["kernel"][0, 0].astype(x.dtype),
                                (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
        return y if f32_out else y.astype(x.dtype)

    mh_p = params.get("binary_seg")
    mh_s = stats.get("binary_seg")
    if mh_p is not None:
        mh_scale, mh_shift = _fold_bn(mh_p["bn"], mh_s["bn"],
                                      mh_p["conv1"].get("bias"))

    def mask_head_s2d(ys):
        """1x1-conv head applied per parity group in s2d space; only the
        2-channel logits ever materialize at full resolution."""
        if not with_mask or mh_p is None:
            return None
        b_, hh, ww, c4 = ys.shape
        c = c4 // 4
        xg = ys.reshape(b_, hh, ww, 4, c)
        h1 = jnp.einsum("bhwqi,io->bhwqo", xg,
                        mh_p["conv1"]["kernel"][0, 0].astype(ys.dtype),
                        preferred_element_type=jnp.float32)
        h1 = jax.nn.relu(h1 * mh_scale + mh_shift).astype(ys.dtype)
        out = jnp.einsum("bhwqi,io->bhwqo", h1,
                         mh_p["conv2"]["kernel"][0, 0].astype(ys.dtype),
                         preferred_element_type=jnp.float32)
        out = out + mh_p["conv2"]["bias"].astype(jnp.float32)
        return depth_to_space(out.reshape(b_, hh, ww, -1))

    def conv1x1_s2d(x_s2d, scope):
        """1x1 conv applied per parity group in s2d space. Output stays in
        the compute dtype: the fused affinity kernel upcasts per-tile, so
        a full-res f32 embedding never hits HBM on the fast path."""
        p = params[scope]
        w = p["kernel"][0, 0].astype(dtype)  # (Cin, Cout)
        cin, cout = w.shape
        b_, hh, ww, _ = x_s2d.shape
        xg = x_s2d.reshape(b_, hh, ww, 4, cin)
        y = jnp.einsum("bhwqi,io->bhwqo", xg, w,
                       preferred_element_type=jnp.float32)
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(x_s2d.dtype).reshape(b_, hh, ww, 4 * cout)

    def forward(image):
        if input_format == "s2d":
            # host-packed (B, H/2, W/2, 4*3) image (pack_image_s2d): the
            # NHWC image tensor never materializes on device — its 3
            # channels lane-pad 42x, so just reading it costs ~1.5 ms at
            # 544^2 B=8 (docs/PERF.md)
            xs = image.astype(dtype)
            h0, w0 = 2 * image.shape[1], 2 * image.shape[2]
        else:
            x = image.astype(dtype)
            h0, w0 = x.shape[1], x.shape[2]
            xs = space_to_depth(x)           # 544 stage in s2d @272
        assert h0 % 16 == 0 and w0 % 16 == 0, \
            "fast forward requires H, W divisible by 16"

        x1s = b_in(xs)                       # 4x16
        x2 = _pool_s2d_to_direct(b_d1(x1s))  # 272^2 x 32
        x2s = space_to_depth(x2)             # 272 stage in s2d @136
        x3 = _pool_s2d_to_direct(b_d2(x2s))  # 136^2 x 64
        x4 = nn.max_pool(b_d3(x3), (2, 2), strides=(2, 2))   # 68^2 x 128
        x5 = nn.max_pool(b_d4(x4), (2, 2), strides=(2, 2))   # 34^2 x 256

        y = upsample_align_corners(x5, axes=(1, 2), factors=(2, 2))
        y = b_u1(y)                          # 68^2 x 256

        # decoder skip concats stay VIRTUAL: upsampling is linear, so
        # up(concat(y, skip)) feeds the split block as (up(y), up(skip))
        y = replication_pad_to(y, x4.shape[1], x4.shape[2])
        y = b_u2((upsample_align_corners(y, axes=(1, 2), factors=(2, 2)),
                  upsample_align_corners(x4, axes=(1, 2), factors=(2, 2))))

        y = replication_pad_to(y, x3.shape[1], x3.shape[2])
        ys = b_u3((_upsample2x_to_s2d(y, dtype),
                   _upsample2x_to_s2d(x3, dtype)))   # s2d of 272^2 x 64

        y_d = depth_to_space(ys)
        y_d = replication_pad_to(y_d, x2.shape[1], x2.shape[2])
        ys = b_u4((_upsample2x_to_s2d(y_d, dtype),
                   _upsample2x_to_s2d(x2, dtype)))   # s2d of 544^2 x 32

        if head_at_fullres:
            # apply the (linear) 1x1 embedding head AFTER depth_to_space —
            # mathematically identical, but the layout constraint a
            # downstream Pallas affinity kernel imposes then lands on this
            # dot's output instead of back-propagating through the d2s
            # transposes into the up4 convs, which XLA otherwise demotes
            # to a T(2,128) fused-conv emitter costing ~4.4 ms at B=1
            # (docs/profile_b1_fix.py, PERF.md round 5)
            y4 = depth_to_space(ys)
            embedding = conv1x1(y4, "outconv_emb",
                                f32_out=False).astype(dtype)
        else:
            emb_s = conv1x1_s2d(ys, "outconv_emb")
            embedding = depth_to_space(emb_s)
        mask = mask_head_s2d(ys)
        if collect_ranges:
            return embedding, mask, dict(ranges_out)
        return embedding, mask

    return forward


def calibrate_int8_ranges(variables, images, *, dtype=jnp.bfloat16,
                          with_mask: bool = True,
                          input_format: str = "nhwc",
                          quantile: float | None = None):
    """Run the (non-quantized) fast forward over calibration batches and
    return {site: max|activation|} for every int8-candidate site. Feed the
    result to build_fast_resunet_forward(act_ranges=...). ``images`` is an
    iterable of batches in the given input_format. ``quantile`` switches
    the per-batch statistic from max|x| to that quantile of |x|
    (percentile clipping); batches are still aggregated by max."""
    fwd = build_fast_resunet_forward(variables, dtype=dtype,
                                     with_mask=with_mask,
                                     input_format=input_format,
                                     collect_ranges=True,
                                     collect_quantile=quantile)
    jfwd = jax.jit(lambda im: fwd(im)[2])
    ranges: dict = {}
    for im in images:
        batch_ranges = jax.device_get(jfwd(im))
        for k, v in batch_ranges.items():
            ranges[k] = max(ranges.get(k, 0.0), float(v))
    return ranges
