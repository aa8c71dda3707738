"""int8 post-training quantization helpers for the inference fast path.

The v5e MXU runs int8 matmuls at 2x bf16 peak and int8 activations halve
HBM traffic; docs/profile_int8.py measured 1.3-1.6x conv speedups at the
fat decoder shapes of the ResUNet fast forward (and losses at thin-channel
shapes, hence per-stage opt-in). Scheme: symmetric int8,

* weights: per-output-channel scales over the PREPARED kernel (after BN
  folding and the s2d transform), so quantization composes with every
  kernel form in models/fast_forward.py;
* activations: one static per-tensor scale, calibrated as max|x| observed
  at that site over calibration batches (collect_ranges mode of the fast
  forward). Max-calibration never clips on the calibration data; post-ReLU
  sites are non-negative so the effective resolution is 7 bits.

The int32 conv accumulator is exact; the only error sources are the two
roundings. The reference has no quantized path (it runs f32 torch,
README.md:20); this is a TPU-deployment extra, default OFF, gated by the
quality checks in tests/test_int8_quant.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weights_per_cout(w):
    """(..., Cout) f32 kernel -> (int8 kernel, f32 per-channel scale).

    Symmetric: wq = round(w / s), s[c] = max|w[..., c]| / 127.
    """
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def act_scale_from_absmax(absmax: float) -> float:
    """Static activation scale from a calibrated max|x|."""
    return max(float(absmax), 1e-12) / 127.0


def quantize_act(x, scale):
    """f32/bf16 activation -> int8 with a static per-tensor scale."""
    y = x.astype(jnp.float32) * (1.0 / scale)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def conv_i8(conv_fn, x_q, w_q, out_scale, shift=None):
    """int8 conv via the given lax conv partial; returns f32.

    out_scale: f32 per-output-channel (s_w[c] * s_x); shift: f32 bias added
    after rescaling (the folded-BN shift). XLA fuses the rescale+shift into
    the conv output epilogue.
    """
    acc = conv_fn(x_q, w_q, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * out_scale
    if shift is not None:
        y = y + shift
    return y
