"""int8 quantized fast-forward path (ops/quant.py + fast_forward int8).

The int8 path is deliberately inexact (8-bit rounding); these tests pin
(a) the quantization helpers exactly, (b) calibration-range collection,
(c) closeness of the quantized forward to the f32 forward on realistic
magnitudes, measured on the L2-NORMALIZED embedding (what the affinity
decode consumes — scale errors wash out under normalization).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
from pixel_embedded_affinity_tpu.models.fast_forward import (
    INT8_DEFAULT_SITES, build_fast_resunet_forward, calibrate_int8_ranges)
from pixel_embedded_affinity_tpu.ops.quant import (
    act_scale_from_absmax, quantize_act, quantize_weights_per_cout)

pytestmark = pytest.mark.slow


def test_quantize_weights_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 24)).astype(np.float32))
    wq, s = quantize_weights_per_cout(w)
    assert wq.dtype == jnp.int8
    deq = wq.astype(jnp.float32) * s
    # symmetric round-to-nearest: error <= scale/2 per element
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(s)[None, None, None, :] / 2 + 1e-7
    assert (err <= bound).all()


def test_quantize_act_saturates_and_rounds():
    s = act_scale_from_absmax(2.54)
    x = jnp.asarray([0.0, 0.01, 2.54, -2.54, 99.0, -99.0], jnp.float32)
    q = np.asarray(quantize_act(x, s))
    assert q.dtype == np.int8
    assert q[0] == 0 and q[2] == 127 and q[3] == -127
    assert q[4] == 127 and q[5] == -127  # clipped, no wraparound


def _tiny_setup(seed=3):
    rng = np.random.default_rng(seed)
    model = ResidualUNet2DDeep(out_channels=2, nfeatures=(8, 12, 16, 24, 32),
                               emd=8)
    x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables, x


def test_collect_ranges_covers_all_candidate_sites():
    variables, x = _tiny_setup()
    ranges = calibrate_int8_ranges(variables, [x], dtype=jnp.float32)
    stages = ("inconv", "down1", "down2", "down3", "down4",
              "up1", "up2", "up3", "up4")
    for st in stages:
        assert f"{st}.c1" in ranges and f"{st}.c2" in ranges, st
    # split stages expose the second input part too
    for st in ("up2", "up3", "up4"):
        assert f"{st}.c1b" in ranges, st
    assert all(v > 0 for v in ranges.values())
    assert set(INT8_DEFAULT_SITES) <= set(ranges)


def test_int8_forward_close_to_f32_on_normalized_embedding():
    variables, x = _tiny_setup()
    f32_fwd = build_fast_resunet_forward(variables, dtype=jnp.float32)
    ranges = calibrate_int8_ranges(variables, [x], dtype=jnp.float32)
    q_fwd = build_fast_resunet_forward(
        variables, dtype=jnp.float32,
        int8_sites=INT8_DEFAULT_SITES, act_ranges=ranges)

    def norm(e):
        e = np.asarray(e, np.float64)
        return e / np.maximum(
            np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)

    emb_f, mask_f = f32_fwd(x)
    emb_q, mask_q = q_fwd(x)
    # cosine agreement of the embeddings that feed the affinity decode
    cos = (norm(emb_f) * norm(emb_q)).sum(-1)
    assert cos.min() > 0.99, cos.min()
    # mask head argmax unchanged on all but a sliver of pixels
    agree = (np.asarray(mask_f).argmax(-1)
             == np.asarray(mask_q).argmax(-1)).mean()
    assert agree > 0.995, agree


def test_int8_on_converted_torch_fixture_weights():
    """int8 closeness on REAL (torch-converted) weights, not random init:
    the committed parity fixture's weights through the quantized fast
    forward must track the f32 fast forward on the normalized embedding
    and the derived affinities."""
    import os

    from pixel_embedded_affinity_tpu.ops import embedding_to_affinity_2d
    from pixel_embedded_affinity_tpu.train.convert_torch import (
        convert_resunet2d_deep, to_jax_variables)

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "resunet2d_deep.npz")
    data = np.load(path)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    variables = to_jax_variables(convert_resunet2d_deep(sd))
    x = np.transpose(data["input"], (0, 2, 3, 1))

    f32_fwd = build_fast_resunet_forward(variables, dtype=jnp.float32)
    ranges = calibrate_int8_ranges(variables, [x], dtype=jnp.float32)
    q_fwd = build_fast_resunet_forward(
        variables, dtype=jnp.float32,
        int8_sites=INT8_DEFAULT_SITES, act_ranges=ranges)

    emb_f, _ = f32_fwd(x)
    emb_q, _ = q_fwd(x)
    offsets = tuple(map(tuple, data["offsets"]))
    aff_f = np.asarray(embedding_to_affinity_2d(emb_f, offsets,
                                                padding="circular"))
    aff_q = np.asarray(embedding_to_affinity_2d(emb_q, offsets,
                                                padding="circular"))
    # affinities are cosine similarities in [-1, 1]; int8 rounding must
    # stay far below any decode threshold's resolution
    assert np.abs(aff_f - aff_q).max() < 0.05
    assert np.abs(aff_f - aff_q).mean() < 0.005


def test_int8_requires_calibrated_ranges():
    variables, _ = _tiny_setup()
    with pytest.raises(ValueError, match="lack calibrated ranges"):
        build_fast_resunet_forward(variables, dtype=jnp.float32,
                                   int8_sites=("up4.c1",), act_ranges={})


def test_calibration_quantile_and_k_image():
    """Percentile calibration (quantile < 1) yields per-site statistics
    <= the max-calibrated ones and still > 0; multi-image calibration
    aggregates by max over batches (r4 hardening: k-image + percentile
    clipping, model.int8_calib_k / int8_calib_pct)."""
    variables, x = _tiny_setup()
    mx = calibrate_int8_ranges(variables, [x], dtype=jnp.float32)
    q = calibrate_int8_ranges(variables, [x], dtype=jnp.float32,
                              quantile=0.99)
    assert set(q) == set(mx)
    assert all(q[k] <= mx[k] + 1e-6 for k in mx)
    assert all(v > 0 for v in q.values())
    assert any(q[k] < mx[k] * 0.999 for k in mx)  # the quantile bites

    x2 = x * 2.0
    both = calibrate_int8_ranges(variables, [x, x2], dtype=jnp.float32)
    only2 = calibrate_int8_ranges(variables, [x2], dtype=jnp.float32)
    for k in both:
        assert both[k] == pytest.approx(max(mx[k], only2[k]), rel=1e-6)
