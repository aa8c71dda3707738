"""Analytic FLOPs/roofline accounting (utils/flops.py) cross-checks.

The bench roofline fields are only as good as the MAC counts, so pin them
against ground truth: (a) the param counts derived by the counter must
equal the real Flax parameter trees, and (b) the FLOPs must agree with
XLA's own cost analysis of the compiled forward to within the share of
non-conv ops (BN/ELU/pool/upsample, excluded by convention).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from pixel_embedded_affinity_tpu.utils.flops import (
    chip_peaks, emb2aff2d_flops, resunet2d_flops, roofline_fields,
    unet3d_pni_flops)

pytestmark = pytest.mark.slow


def _n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


def test_resunet_param_count_matches_model():
    from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep

    nf = (8, 12, 16, 24, 32)
    model = ResidualUNet2DDeep(out_channels=2, nfeatures=nf, emd=8)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, _, params = resunet2d_flops(1, 32, 32, nfeatures=nf, emd=8)
    real = _n_params(variables["params"])
    # counter excludes biases and BN scale/shift: check within their share
    kernels = sum(
        np.prod(x.shape)
        for p, x in jax.tree_util.tree_leaves_with_path(variables["params"])
        if p[-1].key == "kernel")
    assert params == kernels


def test_pni_param_count_matches_model():
    from pixel_embedded_affinity_tpu.models.unet3d_pni import (
        UNetPNIEmbeddingDeep)

    model = UNetPNIEmbeddingDeep(filters=(4, 6, 8, 10, 12), emd=4)
    x = jnp.zeros((1, 4, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, _, params = unet3d_pni_flops(1, 4, 32, 32,
                                    filters=(4, 6, 8, 10, 12), emd=4)
    kernels = sum(
        np.prod(x.shape)
        for p, x in jax.tree_util.tree_leaves_with_path(variables["params"])
        if p[-1].key == "kernel")
    assert params == kernels


def test_resunet_flops_match_xla_cost_analysis():
    """XLA's cost analysis of the compiled forward agrees with the
    analytic conv count to within the non-conv share (<12% at this
    shape)."""
    from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep

    nf = (8, 12, 16, 24, 32)
    model = ResidualUNet2DDeep(out_channels=2, nfeatures=nf, emd=8)
    x = jnp.zeros((1, 64, 48, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ca = fn.lower(variables, x).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_flops = float(ca.get("flops", 0.0))
    if xla_flops <= 0:
        pytest.skip("backend exposes no flops in cost_analysis")
    ours, _, _ = resunet2d_flops(1, 64, 48, nfeatures=nf, emd=8)
    assert ours <= xla_flops * 1.02  # we never overcount the real graph
    assert ours >= xla_flops * 0.80  # convs dominate


def test_roofline_fields_and_peaks():
    assert chip_peaks("TPU v5 lite0") == (197e12, 394e12, 819e9)
    assert chip_peaks("Tesla V100") is None
    f = roofline_fields(197e12 * 0.5, 819e9 * 0.25, 1.0, "TPU v5 lite")
    assert f["mfu_pct"] == 50.0 and f["hbm_bw_pct"] == 25.0
    # int8 roof is 2x
    f8 = roofline_fields(394e12 * 0.5, 0, 1.0, "TPU v5 lite", dtype="int8")
    assert f8["mfu_pct"] == 50.0
    assert roofline_fields(1, 1, 1.0, "unknown chip") == {}


def test_emb2aff_flops_scale():
    f1, b1 = emb2aff2d_flops(1, 100, 100)
    f2, b2 = emb2aff2d_flops(2, 100, 100)
    assert f2 == 2 * f1 and b2 == 2 * b1
    assert b1 == 100 * 100 * 10 * 4
