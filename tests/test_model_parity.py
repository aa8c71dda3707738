"""Numerical parity: Flax models + converters vs the reference torch models.

The reference implementations are loaded from /root/reference (read-only) at
test time purely as an oracle; random torch weights are converted with
train/convert_torch.py and eval-mode outputs compared.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_CVPPP = "/root/reference/scripts_cvppp"
REF_AC3 = "/root/reference/scripts_ac3ac4"

from pixel_embedded_affinity_tpu.models import (
    ResidualUNet2DDeep, UNetPNIEmbeddingDeep, UNet3DMALADeep,
)
from pixel_embedded_affinity_tpu.train.convert_torch import (
    convert_resunet2d_deep, convert_unet_pni_deep, convert_unet3d_mala_deep,
    to_jax_variables,
)


def _load_ref_module(scripts_dir, relpath, name):
    import importlib.util

    if scripts_dir not in sys.path:
        sys.path.insert(0, scripts_dir)
    spec = importlib.util.spec_from_file_location(name, f"{scripts_dir}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_resunet2d_deep_parity():
    ref = _load_ref_module(REF_CVPPP, "model/unet2d_residual.py", "ref_unet2d")
    torch.manual_seed(0)
    tmodel = ref.ResidualUNet2D_deep(in_channels=3, out_channels=2,
                                     nfeatures=[16, 32, 64, 128, 256], emd=16)
    tmodel.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        touts = tmodel(x)

    variables = to_jax_variables(convert_resunet2d_deep(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}))
    jmodel = ResidualUNet2DDeep(out_channels=2, nfeatures=(16, 32, 64, 128, 256),
                                emd=16)
    jx = np.transpose(x.numpy(), (0, 2, 3, 1))
    jouts = jmodel.apply(variables, jx, train=False)

    assert len(jouts) == 6
    for t, j in zip(touts, jouts):
        t = t.numpy()
        j = np.transpose(np.asarray(j), (0, 3, 1, 2))
        assert t.shape == j.shape, (t.shape, j.shape)
        np.testing.assert_allclose(j, t, atol=2e-4, rtol=1e-3)


def test_unet_pni_deep_parity():
    ref = _load_ref_module(REF_AC3, "model/model_superhuman.py", "ref_pni")
    torch.manual_seed(1)
    tmodel = ref.UNet_PNI_embedding_deep(in_planes=1, filters=[28, 36, 48, 64, 80],
                                         upsample_mode="bilinear",
                                         merge_mode="add", emd=16)
    tmodel.eval()
    x = torch.randn(1, 1, 18, 64, 64)
    with torch.no_grad():
        touts = tmodel(x)

    variables = to_jax_variables(convert_unet_pni_deep(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}))
    jmodel = UNetPNIEmbeddingDeep(filters=(28, 36, 48, 64, 80), emd=16)
    jx = np.transpose(x.numpy(), (0, 2, 3, 4, 1))
    jouts = jmodel.apply(variables, jx, train=False)

    assert len(jouts) == 5
    for t, j in zip(touts, jouts):
        t = t.numpy()
        j = np.transpose(np.asarray(j), (0, 4, 1, 2, 3))
        assert t.shape == j.shape, (t.shape, j.shape)
        # ~30 BN/ELU layers + trilinear gathers accumulate more f32 drift
        np.testing.assert_allclose(j, t, atol=1.5e-3, rtol=1e-2)


def test_unet3d_mala_deep_parity():
    ref = _load_ref_module(REF_AC3, "model/unet3d_mala.py", "ref_mala")
    torch.manual_seed(2)
    tmodel = ref.UNet3D_MALA_deep(emd=16)
    tmodel.eval()
    # valid-conv arithmetic needs xy sizes with exact /3 pools; 241 is the
    # smallest reference-like size: 241 -> 79 -> 25 -> 7 -> up -> out 29
    x = torch.randn(1, 1, 53, 241, 241)
    with torch.no_grad():
        tout = tmodel(x)

    variables = to_jax_variables(convert_unet3d_mala_deep(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}))
    jmodel = UNet3DMALADeep(emd=16)
    jx = np.transpose(x.numpy(), (0, 2, 3, 4, 1))
    jout = jmodel.apply(variables, jx, train=False)
    j = np.transpose(np.asarray(jout), (0, 4, 1, 2, 3))
    assert j.shape == tuple(tout.shape), (j.shape, tuple(tout.shape))
    np.testing.assert_allclose(j, tout.numpy(), atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Committed golden fixtures (no torch / reference checkout needed): tiny
# random-init torch state_dicts + eval outputs generated ONCE by
# docs/gen_parity_fixtures.py. Locks checkpoint-level parity in-repo
# (BASELINE "reproduce reference-checkpoint affinity outputs").
# ---------------------------------------------------------------------------

import os

pytestmark = pytest.mark.slow

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load_fixture(name):
    path = os.path.join(FIXTURES, name)
    data = np.load(path)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd/")}
    outs = [data[f"out/{i}"] for i in range(len(
        [k for k in data.files if k.startswith("out/")]))]
    return data, sd, outs


def test_resunet2d_fixture_parity():
    data, sd, outs = _load_fixture("resunet2d_deep.npz")
    variables = to_jax_variables(convert_resunet2d_deep(sd))
    jmodel = ResidualUNet2DDeep(out_channels=2, nfeatures=(8, 12, 16, 24, 32),
                                emd=8)
    jx = np.transpose(data["input"], (0, 2, 3, 1))
    jouts = jmodel.apply(variables, jx, train=False)
    for t, j in zip(outs, jouts):
        j = np.transpose(np.asarray(j), (0, 3, 1, 2))
        np.testing.assert_allclose(j, t, atol=2e-4, rtol=1e-3)

    # reference embedding2affs golden (circular-roll semantics)
    from pixel_embedded_affinity_tpu.ops import embedding_to_affinity_2d

    emb = jouts[4]
    affs = embedding_to_affinity_2d(emb, data["offsets"], padding="circular")
    np.testing.assert_allclose(np.asarray(affs), data["affs"], atol=2e-4,
                               rtol=1e-3)


def test_unet_pni_fixture_parity():
    data, sd, outs = _load_fixture("unet_pni_deep.npz")
    variables = to_jax_variables(convert_unet_pni_deep(sd))
    jmodel = UNetPNIEmbeddingDeep(filters=(8, 12, 16, 24, 32), emd=8)
    jx = np.transpose(data["input"], (0, 2, 3, 4, 1))
    jouts = jmodel.apply(variables, jx, train=False)
    for t, j in zip(outs, jouts):
        j = np.transpose(np.asarray(j), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(j, t, atol=1.5e-3, rtol=1e-2)


def test_unet3d_mala_fixture_parity():
    """Reduced-geometry MALA golden (docs/gen_parity_fixtures.py:gen_mala):
    widths (2,3,4,5) instead of the reference's hardcoded (12,60,300,1500),
    minimal valid-conv input (29,214,214) -> out (1,2,2). Same topology,
    layer names and converter — parity protection without torch."""
    data, sd, outs = _load_fixture("unet3d_mala_small.npz")
    variables = to_jax_variables(convert_unet3d_mala_deep(sd))
    widths = tuple(int(v) for v in data["widths"])
    emd = int(data["emd"][0])
    jmodel = UNet3DMALADeep(emd=emd, widths=widths)
    x = np.random.default_rng(int(data["input_seed"][0])).standard_normal(
        tuple(data["input_shape"])).astype(np.float32)
    jx = np.transpose(x, (0, 2, 3, 4, 1))
    jout = jmodel.apply(variables, jx, train=False)
    j = np.transpose(np.asarray(jout), (0, 4, 1, 2, 3))
    assert j.shape == outs[0].shape, (j.shape, outs[0].shape)
    np.testing.assert_allclose(j, outs[0], atol=2e-4, rtol=1e-3)
