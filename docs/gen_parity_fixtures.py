"""Generate committed golden parity fixtures from the reference torch models.

Run ONCE in an environment with torch + the reference checkout at
/root/reference; writes tests/fixtures/*.npz containing tiny random-init
torch state_dicts, an input, and the reference eval-mode outputs (including
reference embedding2affs affinities for the 2D model). The repo's parity
tests (tests/test_model_parity.py fixture tier) then witness
checkpoint-level parity WITHOUT needing torch or the reference checkout.

UNet3D_MALA has no width knobs (a tiny state_dict is impossible), so its
parity remains covered by the live-torch test only.
"""

import os
import sys

import numpy as np
import torch

REF_CVPPP = "/root/reference/scripts_cvppp"
REF_AC3 = "/root/reference/scripts_ac3ac4"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def _load_ref_module(scripts_dir, relpath, name):
    import importlib.util

    if scripts_dir not in sys.path:
        sys.path.insert(0, scripts_dir)
    spec = importlib.util.spec_from_file_location(
        name, f"{scripts_dir}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def gen_resunet2d():
    ref = _load_ref_module(REF_CVPPP, "model/unet2d_residual.py", "g_unet2d")
    loss = _load_ref_module(REF_CVPPP, "loss/loss_embedding_mse.py", "g_loss")
    torch.manual_seed(0)
    m = ref.ResidualUNet2D_deep(in_channels=3, out_channels=2,
                                nfeatures=[8, 12, 16, 24, 32], emd=8)
    m.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        outs = m(x)
        # reference inference affinity path (embedding2affs, circular roll)
        offsets = [[-1, 0], [0, -1], [-3, 0], [0, -3], [-9, 0], [0, -9]]
        affs = loss.embedding2affs(outs[4], offsets)
    blob = {f"sd/{k}": v.numpy() for k, v in m.state_dict().items()}
    blob["input"] = x.numpy()
    for i, o in enumerate(outs):
        blob[f"out/{i}"] = o.numpy()
    blob["affs"] = affs.numpy()
    blob["offsets"] = np.asarray(offsets, np.int32)
    np.savez_compressed(os.path.join(OUT, "resunet2d_deep.npz"), **blob)
    print("resunet2d_deep.npz:",
          os.path.getsize(os.path.join(OUT, "resunet2d_deep.npz")) // 1024,
          "KB")


def gen_unet_pni():
    ref = _load_ref_module(REF_AC3, "model/model_superhuman.py", "g_pni")
    torch.manual_seed(1)
    m = ref.UNet_PNI_embedding_deep(in_planes=1, filters=[8, 12, 16, 24, 32],
                                    upsample_mode="bilinear",
                                    merge_mode="add", emd=8)
    m.eval()
    x = torch.randn(1, 1, 18, 64, 64)
    with torch.no_grad():
        outs = m(x)
    blob = {f"sd/{k}": v.numpy() for k, v in m.state_dict().items()}
    blob["input"] = x.numpy()
    for i, o in enumerate(outs):
        blob[f"out/{i}"] = o.numpy()
    np.savez_compressed(os.path.join(OUT, "unet_pni_deep.npz"), **blob)
    print("unet_pni_deep.npz:",
          os.path.getsize(os.path.join(OUT, "unet_pni_deep.npz")) // 1024,
          "KB")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_resunet2d()
    gen_unet_pni()
