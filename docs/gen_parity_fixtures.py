"""Generate committed golden parity fixtures from the reference torch models.

Run ONCE in an environment with torch + the reference checkout at
/root/reference; writes tests/fixtures/*.npz containing tiny random-init
torch state_dicts, an input, and the reference eval-mode outputs (including
reference embedding2affs affinities for the 2D model). The repo's parity
tests (tests/test_model_parity.py fixture tier) then witness
checkpoint-level parity WITHOUT needing torch or the reference checkout.

The reference UNet3D_MALA hardcodes widths (12, 60, 300, 1500)
(scripts_ac3ac4/model/unet3d_mala.py:221-252) — a full-width state_dict is
~250 MB and cannot be committed. ``gen_mala`` therefore builds a
width-parametrized torch twin of the reference topology (same layer names,
ops and valid-conv geometry; only the channel counts are knobs) at widths
(2, 3, 4, 5) and minimal valid spatial size (29, 214, 214) -> out
(1, 2, 2). The geometry delta vs the reference's (53, 268, 268) ->
(25, 56, 56) is width+spatial only; every structural element (3 pools,
grouped transposed-conv ups, crop-and-concat, LeakyReLU 0.005) is
identical, so the fixture still witnesses converter+forward parity.
Full-width parity additionally remains covered by the live-torch test.
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


def gen_mala(widths=(2, 3, 4, 5), emd=4):
    """Reduced-geometry MALA golden (see module docstring)."""
    import torch.nn as tnn

    n1, n2, n3, n4 = widths

    class MalaTwin(tnn.Module):
        """Width-parametrized restatement of UNet3D_MALA_deep's topology
        (unet3d_mala.py:214-316): layer names match the reference state_dict
        schema so convert_unet3d_mala_deep applies unchanged."""

        def __init__(self):
            super().__init__()
            c3 = lambda i, o: tnn.Conv3d(i, o, 3, padding=0)
            c1 = lambda i, o: tnn.Conv3d(i, o, 1, padding=0)
            up = lambda c: tnn.ConvTranspose3d(c, c, (1, 3, 3),
                                               stride=(1, 3, 3), groups=c,
                                               bias=False)
            self.conv1, self.conv2 = c3(1, n1), c3(n1, n1)
            self.conv3, self.conv4 = c3(n1, n2), c3(n2, n2)
            self.conv5, self.conv6 = c3(n2, n3), c3(n3, n3)
            self.conv7, self.conv8 = c3(n3, n4), c3(n4, n4)
            self.dconv1, self.conv9 = up(n4), c1(n4, n3)
            self.conv10, self.conv11 = c3(2 * n3, n3), c3(n3, n3)
            self.dconv2, self.conv12 = up(n3), c1(n3, n2)
            self.conv13, self.conv14 = c3(2 * n2, n2), c3(n2, n2)
            self.dconv3, self.conv15 = up(n2), c1(n2, n1)
            self.conv16, self.conv17 = c3(2 * n1, n1), c3(n1, n1)
            self.conv18 = c1(n1, emd)
            self.pool = tnn.MaxPool3d((1, 3, 3), stride=(1, 3, 3))

        @staticmethod
        def _crop_cat(up, bypass):
            dz = (bypass.shape[2] - up.shape[2]) // 2
            dy = (bypass.shape[3] - up.shape[3]) // 2
            dx = (bypass.shape[4] - up.shape[4]) // 2
            b = bypass[:, :, dz:bypass.shape[2] - dz,
                       dy:bypass.shape[3] - dy, dx:bypass.shape[4] - dx]
            return torch.cat([up, b], dim=1)

        def forward(self, x):
            act = lambda t: tnn.functional.leaky_relu(t, 0.005)
            c2 = act(self.conv2(act(self.conv1(x))))
            c4 = act(self.conv4(act(self.conv3(self.pool(c2)))))
            c6 = act(self.conv6(act(self.conv5(self.pool(c4)))))
            c8 = act(self.conv8(act(self.conv7(self.pool(c6)))))
            m1 = self._crop_cat(self.conv9(self.dconv1(c8)), c6)
            c11 = act(self.conv11(act(self.conv10(m1))))
            m2 = self._crop_cat(self.conv12(self.dconv2(c11)), c4)
            c14 = act(self.conv14(act(self.conv13(m2))))
            m3 = self._crop_cat(self.conv15(self.dconv3(c14)), c2)
            c17 = act(self.conv17(act(self.conv16(m3))))
            return self.conv18(c17)

    torch.manual_seed(3)
    m = MalaTwin()
    m.eval()
    # the input is reproduced at test time from this numpy seed (storing
    # the 5 MB random volume would dominate the fixture)
    x_np = np.random.default_rng(7).standard_normal(
        (1, 1, 29, 214, 214)).astype(np.float32)
    x = torch.from_numpy(x_np)
    with torch.no_grad():
        out = m(x)
    blob = {f"sd/{k}": v.numpy() for k, v in m.state_dict().items()
            if "pool" not in k}
    blob["input_seed"] = np.asarray([7], np.int64)
    blob["input_shape"] = np.asarray(x_np.shape, np.int64)
    blob["out/0"] = out.numpy()
    blob["widths"] = np.asarray(widths, np.int32)
    blob["emd"] = np.asarray([emd], np.int32)
    np.savez_compressed(os.path.join(OUT, "unet3d_mala_small.npz"), **blob)
    print("unet3d_mala_small.npz:",
          os.path.getsize(os.path.join(OUT, "unet3d_mala_small.npz")) // 1024,
          "KB")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_resunet2d()
    gen_unet_pni()
    gen_mala()
