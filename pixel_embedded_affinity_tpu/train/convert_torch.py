"""PyTorch checkpoint -> Flax variables converters.

Maps the reference's released checkpoints (torch.save of
{'current_iter', 'valid_result', 'model_weights'}; see
scripts_cvppp/main.py:453-457 and the DataParallel 'module.' prefix strip in
scripts_cvppp/inference.py:105-115) onto the parameter trees of our Flax
models, so reference-trained weights evaluate bit-comparably here.

Conventions: torch Conv2d/3d weight (O, I, *k) -> flax kernel (*k, I, O);
BatchNorm weight/bias -> scale/bias, running stats -> batch_stats.
"""

from __future__ import annotations

import re

import numpy as np


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    # (O, I, *k) -> (*k, I, O)
    perm = tuple(range(2, w.ndim)) + (1, 0)
    out = {"kernel": np.transpose(w, perm)}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"], dtype=np.float32)
    return out


def _bn(sd, key):
    params = {"scale": np.asarray(sd[f"{key}.weight"], dtype=np.float32),
              "bias": np.asarray(sd[f"{key}.bias"], dtype=np.float32)}
    stats = {"mean": np.asarray(sd[f"{key}.running_mean"], dtype=np.float32),
             "var": np.asarray(sd[f"{key}.running_var"], dtype=np.float32)}
    return params, stats


def strip_module_prefix(sd: dict) -> dict:
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def load_torch_state_dict(path: str) -> dict:
    """Load a reference ckpt file into a numpy state dict (CPU, no grad)."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck.get("model_weights", ck) if isinstance(ck, dict) else ck
    sd = strip_module_prefix(sd)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _residual_block(sd, prefix):
    """Reference ResidualBlock: conv=[Conv,BN,ReLU,Conv,BN], project=[Conv,BN]."""
    p, s = {}, {}
    p["conv1"] = _conv(sd, f"{prefix}.conv.0")
    p["bn1"], s["bn1"] = _bn(sd, f"{prefix}.conv.1")
    p["conv2"] = _conv(sd, f"{prefix}.conv.3")
    p["bn2"], s["bn2"] = _bn(sd, f"{prefix}.conv.4")
    p["project_conv"] = _conv(sd, f"{prefix}.project.0")
    p["project_bn"], s["project_bn"] = _bn(sd, f"{prefix}.project.1")
    return p, s


def convert_resunet2d_deep(sd: dict) -> dict:
    """state_dict of ResidualUNet2D_deep -> flax variables for ResidualUNet2DDeep."""
    params, stats = {}, {}

    def put(name, pair):
        p, s = pair
        params[name] = p
        stats[name] = s

    put("inconv", _residual_block(sd, "inconv.conv"))
    for i in range(1, 5):
        p, s = _residual_block(sd, f"down{i}.block")
        params[f"down{i}"] = {"block": p}
        stats[f"down{i}"] = {"block": s}
    for i in range(1, 5):
        p, s = _residual_block(sd, f"up{i}_emb.block")
        params[f"up{i}"] = {"block": p}
        stats[f"up{i}"] = {"block": s}
    for i in range(1, 5):
        params[f"outconv{i}"] = _conv(sd, f"outconv{i}.conv")
    params["outconv_emb"] = _conv(sd, "outconv_emb.conv")

    seg_p = {"conv1": _conv(sd, "binary_seg.0"),
             "conv2": _conv(sd, "binary_seg.3")}
    bn_p, bn_s = _bn(sd, "binary_seg.1")
    seg_p["bn"] = bn_p
    params["binary_seg"] = seg_p
    stats["binary_seg"] = {"bn": bn_s}

    return {"params": params, "batch_stats": stats}


def _res_block_pni(sd, prefix):
    p, s = {}, {}
    p["conv_in"] = _conv(sd, f"{prefix}.block1.0")
    p["bn_in"], s["bn_in"] = _bn(sd, f"{prefix}.block1.1")
    p["conv1"] = _conv(sd, f"{prefix}.block2.0")
    p["bn1"], s["bn1"] = _bn(sd, f"{prefix}.block2.1")
    p["conv2"] = _conv(sd, f"{prefix}.block2.3")
    p["bn_out"], s["bn_out"] = _bn(sd, f"{prefix}.block3")
    return p, s


def convert_unet_pni_deep(sd: dict) -> dict:
    """state_dict of UNet_PNI_embedding_deep -> flax variables."""
    params, stats = {}, {}
    params["embed_in"] = _conv(sd, "embed_in.0")
    params["embed_out"] = _conv(sd, "embed_out.0")
    for name in ["conv0", "conv1", "conv2", "conv3", "center",
                 "conv4", "conv5", "conv6", "conv7"]:
        p, s = _res_block_pni(sd, name)
        params[name] = p
        stats[name] = s
    for i in range(4):
        params[f"up{i}"] = {"conv": _conv(sd, f"up{i}.1")}
        bn_p, bn_s = _bn(sd, f"cat{i}.0")
        params[f"cat{i}"] = {"bn": bn_p}
        stats[f"cat{i}"] = {"bn": bn_s}
    for name in ["out_put", "out_put1", "out_put2", "out_put3", "out_put4"]:
        params[name] = _conv(sd, f"{name}.0")
    return {"params": params, "batch_stats": stats}


def convert_unet3d_mala_deep(sd: dict) -> dict:
    """state_dict of UNet3D_MALA_deep -> flax variables (no BN in this net)."""
    params = {}
    for i in range(1, 19):
        params[f"conv{i}"] = _conv(sd, f"conv{i}")
    for i in range(1, 4):
        w = np.asarray(sd[f"dconv{i}.weight"], dtype=np.float32)
        # torch grouped ConvTranspose3d weight (C, 1, 1, 3, 3) -> (3, 3, C)
        params[f"dconv{i}"] = {"kernel": np.transpose(w[:, 0, 0], (1, 2, 0))}
    return {"params": params}


def to_jax_variables(tree: dict):
    """numpy pytree -> jnp pytree."""
    import jax.numpy as jnp
    import jax

    return jax.tree_util.tree_map(jnp.asarray, tree)
