"""Constrained MALIS loss weighting (in-repo C++; malis-lib equivalent).

Mirrors the optional reference path (scripts_ac3ac4/utils/malis_loss.py,
loss/loss_malis.py malisWeight): per-edge weights = opt_weight * positive
maximin pair counts + (1 - opt_weight) * negative counts, each normalized by
its total; loss = sum(weight * (affs - gt)^2). Weights are computed on host
(sequential Kruskal), the weighted MSE itself runs on device.
"""

from __future__ import annotations

import numpy as np

from ._native import get_lib


def malis_weights(affs: np.ndarray, seg: np.ndarray,
                  opt_weight: float = 0.5) -> np.ndarray:
    """affs (3, D, H, W) predicted nearest-neighbor affinities; seg (D,H,W)."""
    lib = get_lib()
    affs = np.ascontiguousarray(affs, dtype=np.float32)
    seg = np.ascontiguousarray(seg, dtype=np.uint32)
    d, h, w = seg.shape
    out = np.zeros_like(affs)
    import ctypes

    fn = lib.malis_weights
    fn.restype = ctypes.c_int64
    fn.argtypes = [np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                   np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
                   ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                   ctypes.c_double,
                   np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    fn(affs.reshape(3, -1), seg.reshape(-1), d, h, w, float(opt_weight),
       out.reshape(3, -1))
    return out


def malis_loss(output_affs: np.ndarray, gt_affs: np.ndarray,
               seg: np.ndarray, opt_weight: float = 0.5) -> float:
    """Scalar MALIS loss (malis_loss.py:5-14 structure)."""
    weight = malis_weights(output_affs[:3], seg, opt_weight)
    return float(np.sum(weight * (output_affs[:3] - gt_affs[:3]) ** 2))
