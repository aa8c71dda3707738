"""MALIS weighting tests (constrained maximin pair counting)."""

import numpy as np

from pixel_embedded_affinity_tpu.postproc.malis import malis_weights, malis_loss
from pixel_embedded_affinity_tpu.ops.affinity_np import seg_to_aff_3d


def two_segment_volume():
    seg = np.zeros((4, 12, 12), np.int64)
    seg[:, :6] = 1
    seg[:, 6:] = 2
    return seg


def test_malis_weights_normalized():
    seg = two_segment_volume()
    gt = seg_to_aff_3d(seg, pad="")
    w = malis_weights(gt, seg, opt_weight=0.5)
    assert w.shape == gt.shape
    # pos and neg counts each normalized to 1; 0.5/0.5 blend sums to 1
    assert abs(w.sum() - 1.0) < 1e-5
    assert (w >= 0).all()


def test_malis_loss_zero_on_perfect_and_positive_on_error():
    seg = two_segment_volume()
    gt = seg_to_aff_3d(seg, pad="")
    assert malis_loss(gt, gt, seg) == 0.0
    pred = gt.copy()
    pred[1, :, 6, :] = 1.0  # false merge across the true boundary
    assert malis_loss(pred, gt, seg) > 0

    pred2 = gt.copy()
    pred2[2, :, :, 3] = 0.0  # false split inside segment 1
    assert malis_loss(pred2, gt, seg) > 0


def test_malis_maximin_concentration():
    """The negative weight concentrates on the maximin (boundary) edges."""
    seg = two_segment_volume()
    gt = seg_to_aff_3d(seg, pad="")
    w = malis_weights(gt, seg, opt_weight=0.0)  # negative pass only
    # all negative mass must sit on edges crossing y=6 (the only boundary)
    boundary_mass = w[1, :, 6, :].sum()
    assert abs(boundary_mass - w.sum()) < 1e-6
