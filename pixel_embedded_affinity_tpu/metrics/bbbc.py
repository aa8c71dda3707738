"""BBBC039V1 nuclei metrics: AJI, pixel F1, panoptic quality.

Parity with scripts_bbbc039v1/utils/metrics_bbbc.py, including AJI's
sequential used-prediction bookkeeping (agg_jc_index:11-61) and fast-PQ's
unique >0.5-IoU pairing (get_fast_pq:120-213), reimplemented on a contingency
matrix instead of per-instance full-image masks.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def _overlap_matrix(gt: np.ndarray, pred: np.ndarray):
    gt = gt.reshape(-1).astype(np.int64)
    pred = pred.reshape(-1).astype(np.int64)
    ng = int(gt.max()) + 1
    np_ = int(pred.max()) + 1
    o = np.bincount(gt * np_ + pred, minlength=ng * np_).reshape(ng, np_)
    return o


def agg_jc_index(gt_ins: np.ndarray, pred: np.ndarray) -> float:
    """Aggregated Jaccard index; GT instances 1..G processed in id order,
    each matched to the argmax-IoU prediction (used preds give IoU with
    intersection 0 / union = gt size); unused predictions' pixels added to
    the union."""
    o = _overlap_matrix(gt_ins, pred).astype(np.float64)
    n_gt = o.shape[0] - 1
    n_pred = o.shape[1] - 1
    if n_gt == 0:
        return 0.0
    gt_sizes = o.sum(axis=1)
    pred_sizes = o.sum(axis=0)
    used = np.zeros(n_pred + 1, dtype=bool)
    c = 0.0
    u = 0.0
    for i in range(1, n_gt + 1):
        inter = o[i, 1:].copy()
        union = gt_sizes[i] + pred_sizes[1:] - inter
        inter[used[1:]] = 0.0
        union[used[1:]] = gt_sizes[i]
        iou = np.where(union > 0, inter / union, 0.0)
        j = int(np.argmax(iou))  # 0-based over preds 1..P
        c += inter[j]
        u += union[j]
        used[j + 1] = True
    # add unmatched prediction pixels
    for j in range(1, n_pred + 1):
        if not used[j] and pred_sizes[j] > 0:
            u += pred_sizes[j]
    return float(c / u) if u > 0 else 0.0


def pixel_f1(gt_ins: np.ndarray, pred_ins: np.ndarray) -> float:
    gt = (gt_ins > 0)
    pr = (pred_ins > 0)
    tp = float((gt & pr).sum())
    fp = float((~gt & pr).sum())
    fn = float((gt & ~pr).sum())
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom > 0 else 0.0


def remap_label(pred: np.ndarray, by_size: bool = False) -> np.ndarray:
    ids = [int(i) for i in np.unique(pred) if i != 0]
    if not ids:
        return pred
    if by_size:
        sizes = [(i, int((pred == i).sum())) for i in ids]
        ids = [i for i, _ in sorted(sizes, key=lambda kv: kv[1], reverse=True)]
    out = np.zeros(pred.shape, np.int32)
    for new, old in enumerate(ids, start=1):
        out[pred == old] = new
    return out


def get_fast_pq(true: np.ndarray, pred: np.ndarray, match_iou: float = 0.5):
    """Panoptic quality: returns ([dq, sq, pq], pairing info).

    Instance ids must be contiguous (call remap_label first).
    """
    assert match_iou >= 0.0
    o = _overlap_matrix(true, pred).astype(np.float64)
    n_true = o.shape[0] - 1
    n_pred = o.shape[1] - 1
    true_sizes = o.sum(axis=1)
    pred_sizes = o.sum(axis=0)
    if n_true == 0 or n_pred == 0:
        tp, fp, fn = 0, n_pred, n_true
        dq = tp / (tp + 0.5 * fp + 0.5 * fn) if (tp + fp + fn) else 0.0
        return [dq, 0.0, 0.0], [[], [], list(range(1, n_true + 1)),
                                list(range(1, n_pred + 1))]

    inter = o[1:, 1:]
    union = true_sizes[1:, None] + pred_sizes[None, 1:] - inter
    iou = np.where(union > 0, inter / union, 0.0)

    if match_iou >= 0.5:
        masked = np.where(iou > match_iou, iou, 0.0)
        paired_true, paired_pred = np.nonzero(masked)
        paired_iou = masked[paired_true, paired_pred]
        paired_true = paired_true + 1
        paired_pred = paired_pred + 1
    else:
        pt, pp = linear_sum_assignment(-iou)
        piou = iou[pt, pp]
        keep = piou > match_iou
        paired_true = pt[keep] + 1
        paired_pred = pp[keep] + 1
        paired_iou = piou[keep]

    paired_true_l = list(paired_true)
    paired_pred_l = list(paired_pred)
    unpaired_true = [i for i in range(1, n_true + 1) if i not in paired_true_l]
    unpaired_pred = [i for i in range(1, n_pred + 1) if i not in paired_pred_l]
    tp = len(paired_true_l)
    fp = len(unpaired_pred)
    fn = len(unpaired_true)
    dq = tp / (tp + 0.5 * fp + 0.5 * fn)
    sq = paired_iou.sum() / (tp + 1.0e-6)
    return [dq, sq, dq * sq], [paired_true_l, paired_pred_l,
                               unpaired_true, unpaired_pred]
