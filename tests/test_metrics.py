"""Metric parity vs direct (slow) oracle implementations of the reference formulas."""

import numpy as np

from synth import blob_labels

from pixel_embedded_affinity_tpu.metrics import (
    best_dice, symmetric_best_dice, abs_diff_fg_labels, fgbg_dice,
    voi, adapted_rand_error, agg_jc_index, pixel_f1, get_fast_pq, remap_label,
)


def slow_best_dice(in_label, gt_label):
    """Direct port of the Cython loop (CVPPP_evaluate.pyx:45-86) as oracle."""
    max_in, min_in = int(in_label.max()), int(in_label.min())
    max_gt, min_gt = int(gt_label.max()), int(gt_label.min())
    if max_in == min_in:
        return 0.0
    score = 0.0
    for i in range(min_in + 1, max_in + 1):
        s_max = 0.0
        mi = in_label == i
        for j in range(min_gt + 1, max_gt + 1):
            mj = gt_label == j
            denom = mi.sum() + mj.sum()
            s = 2.0 * (mi & mj).sum() / denom if denom > 1e-8 else 0.0
            s_max = max(s_max, s)
        score += s_max
    return score / (max_in - min_in)


def make_pair(seed=0):
    rng = np.random.default_rng(seed)
    gt = blob_labels(48, 48, grid=2, radius=9, seed=seed)
    pred = gt.copy()
    # perturb: erode one instance, split another
    pred[pred == 1] = np.where(rng.random((pred == 1).sum()) < 0.2, 0, 1)
    half = pred.shape[1] // 2
    m = pred == 4
    pred = pred.astype(np.int64)
    pred[m & (np.arange(pred.shape[1])[None, :] >= half)] = 5
    return gt.astype(np.int64), pred


def test_best_dice_matches_slow():
    gt, pred = make_pair()
    assert np.isclose(best_dice(pred, gt), slow_best_dice(pred, gt))
    assert np.isclose(best_dice(gt, pred), slow_best_dice(gt, pred))
    sbd = symmetric_best_dice(pred, gt)
    assert np.isclose(sbd, min(slow_best_dice(pred, gt), slow_best_dice(gt, pred)))
    assert 0 < sbd < 1


def test_dic_and_fgbg():
    gt, pred = make_pair()
    assert abs_diff_fg_labels(pred, gt) == abs(int(pred.max()) - int(gt.max()))
    assert 0.9 < fgbg_dice(gt, gt) <= 1.0


def test_voi_identity_and_split():
    gt, _ = make_pair()
    s, m = voi(gt, gt)
    assert abs(s) < 1e-10 and abs(m) < 1e-10
    # splitting an instance increases voi_split more than voi_merge
    pred = gt.copy()
    mask = pred == 1
    split_col = int(np.where(mask.any(0))[0].mean())
    cols = np.arange(pred.shape[1])[None, :] >= split_col
    pred[mask & cols] = pred.max() + 1
    s2, m2 = voi(gt, pred)
    assert s2 > 0 and s2 > m2


def brute_voi(gt, pred):
    """Direct definition with gt-label-0 pixels dropped."""
    keep = gt != 0
    g, p = gt[keep], pred[keep]
    n = g.size
    from collections import Counter
    joint = Counter(zip(g.tolist(), p.tolist()))
    pg = Counter(g.tolist())
    pp = Counter(p.tolist())
    h_p_given_g = 0.0
    h_g_given_p = 0.0
    for (gi, pi), c in joint.items():
        pij = c / n
        h_p_given_g -= pij * (np.log(pij) - np.log(pg[gi] / n))
        h_g_given_p -= pij * (np.log(pij) - np.log(pp[pi] / n))
    return h_p_given_g, h_g_given_p


def test_voi_matches_brute():
    gt, pred = make_pair(seed=2)
    s, m = voi(gt, pred)
    bs, bm = brute_voi(gt, pred)
    assert np.isclose(s, bs) and np.isclose(m, bm)


def test_adapted_rand():
    gt, _ = make_pair()
    are, p, r = adapted_rand_error(gt, gt)
    assert are < 1e-10 and np.isclose(p, 1) and np.isclose(r, 1)
    _, pred = make_pair()
    are2 = adapted_rand_error(gt, pred)[0]
    assert 0 < are2 < 1


def slow_aji(gt, pred):
    """Direct port of agg_jc_index (metrics_bbbc.py:11-61)."""
    n_gt = int(gt.max())
    n_pred = int(pred.max())
    used = np.zeros(n_pred + 1, dtype=bool)
    c = u = 0.0
    for i in range(1, n_gt + 1):
        m = gt == i
        inters, unions = [], []
        for j in range(1, n_pred + 1):
            if used[j]:
                inters.append(0)
                unions.append(np.count_nonzero(m))
            else:
                pj = pred == j
                it = np.count_nonzero(m & pj)
                inters.append(it)
                unions.append(np.count_nonzero(m) + np.count_nonzero(pj) - it)
        iou = np.array(inters) / np.array(unions)
        hit = int(np.argmax(iou))
        c += inters[hit]
        u += unions[hit]
        used[hit + 1] = True
    for j in range(1, n_pred + 1):
        if not used[j]:
            u += np.count_nonzero(pred == j)
    return c / u


def test_aji_matches_slow():
    gt, pred = make_pair(seed=4)
    gt = remap_label(gt)
    pred = remap_label(pred)
    assert np.isclose(agg_jc_index(gt, pred), slow_aji(gt, pred))
    assert np.isclose(agg_jc_index(gt, gt), 1.0)


def test_pixel_f1():
    gt, pred = make_pair(seed=5)
    assert np.isclose(pixel_f1(gt, gt), 1.0)
    f1 = pixel_f1(gt, pred)
    assert 0 < f1 < 1


def test_fast_pq():
    gt, pred = make_pair(seed=6)
    gt = remap_label(gt)
    pred = remap_label(pred)
    (dq, sq, pq), _ = get_fast_pq(gt, gt)
    assert np.isclose(dq, 1.0) and sq > 0.999 and np.isclose(pq, sq * dq)
    (dq2, sq2, pq2), _ = get_fast_pq(gt, pred)
    assert 0 < pq2 <= 1
    assert pq2 < pq
