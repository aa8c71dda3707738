"""Hierarchical mean-affinity agglomeration (waterz-equivalent).

``seg_waterz`` mirrors the reference usage: fragments from per-slice seeded
watershed, then merge while 1 - mean_affinity < threshold (waterz scoring
'OneMinus<...MeanAffinityProvider...>' at 0.50; scripts_ac3ac4/main.py:316-321
and scripts_cvppp/utils/seg_waterz.py:66-84).
"""

from __future__ import annotations

import numpy as np

from ._native import get_lib
from .watershed import watershed_from_affs


SCORING_MODES = {"mean": 0, "quantile50": 1, "median": 1, "quantile25": 2,
                 "quantile75": 3, "quantile15": 4, "quantile85": 5,
                 "max": 6, "min": 7}


def agglomerate(affs: np.ndarray, fragments: np.ndarray,
                threshold: float = 0.5,
                scoring: str = "mean",
                discretize_queue: int = 256) -> np.ndarray:
    """affs (3, D, H, W) float; fragments (D, H, W) uint64 -> merged labels.

    scoring 'mean' = waterz OneMinus<EdgeStatisticValue<MeanAffinity...>>
    (the reference default, scripts_ac3ac4/inference.py:211-224); the
    quantile/max/min variants mirror waterz's HistogramQuantileProvider
    scoring family (256-bin histograms).
    discretize_queue=256 reproduces the reference's waterz.agglomerate(...,
    discretize_queue=256) merge ordering (256 score levels, FIFO within a
    level); 0 uses an exact priority queue.
    """
    lib = get_lib()
    affs = np.ascontiguousarray(affs, dtype=np.float32)
    fragments = np.ascontiguousarray(fragments, dtype=np.uint64)
    d, h, w = fragments.shape
    out = np.zeros(fragments.size, dtype=np.uint64)
    mode = SCORING_MODES[scoring]
    lib.agglomerate_scored(affs.reshape(3, -1), fragments.reshape(-1),
                           d, h, w, float(threshold), mode,
                           int(discretize_queue), out)
    return out.reshape(d, h, w)


def agglomerate_multi(affs: np.ndarray, fragments: np.ndarray,
                      thresholds) -> list[np.ndarray]:
    """waterz.agglomerate-style multi-threshold API: one segmentation per
    threshold (ascending thresholds continue merging the previous result)."""
    out = []
    frags = fragments
    for t in sorted(thresholds):
        frags = agglomerate(affs, frags, threshold=float(t))
        out.append(frags.copy())
    return out


def seg_waterz(affs: np.ndarray, threshold: float = 0.5,
               seed_method: str = "maxima_distance") -> np.ndarray:
    """Full waterz path on 3-channel 3D affinities.

    For 2D inputs (K>=2 channels, H, W) this lifts to a single-slice 3D volume
    like the reference 2D wrapper (seg_waterz.py:66-84).
    """
    affs = np.asarray(affs, dtype=np.float32)
    if affs.ndim == 3:  # (K, H, W) 2D -> (3, 1, H, W)
        a3 = np.zeros((3, 1) + affs.shape[1:], dtype=np.float32)
        a3[1, 0] = affs[0]
        a3[2, 0] = affs[1]
        affs = a3
    fragments = watershed_from_affs(affs, seed_method=seed_method)
    seg = agglomerate(affs, fragments, threshold=threshold)
    return np.squeeze(seg)
