"""Embedding-space clustering decoders (alternative to affinity decoding).

Port of scripts_cvppp/utils/cluster.py: DBSCAN / MeanShift over per-pixel
embeddings restricted to the foreground mask, followed by watershed expansion
of the clustered seeds over the mask.
"""

from __future__ import annotations

import numpy as np

from .watershed import seeded_watershed


def cluster_embeddings(embedding_hwc: np.ndarray, fg_mask: np.ndarray,
                       method: str = "dbscan", eps: float = 0.3,
                       min_samples: int = 10, bandwidth: float | None = None,
                       subsample: int = 4, expand: bool = True) -> np.ndarray:
    """Cluster FG-pixel embeddings into instances. Returns (H, W) labels."""
    h, w, c = embedding_hwc.shape
    ys, xs = np.nonzero(fg_mask)
    if len(ys) == 0:
        return np.zeros((h, w), np.int32)
    sub = slice(None, None, max(subsample, 1))
    feats = embedding_hwc[ys[sub], xs[sub]]

    if method == "dbscan":
        from sklearn.cluster import DBSCAN

        labels = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(feats)
    elif method == "meanshift":
        from sklearn.cluster import MeanShift

        labels = MeanShift(bandwidth=bandwidth).fit_predict(feats)
    else:
        raise ValueError(method)

    seeds = np.zeros((h, w), np.int32)
    seeds[ys[sub], xs[sub]] = labels + 1  # noise (-1) -> 0
    if not expand:
        return seeds
    # expand seeds over the foreground via watershed on flat cost
    cost = np.where(fg_mask > 0, 0.0, 1.0).astype(np.float32)
    out = seeded_watershed(cost, seeds)
    out[fg_mask == 0] = 0
    return out
