"""Superpixel multicut baselines (mc_baselines.py:108-301 API equivalents).

Standalone baseline segmenters over boundary maps / affinities: plain
multicut, long-range multicut (extra non-adjacent cost edges from long-range
affinity offsets), and 'lifted' multicut (long-range edges enter the
objective but cannot be contracted directly).
"""

from __future__ import annotations

import numpy as np

from .watershed import distance_transform_watershed
from .multicut import (rag_mean_affinity, transform_probabilities_to_costs,
                       multicut_gaec, lifted_multicut_gaec)


def _fragments_from_boundary(boundary: np.ndarray):
    fragments = np.zeros(boundary.shape, dtype=np.uint64)
    offset = 0
    for z in range(boundary.shape[0]):
        wsz, max_id = distance_transform_watershed(boundary[z])
        fragments[z] = wsz + offset
        offset += max_id
    return fragments


def _long_range_edges(fragments: np.ndarray, affs: np.ndarray, offsets):
    """Accumulate fragment-pair boundaryness along long-range offsets."""
    from collections import defaultdict

    stats = defaultdict(lambda: [0.0, 0.0])
    dims = fragments.shape
    for c, off in enumerate(offsets):
        sl_a, sl_b = [], []
        for d in range(3):
            o = int(off[d])
            n = dims[d]
            sl_a.append(slice(max(0, -o), min(n, n - o)))
            sl_b.append(slice(max(0, o), min(n, n + o)))
        a = fragments[tuple(sl_a)].reshape(-1)
        b = fragments[tuple(sl_b)].reshape(-1)
        v = affs[(c,) + tuple(sl_a)].reshape(-1)
        diff = a != b
        for u, w, val in zip(a[diff], b[diff], v[diff]):
            key = (min(int(u), int(w)), max(int(u), int(w)))
            s = stats[key]
            s[0] += val
            s[1] += 1
    uv = np.array(list(stats.keys()), np.uint64).reshape(-1, 2)
    mean = np.array([s[0] / s[1] for s in stats.values()])
    size = np.array([s[1] for s in stats.values()])
    return uv, mean, size


class McSuperpixel:
    """Plain multicut over DT-watershed superpixels."""

    def __call__(self, affs: np.ndarray) -> np.ndarray:
        inv = 1.0 - np.asarray(affs, np.float32)
        boundary = np.maximum(inv[1], inv[2])
        fragments = _fragments_from_boundary(boundary)
        uv, mean, size = rag_mean_affinity(fragments, inv[:3])
        costs = transform_probabilities_to_costs(mean, edge_sizes=size)
        uniq = np.unique(fragments)
        remap = {int(u): i for i, u in enumerate(uniq)}
        uv_c = np.vectorize(lambda x: remap[int(x)])(uv).astype(np.uint64)
        labels = multicut_gaec(len(uniq), uv_c, costs)
        lut = np.zeros(int(uniq.max()) + 1, np.uint64)
        lut[uniq] = labels + 1
        return lut[fragments]


class LongRangeMulticutSuperpixel:
    """Multicut with additional long-range cost edges (all contractible)."""

    def __init__(self, offsets=((-2, 0, 0), (0, -9, 0), (0, 0, -9))):
        self.offsets = offsets

    def __call__(self, affs_local: np.ndarray,
                 affs_long: np.ndarray | None = None) -> np.ndarray:
        inv = 1.0 - np.asarray(affs_local, np.float32)
        boundary = np.maximum(inv[1], inv[2])
        fragments = _fragments_from_boundary(boundary)
        uv, mean, size = rag_mean_affinity(fragments, inv[:3])
        costs = transform_probabilities_to_costs(mean, edge_sizes=size)
        if affs_long is not None:
            uv2, mean2, size2 = _long_range_edges(
                fragments, 1.0 - np.asarray(affs_long, np.float32),
                self.offsets)
            costs2 = transform_probabilities_to_costs(mean2, edge_sizes=size2)
            uv = np.concatenate([uv, uv2], axis=0)
            costs = np.concatenate([costs, costs2])
        uniq = np.unique(fragments)
        remap = {int(u): i for i, u in enumerate(uniq)}
        uv_c = np.vectorize(lambda x: remap[int(x)])(uv).astype(np.uint64)
        labels = multicut_gaec(len(uniq), uv_c, costs)
        lut = np.zeros(int(uniq.max()) + 1, np.uint64)
        lut[uniq] = labels + 1
        return lut[fragments]


class LmcSuperpixel:
    """TRUE lifted multicut over superpixels: long-range affinity edges enter
    the objective as non-contractible lifted edges."""

    def __init__(self, offsets=((-2, 0, 0), (0, -9, 0), (0, 0, -9))):
        self.offsets = offsets

    def __call__(self, affs_local: np.ndarray,
                 affs_long: np.ndarray | None = None) -> np.ndarray:
        inv = 1.0 - np.asarray(affs_local, np.float32)
        boundary = np.maximum(inv[1], inv[2])
        fragments = _fragments_from_boundary(boundary)
        uv, mean, size = rag_mean_affinity(fragments, inv[:3])
        costs = transform_probabilities_to_costs(mean, edge_sizes=size)
        uniq = np.unique(fragments)
        remap = {int(u): i for i, u in enumerate(uniq)}

        def compact(uv_arr):
            return np.vectorize(lambda x: remap[int(x)])(uv_arr).astype(
                np.uint64)

        if affs_long is not None:
            uv2, mean2, size2 = _long_range_edges(
                fragments, 1.0 - np.asarray(affs_long, np.float32),
                self.offsets)
            costs2 = transform_probabilities_to_costs(mean2, edge_sizes=size2)
            uv2c = compact(uv2)
        else:
            uv2c = np.zeros((0, 2), np.uint64)
            costs2 = np.zeros((0,), np.float64)
        labels = lifted_multicut_gaec(len(uniq), compact(uv), costs,
                                      uv2c, costs2)
        lut = np.zeros(int(uniq.max()) + 1, np.uint64)
        lut[uniq] = labels + 1
        return lut[fragments]


def gen_pseudo_labels(affs: np.ndarray, offsets, strides=(1, 10, 10),
                      min_size: int = 100) -> np.ndarray:
    """Pseudo-label generation (utils/gen_pseudo.py role): decode affinities
    with the mutex watershed and zero out tiny segments."""
    from .mutex import seg_mutex
    from ..ops.affinity_np import remove_small, relabel

    seg = seg_mutex(affs, offsets=offsets, strides=list(strides))
    seg = remove_small(seg.astype(np.int64), thres=min_size)
    return relabel(seg)
