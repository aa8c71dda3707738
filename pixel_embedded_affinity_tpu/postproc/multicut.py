"""Multicut baselines (elf mc_baseline-equivalent, in-repo C++ solver).

``mc_baseline`` mirrors scripts_ac3ac4/utils/lmc.py:6-24: per-slice distance
transform watershed fragments on boundary = max(1-affs_y, 1-affs_x), RAG with
mean-affinity edge probabilities, log-odds costs weighted by edge size, then
multicut via greedy additive edge contraction + greedy node moves +
Kernighan-Lin refinement (the reference's multicut_kernighan_lin solver,
scripts_ac3ac4/utils/lmc.py:17-22).
"""

from __future__ import annotations

import numpy as np

from ._native import get_lib
from .watershed import distance_transform_watershed


def transform_probabilities_to_costs(probs: np.ndarray, beta: float = 0.5,
                                     edge_sizes: np.ndarray | None = None
                                     ) -> np.ndarray:
    """elf.segmentation.multicut.transform_probabilities_to_costs parity."""
    p = np.clip(probs, 0.001, 1.0 - 0.001)
    costs = np.log((1.0 - p) / p) + np.log((1.0 - beta) / beta)
    if edge_sizes is not None:
        w = edge_sizes / edge_sizes.max()
        costs = w * costs
    return costs


def rag_mean_affinity(fragments: np.ndarray, affs: np.ndarray):
    """RAG edges (u, v), mean affinity and boundary size per edge."""
    lib = get_lib()
    fragments = np.ascontiguousarray(fragments, dtype=np.uint64)
    affs = np.ascontiguousarray(affs, dtype=np.float32)
    d, h, w = fragments.shape
    n_edges = lib.rag_mean_affinity(fragments.reshape(-1),
                                    affs.reshape(affs.shape[0], -1),
                                    d, h, w, None, None, None)
    uv = np.zeros((n_edges, 2), dtype=np.uint64)
    mean = np.zeros(n_edges, dtype=np.float64)
    size = np.zeros(n_edges, dtype=np.float64)
    lib.rag_mean_affinity(fragments.reshape(-1),
                          affs.reshape(affs.shape[0], -1),
                          d, h, w, uv.ctypes.data, mean.ctypes.data,
                          size.ctypes.data)
    return uv, mean, size


def multicut_gaec(n_nodes: int, uv: np.ndarray, costs: np.ndarray,
                  local_search: int = 2) -> np.ndarray:
    """GAEC multicut + local search. local_search: 0 = GAEC only,
    1 = + greedy single-node moves, 2 (default) = + Kernighan-Lin
    refinement, matching the reference's elf multicut_kernighan_lin
    (scripts_ac3ac4/utils/lmc.py:17-22)."""
    lib = get_lib()
    uv = np.ascontiguousarray(uv.reshape(-1, 2), dtype=np.uint64)
    costs = np.ascontiguousarray(costs, dtype=np.float64)
    labels = np.zeros(n_nodes, dtype=np.uint64)
    lib.gaec_multicut(int(n_nodes), len(costs), uv.reshape(-1), costs,
                      int(local_search), labels)
    return labels


def lifted_multicut_gaec(n_nodes: int, uv_local: np.ndarray,
                         costs_local: np.ndarray, uv_lifted: np.ndarray,
                         costs_lifted: np.ndarray,
                         local_search: int = 2) -> np.ndarray:
    """True lifted multicut: lifted edges weigh the objective but only
    locally adjacent pairs contract (GAEC), then greedy node moves and
    lifted-aware Kernighan-Lin refinement (local_search=2, default)."""
    lib = get_lib()
    uv_local = np.ascontiguousarray(uv_local.reshape(-1, 2), np.uint64)
    uv_lifted = np.ascontiguousarray(uv_lifted.reshape(-1, 2), np.uint64)
    costs_local = np.ascontiguousarray(costs_local, np.float64)
    costs_lifted = np.ascontiguousarray(costs_lifted, np.float64)
    labels = np.zeros(n_nodes, dtype=np.uint64)
    lib.lifted_gaec_multicut(int(n_nodes),
                             len(costs_local), uv_local.reshape(-1),
                             costs_local,
                             len(costs_lifted), uv_lifted.reshape(-1),
                             costs_lifted, int(local_search), labels)
    return labels


def mc_baseline(affs: np.ndarray, fragments: np.ndarray | None = None
                ) -> np.ndarray:
    """affs (>=3, D, H, W) AFFINITIES (the wrapper does the 1-affs flip)."""
    affs = np.asarray(affs, dtype=np.float32)
    inv = 1.0 - affs
    boundary = np.maximum(inv[1], inv[2])
    if fragments is None:
        fragments = np.zeros(boundary.shape, dtype=np.uint64)
        offset = 0
        for z in range(fragments.shape[0]):
            wsz, max_id = distance_transform_watershed(boundary[z],
                                                       threshold=0.25,
                                                       sigma_seeds=2.0)
            fragments[z] = wsz + offset
            offset += max_id

    # edge probability = mean (1 - affinity) across the boundary = boundary-ness
    uv, mean_aff, size = rag_mean_affinity(fragments, inv[:3])
    costs = transform_probabilities_to_costs(mean_aff, edge_sizes=size)
    # relabel fragment ids to compact node ids
    uniq = np.unique(fragments)
    remap = {int(u): i for i, u in enumerate(uniq)}
    uv_c = np.vectorize(lambda x: remap[int(x)])(uv).astype(np.uint64)
    node_labels = multicut_gaec(len(uniq), uv_c, costs)
    lut = np.zeros(int(uniq.max()) + 1, dtype=np.uint64)
    lut[uniq] = node_labels + 1
    return lut[fragments]


def multicut_multi(affs: np.ndarray, fragments: np.ndarray | None = None
                   ) -> np.ndarray:
    """2D/general variant (scripts_cvppp/utils/lmc.py:6-19 semantics)."""
    return mc_baseline(affs, fragments=fragments)
