"""Watershed fragment generation (mahotas/elf-equivalent, scipy + in-repo C++).

* ``watershed_from_affs`` ~ scripts_ac3ac4/utils/fragment.py:15-27: per-slice
  seeded watershed on boundary = 1 - 0.5*(affs_y + affs_x), seeds from
  'maxima_distance' (regional maxima of the distance transform of
  boundary < 0.5) or a regular grid.
* ``distance_transform_watershed`` ~ elf.segmentation.watershed
  .distance_transform_watershed used by the LMC baseline
  (scripts_ac3ac4/utils/lmc.py:13): gaussian-smoothed EDT of
  (hmap < threshold), seeds = connected regional maxima, watershed on hmap.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from ._native import get_lib


def seeded_watershed(cost: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """2D priority-flood watershed growing ``seeds`` over ascending ``cost``."""
    lib = get_lib()
    cost = np.ascontiguousarray(cost, dtype=np.float32)
    seeds = np.ascontiguousarray(seeds, dtype=np.int32)
    out = np.zeros_like(seeds)
    h, w = cost.shape
    lib.seeded_watershed_2d(cost, seeds, h, w, out)
    return out


def _regional_maxima(x: np.ndarray) -> np.ndarray:
    """8-connected regional maxima (mahotas.regmax-style, plateaus included)."""
    mx = ndimage.maximum_filter(x, size=3, mode="nearest")
    cand = x >= mx
    # drop plateaus touching a larger neighbor through connectivity
    lab, n = ndimage.label(cand, structure=np.ones((3, 3)))
    out = np.zeros_like(cand)
    for i in range(1, n + 1):
        region = lab == i
        grown = ndimage.binary_dilation(region, structure=np.ones((3, 3)))
        border = grown & ~region
        if border.any() and x[border].max() > x[region].max():
            continue
        out |= region
    return out


def get_seeds(boundary: np.ndarray, method: str = "grid", next_id: int = 1,
              seed_distance: int = 10):
    """Seed generation for fragments (fragment.py:29-53 semantics)."""
    if method == "grid":
        h, w = boundary.shape
        ys = np.arange(0, h, seed_distance)
        xs = np.arange(0, w, seed_distance)
        num = len(ys) * len(xs)
        seeds = np.zeros_like(boundary, dtype=np.int32)
        seeds[np.ix_(ys, xs)] = np.arange(
            next_id, next_id + num).reshape(len(ys), len(xs))
        return seeds, num
    if method == "minima":
        maxima = _regional_maxima(-boundary)
        seeds, num = ndimage.label(maxima)
        seeds = seeds.astype(np.int32)
        seeds[seeds > 0] += next_id - 1
        return seeds, num
    if method == "maxima_distance":
        distance = ndimage.distance_transform_edt(boundary < 0.5)
        maxima = _regional_maxima(distance)
        seeds, num = ndimage.label(maxima)
        seeds = seeds.astype(np.int32)
        seeds[seeds > 0] += next_id - 1
        return seeds, num
    raise ValueError(f"unknown seed method {method}")


def watershed_from_affs(affs: np.ndarray, seed_method: str = "maxima_distance",
                        seed_distance: int = 10) -> np.ndarray:
    """Per-slice fragments from 3-channel 3D affinities (fragment.py:15-27)."""
    affs_xy = 1.0 - 0.5 * (affs[1] + affs[2])
    depth = affs_xy.shape[0]
    fragments = np.zeros(affs_xy.shape, dtype=np.uint64)
    next_id = 1
    for z in range(depth):
        seeds, num = get_seeds(affs_xy[z], next_id=next_id, method=seed_method,
                               seed_distance=seed_distance)
        fragments[z] = seeded_watershed(affs_xy[z], seeds).astype(np.uint64)
        next_id += num
    return fragments


def distance_transform_watershed(hmap: np.ndarray, threshold: float = 0.25,
                                 sigma_seeds: float = 2.0):
    """elf-style 2D DT watershed: returns (labels, max_id)."""
    dt = ndimage.distance_transform_edt(hmap < threshold)
    if sigma_seeds > 0:
        dt = ndimage.gaussian_filter(dt, sigma_seeds)
    maxima = _regional_maxima(dt)
    seeds, n = ndimage.label(maxima)
    labels = seeded_watershed(hmap.astype(np.float32), seeds.astype(np.int32))
    return labels.astype(np.uint64), int(n)
