"""Synthetic instance-label generators for tests and benchmarks."""

import numpy as np


def blob_labels(h=64, w=64, grid=3, radius=8, seed=0):
    """Disjoint disk instances on a grid with background 0, ids 1..grid^2."""
    rng = np.random.default_rng(seed)
    lab = np.zeros((h, w), dtype=np.int32)
    idx = 1
    ys = np.linspace(radius + 2, h - radius - 2, grid).astype(int)
    xs = np.linspace(radius + 2, w - radius - 2, grid).astype(int)
    yy, xx = np.mgrid[0:h, 0:w]
    for cy in ys:
        for cx in xs:
            r = radius + rng.integers(-2, 3)
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
            lab[mask] = idx
            idx += 1
    return lab


def tile_labels_3d(d=8, h=48, w=48, nz=2, ny=3, nx=3):
    """Dense brick partition of a 3D volume (no background)."""
    lab = np.zeros((d, h, w), dtype=np.int64)
    idx = 1
    zs = np.linspace(0, d, nz + 1).astype(int)
    ys = np.linspace(0, h, ny + 1).astype(int)
    xs = np.linspace(0, w, nx + 1).astype(int)
    for zi in range(nz):
        for yi in range(ny):
            for xi in range(nx):
                lab[zs[zi]:zs[zi + 1], ys[yi]:ys[yi + 1], xs[xi]:xs[xi + 1]] = idx
                idx += 1
    return lab


def partitions_equal(a, b, ignore_zero=True):
    """True iff label images define the same partition (up to renaming)."""
    a = np.asarray(a).reshape(-1)
    b = np.asarray(b).reshape(-1)
    if ignore_zero:
        keep = (a != 0) & (b != 0)
        zeros_match = np.array_equal(a == 0, b == 0)
        if not zeros_match:
            return False
        a, b = a[keep], b[keep]
    pairs = set(zip(a.tolist(), b.tolist()))
    return (len({p[0] for p in pairs}) == len(pairs)
            and len({p[1] for p in pairs}) == len(pairs))
