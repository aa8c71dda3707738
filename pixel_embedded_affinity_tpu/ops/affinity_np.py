"""Host-side (NumPy) label->affinity transforms.

These run on CPU in the input pipeline: they need instance labels and are cheap
at dataset scale, exactly like the reference keeps them host-side.

Reference parity targets:
* ``gen_affs``            ~ scripts_cvppp/utils/affinity_ours.py:17-39 (gen_affs_ours)
* ``seg_to_aff_3d``       ~ scripts_ac3ac4/data/data_affinity.py:53-102 (seg_to_aff)
* ``weight_binary_ratio`` ~ scripts_cvppp/data/data_segmentation.py:205-228
* ``seg_widen_border``    ~ scripts_cvppp/data/data_segmentation.py:57-79
* ``relabel``             ~ scripts_cvppp/data/data_segmentation.py:22-38
* ``remove_small``        ~ scripts_cvppp/data/data_segmentation.py:40-45
* ``label_pyramid``       ~ scripts_cvppp/data/data_provider.py:200-203
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import maximum_filter, minimum_filter


def _shift_const(a: np.ndarray, shift: tuple[int, ...], cval=0) -> np.ndarray:
    """Integer shift with constant fill (order-0, like scipy.ndimage.shift).

    out[p] = a[p - shift] where in-bounds, else cval.
    """
    out = np.full_like(a, cval)
    src = []
    dst = []
    for s, n in zip(shift, a.shape):
        if s >= 0:
            src.append(slice(0, n - s))
            dst.append(slice(s, n))
        else:
            src.append(slice(-s, n))
            dst.append(slice(0, n + s))
    out[tuple(dst)] = a[tuple(src)]
    return out


def gen_affs(labels: np.ndarray,
             offsets=((-1, 0), (0, -1)),
             ignore: bool = False,
             padding: bool = False):
    """2D GT affinity generation, 'ours' semantics.

    Channel c at pixel p: 1 if labels[p] == labels[p + offsets[c]] (including
    background==background), else 0. ``mask`` marks pixels whose neighbor is
    in-bounds. Out-of-bounds: affinity = 1 if padding else 0.
    If ``ignore``: pairs touching background (label 0) get affinity 0.

    Returns (affinities float32 (C,H,W), masks uint8 (C,H,W)).
    """
    labels = np.asarray(labels)
    n = len(offsets)
    affs = np.zeros((n,) + labels.shape, dtype=np.float32)
    masks = np.zeros((n,) + labels.shape, dtype=np.uint8)
    for cid, off in enumerate(offsets):
        shift_off = tuple(-x for x in off)
        shifted = _shift_const(labels, shift_off, cval=0)
        mask = _shift_const(np.ones_like(labels, dtype=np.uint8), shift_off, cval=0)
        out = (labels == shifted).astype(np.float32)
        if ignore:
            out[labels == 0] = 0
            out[shifted == 0] = 0
        out[mask == 0] = 1.0 if padding else 0.0
        affs[cid] = out
        masks[cid] = mask
    return affs, masks


def seg_to_aff_3d(seg: np.ndarray,
                  nhood=((-1, 0, 0), (0, -1, 0), (0, 0, -1)),
                  pad: str = "replicate") -> np.ndarray:
    """2D/3D GT affinity from segmentation, connectomics semantics.

    Channel e at voxel p (where p and p+nhood[e] both in-bounds):
      1 iff seg[p] == seg[p+nhood[e]] and both > 0; out-of-bounds region is 0.
    If the neighborhood is the unit nhood and pad == 'replicate', the leading
    face of each axis is filled with (seg > 0) on that face.
    """
    seg = np.asarray(seg)
    nhood = np.asarray(nhood, dtype=np.int64)
    ndim = seg.ndim
    n_edge = nhood.shape[0]
    aff = np.zeros((n_edge,) + seg.shape, dtype=np.float32)

    for e in range(n_edge):
        sl_a = []
        sl_b = []
        for d in range(ndim):
            o = int(nhood[e, d])
            n = seg.shape[d]
            sl_a.append(slice(max(0, -o), min(n, n - o)))
            sl_b.append(slice(max(0, o), min(n, n + o)))
        a = seg[tuple(sl_a)]
        b = seg[tuple(sl_b)]
        aff[(e,) + tuple(sl_a)] = ((a == b) & (a > 0) & (b > 0)).astype(np.float32)

    if pad == "replicate" and n_edge == ndim:
        # fill the leading face of each axis with the foreground mask
        for e in range(n_edge):
            face = [slice(None)] * ndim
            face[e] = 0
            aff[(e,) + tuple(face)] = (seg[tuple(face)] > 0).astype(np.float32)
    return aff


def seg_to_aff_3d_12ch(seg: np.ndarray) -> np.ndarray:
    """12-channel GT affinity with the fixed shift table (z,y,x) interleaved.

    Matches scripts_ac3ac4/data/data_provider_labeled_deep.py:246-258: the
    unit-shift group uses pad='' (no replicate fill), as do the long-range
    groups.
    """
    groups = [
        ((-1, 0, 0), (0, -1, 0), (0, 0, -1)),
        ((-2, 0, 0), (0, -3, 0), (0, 0, -3)),
        ((-3, 0, 0), (0, -9, 0), (0, 0, -9)),
        ((-4, 0, 0), (0, -27, 0), (0, 0, -27)),
    ]
    return np.concatenate([seg_to_aff_3d(seg, g, pad="") for g in groups], axis=0)


def gen_affs_mutex_3d(labels: np.ndarray, offsets, padding: bool = True,
                      background: bool = False) -> np.ndarray:
    """Mutex-style GT for arbitrary 3D offsets (gen_affs_mutex_3d parity).

    Channel c at voxel p (both p and p+offsets[c] in bounds): 1 iff
    labels[p] == labels[p+o] (and both > 0 unless ``background``).
    Out-of-bounds region: foreground mask if ``padding`` else 0.
    """
    labels = np.asarray(labels)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.shape[0]
    affs = np.zeros((n,) + labels.shape, dtype=np.float32)
    fg = (labels > 0).astype(np.float32)
    for c in range(n):
        sl_a, sl_b = [], []
        for d in range(3):
            o = int(offsets[c, d])
            size = labels.shape[d]
            sl_a.append(slice(max(0, -o), min(size, size - o)))
            sl_b.append(slice(max(0, o), min(size, size + o)))
        a = labels[tuple(sl_a)]
        b = labels[tuple(sl_b)]
        eq = (a == b).astype(np.float32)
        if not background:
            eq = eq * (a > 0) * (b > 0)
        if padding:
            affs[c] = fg
        affs[(c,) + tuple(sl_a)] = eq
    return affs


def weight_binary_ratio(label: np.ndarray, mask: np.ndarray | None = None,
                        alpha: float = 1.0) -> np.ndarray:
    """Inverse class-frequency weights for a binary target.

    Weight of the smaller class is >1 (up to 20*alpha via the [0.05, 0.99]
    clip on the foreground fraction), the bigger class gets 1.
    """
    if label.max() == label.min():
        return np.ones_like(label, dtype=np.float32)
    binary = (label != 0).astype(np.float64)
    if mask is None:
        frac = float(binary.sum()) / binary.size
    else:
        frac = float((binary * mask).sum()) / float(mask.sum())
    frac = np.clip(frac, 5e-2, 0.99)
    if frac > 0.5:
        weight = binary + alpha * frac / (1.0 - frac) * (1.0 - binary)
    else:
        weight = alpha * (1.0 - frac) / frac * binary + (1.0 - binary)
    if mask is not None:
        weight = weight * mask
    return weight.astype(np.float32)


def seg_widen_border(seg: np.ndarray, tsz_h: int = 1) -> np.ndarray:
    """Kisuk Lee border widening: zero out any pixel whose (2t+1)^2 window
    (reflect padded, edge not repeated) contains more than one positive id.

    Vectorized with min/max filters (mode='mirror' == np.pad 'reflect').
    Works on 2D arrays or 3D arrays (applied per z-slice).
    """
    seg = np.ascontiguousarray(seg)
    size = 2 * tsz_h + 1

    def _one(plane: np.ndarray) -> np.ndarray:
        mm = plane.max()
        p0 = maximum_filter(plane, size=size, mode="mirror")
        tmp = plane.copy()
        tmp[tmp == 0] = mm + 1
        p1 = minimum_filter(tmp, size=size, mode="mirror")
        return plane * (p0 == p1)

    if seg.ndim == 3:
        out = np.empty_like(seg)
        for z in range(seg.shape[0]):
            out[z] = _one(seg[z])
        return out
    return _one(seg)


def relabel(seg: np.ndarray, do_type: bool = False) -> np.ndarray:
    """Relabel instances to consecutive ids 1..N (0 stays background)."""
    uid = np.unique(seg)
    if len(uid) == 1 and uid[0] == 0:
        return seg
    uid = uid[uid > 0]
    mid = int(uid.max()) + 1
    m_type = seg.dtype
    if do_type:
        if mid < 2 ** 8:
            m_type = np.uint8
        elif mid < 2 ** 16:
            m_type = np.uint16
        elif mid < 2 ** 32:
            m_type = np.uint32
        else:
            m_type = np.uint64
    mapping = np.zeros(mid, dtype=m_type)
    mapping[uid] = np.arange(1, len(uid) + 1, dtype=m_type)
    return mapping[seg]


def remove_small(seg: np.ndarray, thres: int = 100) -> np.ndarray:
    """Zero out instances smaller than ``thres`` pixels (in-place semantics)."""
    sz = seg.shape
    seg = seg.reshape(-1)
    uid, uc = np.unique(seg, return_counts=True)
    seg[np.isin(seg, uid[uc < thres])] = 0
    return seg.reshape(sz)


def label_pyramid(label: np.ndarray, num_levels: int = 4) -> list[np.ndarray]:
    """Nearest-neighbor label downsampling pyramid: /2, /4, /8, /16.

    Matches cv2.resize(..., fx=1/2**k, interpolation=INTER_NEAREST) used by the
    reference providers (2D: whole image; 3D: per-slice in xy).
    """
    import cv2

    out = []
    for k in range(1, num_levels + 1):
        f = 1.0 / (2 ** k)
        if label.ndim == 2:
            out.append(cv2.resize(label, (0, 0), fx=f, fy=f,
                                  interpolation=cv2.INTER_NEAREST))
        else:  # (D, H, W): downsample xy only
            moved = np.transpose(label, (1, 2, 0))
            r = cv2.resize(moved, (0, 0), fx=f, fy=f,
                           interpolation=cv2.INTER_NEAREST)
            if r.ndim == 2:
                r = r[:, :, None]
            out.append(np.transpose(r, (2, 0, 1)))
    return out


def seg_to_instance_bd(seg: np.ndarray, tsz_h: int = 7,
                       do_bg: bool = False) -> np.ndarray:
    """Instance-boundary mask via windowed label min/max.

    Parity with the reference's im2col form (scripts_cvppp/data/
    data_segmentation.py:105-122): a pixel is boundary when its
    (2*tsz_h+1)^2 mirror-padded window contains two different labels —
    with ``do_bg`` counting background as a side, otherwise only between
    two non-zero instances (zeros are excluded from the min).
    Accepts (D, H, W) or (H, W)."""
    seg3 = seg[None] if seg.ndim == 2 else seg
    size = 2 * tsz_h + 1
    mm = int(seg3.max())
    bd = np.zeros(seg3.shape, np.uint8)
    for z in range(seg3.shape[0]):
        plane = seg3[z]
        p0 = maximum_filter(plane, size=size, mode="mirror")
        if do_bg:
            p1 = minimum_filter(plane, size=size, mode="mirror")
            bd[z] = ((p0 > 0) & (p0 != p1)).astype(np.uint8)
        else:
            nz = np.where(plane == 0, mm + 1, plane)
            p1 = minimum_filter(nz, size=size, mode="mirror")
            bd[z] = ((p0 != 0) & (p1 != 0) & (p0 != p1)).astype(np.uint8)
    return bd[0] if seg.ndim == 2 else bd


def _inner_boundaries(mask: np.ndarray) -> np.ndarray:
    """skimage.segmentation.find_boundaries(mode='inner') semantics for a
    binary mask: object pixels with a 4-connected non-object neighbor
    (image border does NOT count as outside)."""
    m = mask.astype(bool)
    out = np.zeros_like(m)
    for axis in (0, 1):
        for d in (1, -1):
            nb = np.ones_like(m)
            src = [slice(None)] * 2
            dst = [slice(None)] * 2
            src[axis] = slice(1, None) if d == 1 else slice(None, -1)
            dst[axis] = slice(None, -1) if d == 1 else slice(1, None)
            nb[tuple(dst)] = m[tuple(src)]
            out |= m & ~nb
    return out


def weight_unet2d(seg: np.ndarray, w0: float = 10.0,
                  sigma: float = 5.0) -> np.ndarray:
    """U-Net paper separation weight map for a multi-instance label plane.

    Parity with data_segmentation.py:237-283: per pixel, the two smallest
    distances d1 <= d2 to INSTANCE BOUNDARIES (inner boundaries of each
    instance); weight = w0 * exp(-(d1+d2)^2 / (2 sigma^2)) (d1 only when
    a single instance exists), plus the inverse class-frequency weight.
    Distances computed by per-instance EDT instead of the reference's
    brute-force pairwise loop (identical values, O(n) not O(n*m))."""
    from scipy.ndimage import distance_transform_edt

    seg_ids = np.unique(seg)
    seg_ids = seg_ids[seg_ids > 0]
    h, w = seg.shape
    d1 = np.full((h, w), float(h + w), np.float64)
    d2 = np.full((h, w), float(h + w), np.float64)
    for sid in seg_ids:
        bounds = _inner_boundaries(seg == sid)
        if not bounds.any():
            continue
        dist = distance_transform_edt(~bounds)
        m1 = dist < d1
        d2[m1] = d1[m1]
        d1[m1] = dist[m1]
        m2 = (dist > d1) & (dist < d2) & ~m1
        d2[m2] = dist[m2]
    if len(seg_ids) == 1:
        loss_map = w0 * np.exp(-(d1 ** 2) / (2 * sigma ** 2))
    else:
        loss_map = w0 * np.exp(-((d1 + d2) ** 2) / (2 * sigma ** 2))
    wc_1 = float((seg == 0).mean())
    loss_map = loss_map.copy()
    loss_map[seg > 0] += wc_1
    loss_map[seg == 0] += 1.0 - wc_1
    return loss_map


def weight_unet3d(seg: np.ndarray, w0: float = 10.0,
                  sigma: float = 5.0) -> np.ndarray:
    """Per-slice U-Net weight map over non-empty z slices
    (data_segmentation.py:230-235).

    Deliberate deviation: returns float64 weights. The reference's
    np.zeros_like(seg) truncates each slice's weights to seg's integer
    dtype (a reference bug); that truncation is intentionally NOT
    reproduced here."""
    out = np.zeros(seg.shape, np.float64)
    zid = np.where((seg > 0).max(axis=(1, 2)))[0]
    for z in zid:
        out[z] = weight_unet2d(seg[z], w0, sigma)
    return out
