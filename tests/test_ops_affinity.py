"""Golden tests for offset geometry + host affinity transforms.

Brute-force oracles are written from the reference formulas (scipy shift /
O(n^2) loops), independent of the vectorized implementations under test.
"""

import numpy as np
import pytest
from scipy.ndimage import shift as nd_shift

from pixel_embedded_affinity_tpu.ops import (
    gen_offsets, multi_offset, offsets_3d, SHIFTS_3D,
    gen_affs, seg_to_aff_3d, weight_binary_ratio, seg_widen_border,
    relabel, remove_small, label_pyramid,
)
from pixel_embedded_affinity_tpu.ops.affinity_np import seg_to_aff_3d_12ch


def random_labels(shape, n_instances=6, seed=0):
    rng = np.random.default_rng(seed)
    lab = rng.integers(0, n_instances + 1, size=shape).astype(np.int64)
    return lab


def test_offsets_2d():
    assert gen_offsets(3, 4) == [[-3, 0], [0, -3]]
    assert gen_offsets(2, 8) == [[-2, 0], [0, -2], [-2, -2], [-2, 2]]
    offs = multi_offset([1, 3, 5, 9, 27], neighbor=4)
    assert len(offs) == 10
    assert offs[0] == [-1, 0] and offs[-1] == [0, -27]


def test_offsets_3d_table():
    offs = offsets_3d()
    assert len(offs) == 12
    assert offs[0] == [-1, 0, 0]
    assert offs[3] == [-2, 0, 0]
    assert offs[4] == [0, -3, 0]
    assert offs[11] == [0, 0, -27]
    assert tuple(SHIFTS_3D) == (1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27)


def brute_gen_affs(labels, offsets, ignore, padding):
    """Reference formula via scipy.ndimage.shift (order 0, cval 0)."""
    n = len(offsets)
    affs = np.zeros((n,) + labels.shape, dtype=np.float32)
    masks = np.zeros((n,) + labels.shape, dtype=np.uint8)
    for cid, off in enumerate(offsets):
        shift_off = [-x for x in off]
        shifted = nd_shift(labels, shift_off, order=0, prefilter=False)
        mask = nd_shift(np.ones_like(labels), shift_off, order=0, prefilter=False)
        dif = labels - shifted
        out = dif.copy().astype(np.float32)
        out[dif == 0] = 1
        out[dif != 0] = 0
        if ignore:
            out[labels == 0] = 0
            out[shifted == 0] = 0
        out[mask == 0] = 1 if padding else 0
        affs[cid] = out
        masks[cid] = mask
    return affs, masks


@pytest.mark.parametrize("ignore", [False, True])
@pytest.mark.parametrize("padding", [False, True])
def test_gen_affs_matches_reference_formula(ignore, padding):
    labels = random_labels((37, 43), seed=1)
    offsets = multi_offset([1, 3, 5, 9, 27], neighbor=4)
    got_a, got_m = gen_affs(labels, offsets, ignore=ignore, padding=padding)
    exp_a, exp_m = brute_gen_affs(labels, offsets, ignore, padding)
    np.testing.assert_array_equal(got_a, exp_a)
    np.testing.assert_array_equal(got_m, exp_m)


def test_gen_affs_neighbor8():
    labels = random_labels((20, 25), seed=3)
    offsets = multi_offset([1, 2], neighbor=8)
    got_a, got_m = gen_affs(labels, offsets, padding=True)
    exp_a, exp_m = brute_gen_affs(labels, offsets, False, True)
    np.testing.assert_array_equal(got_a, exp_a)
    np.testing.assert_array_equal(got_m, exp_m)


def brute_seg_to_aff(seg, nhood, pad):
    nhood = np.asarray(nhood)
    n_edge = nhood.shape[0]
    aff = np.zeros((n_edge,) + seg.shape, dtype=np.float32)
    it = np.ndindex(*seg.shape)
    for p in it:
        for e in range(n_edge):
            q = tuple(np.asarray(p) + nhood[e])
            if all(0 <= qi < s for qi, s in zip(q, seg.shape)):
                # reference writes at the *high* coordinate of the pair
                pass
    # direct translation of slicing semantics instead (faster oracle):
    for e in range(n_edge):
        sl_a, sl_b = [], []
        for d in range(seg.ndim):
            o = int(nhood[e, d])
            n = seg.shape[d]
            sl_a.append(slice(max(0, -o), min(n, n - o)))
            sl_b.append(slice(max(0, o), min(n, n + o)))
        a = seg[tuple(sl_a)]
        b = seg[tuple(sl_b)]
        aff[(e,) + tuple(sl_a)] = ((a == b) * (a > 0) * (b > 0)).astype(np.float32)
    if pad == "replicate" and n_edge == seg.ndim:
        if seg.ndim == 3:
            aff[0, 0] = (seg[0] > 0)
            aff[1, :, 0] = (seg[:, 0] > 0)
            aff[2, :, :, 0] = (seg[:, :, 0] > 0)
        else:
            aff[0, 0] = (seg[0] > 0)
            aff[1, :, 0] = (seg[:, 0] > 0)
    return aff


@pytest.mark.parametrize("pad", ["replicate", ""])
def test_seg_to_aff_3d(pad):
    seg = random_labels((9, 21, 23), seed=2)
    got = seg_to_aff_3d(seg, ((-1, 0, 0), (0, -1, 0), (0, 0, -1)), pad=pad)
    exp = brute_seg_to_aff(seg, ((-1, 0, 0), (0, -1, 0), (0, 0, -1)), pad)
    np.testing.assert_array_equal(got, exp)


def test_seg_to_aff_3d_12ch_shapes_and_validity():
    seg = random_labels((8, 40, 40), seed=5)
    affs = seg_to_aff_3d_12ch(seg)
    assert affs.shape == (12, 8, 40, 40)
    # channel 9 shifts z by 4: first 4 z-slabs must be zero (pad='')
    assert affs[9, :4].max() == 0
    # channel 10 shifts y by 27
    assert affs[10, :, :27].max() == 0
    # channel 11 shifts x by 27
    assert affs[11, :, :, :27].max() == 0


def test_weight_binary_ratio():
    # uniform label -> all ones
    lab = np.zeros((10, 10))
    np.testing.assert_array_equal(weight_binary_ratio(lab), np.ones((10, 10), np.float32))
    # minority foreground gets upweighted
    lab = np.zeros((10, 10))
    lab[0, :2] = 1
    w = weight_binary_ratio(lab)
    frac = 2 / 100
    frac = np.clip(frac, 0.05, 0.99)  # clip kicks in
    expected_fg = (1 - frac) / frac
    assert np.allclose(w[0, 0], expected_fg)
    assert np.allclose(w[5, 5], 1.0)
    # majority foreground
    lab = np.ones((10, 10))
    lab[0, 0] = 0
    w = weight_binary_ratio(lab)
    frac = np.clip(0.99, 0.05, 0.99)
    assert np.allclose(w[0, 0], frac / (1 - frac))
    assert np.allclose(w[5, 5], 1.0)


def brute_widen_border(seg, tsz_h=1):
    """im2col-style direct loop oracle (reference formula)."""
    tsz = 2 * tsz_h + 1
    padded = np.pad(seg, tsz_h, "reflect")
    out = np.zeros_like(seg)
    mm = seg.max()
    H, W = seg.shape
    for y in range(H):
        for x in range(W):
            win = padded[y:y + tsz, x:x + tsz]
            p0 = win.max()
            tmp = win.copy()
            tmp[tmp == 0] = mm + 1
            p1 = tmp.min()
            out[y, x] = seg[y, x] * (p0 == p1)
    return out


def test_seg_widen_border():
    seg = random_labels((24, 30), n_instances=4, seed=7)
    got = seg_widen_border(seg.copy())
    exp = brute_widen_border(seg)
    np.testing.assert_array_equal(got, exp)


def test_relabel_and_remove_small():
    seg = np.array([[0, 5, 5], [9, 9, 9], [0, 2, 0]])
    r = relabel(seg.copy())
    assert set(np.unique(r)) == {0, 1, 2, 3}
    # order-preserving: 2 -> 1, 5 -> 2, 9 -> 3
    assert r[0, 1] == 2 and r[1, 0] == 3 and r[2, 1] == 1

    seg2 = np.array([[1, 1, 2], [1, 1, 0]])
    out = remove_small(seg2.copy(), thres=2)
    assert (out == np.array([[1, 1, 0], [1, 1, 0]])).all()


def test_label_pyramid_2d_3d():
    lab = random_labels((64, 64), seed=9)
    pyr = label_pyramid(lab, num_levels=4)
    assert [p.shape for p in pyr] == [(32, 32), (16, 16), (8, 8), (4, 4)]
    # nearest-neighbor: values must come from the original label set
    for p in pyr:
        assert set(np.unique(p)) <= set(np.unique(lab))

    lab3 = random_labels((6, 64, 64), seed=10)
    pyr3 = label_pyramid(lab3, num_levels=2)
    assert [p.shape for p in pyr3] == [(6, 32, 32), (6, 16, 16)]
