"""Tests for ablation losses, ResNet embedding models, clustering decode,
mutex-style GT, and EMA helpers."""

import numpy as np
import jax
import jax.numpy as jnp

from synth import blob_labels

from pixel_embedded_affinity_tpu.ops.losses_extra import (
    discriminative_loss, cosine_affinity_2d,
    embeddings_to_affinities_distance, rescaled_affinity,
)
from pixel_embedded_affinity_tpu.ops.offsets import shift_channels_offsets
from pixel_embedded_affinity_tpu.ops.affinity_np import gen_affs_mutex_3d
from pixel_embedded_affinity_tpu.utils.ema import (
    update_ema_variables, sigmoid_rampup,
)


def test_discriminative_loss_separates():
    """Well-separated embeddings give lower loss than collapsed ones."""
    rng = np.random.default_rng(0)
    seg = np.zeros((1, 16, 16), np.int32)
    seg[0, :8] = 1
    seg[0, 8:] = 2
    # collapsed embedding
    e_bad = jnp.asarray(rng.normal(0, 0.01, (1, 16, 16, 4)).astype(np.float32))
    # separated embedding
    e_good = np.zeros((1, 16, 16, 4), np.float32)
    e_good[0, :8, :, 0] = 4.0
    e_good[0, 8:, :, 1] = 4.0
    l_bad = float(discriminative_loss(e_bad, jnp.asarray(seg),
                                      include_background=False))
    l_good = float(discriminative_loss(jnp.asarray(e_good), jnp.asarray(seg),
                                       include_background=False))
    assert l_good < l_bad
    # jit-compilable
    jl = jax.jit(lambda e, s: discriminative_loss(e, s))(jnp.asarray(e_good),
                                                         jnp.asarray(seg))
    assert np.isfinite(float(jl))


def test_discriminative_loss_gradient_finite():
    """Regression: the vectorized pairwise-centroid distance materializes
    the i==j diagonal and absent-label zero means; an unguarded norm(0)
    there has a NaN gradient even though the forward value is masked
    (0 * nan = nan in the cotangent). Caught as params->NaN after one
    ResNet-50 discriminative train step on chip; grads must be finite for
    every label topology, including single-instance and empty crops."""
    rng = np.random.default_rng(0)
    for seg_case in ("two", "one", "empty"):
        seg = np.zeros((2, 12, 12), np.int32)
        if seg_case == "two":
            seg[:, :6] = 1
            seg[:, 6:] = 2
        elif seg_case == "one":
            seg[:, 3:9, 3:9] = 1
        e = jnp.asarray(rng.normal(0, 1, (2, 12, 12, 4)).astype(np.float32))
        g = jax.grad(lambda em: discriminative_loss(em, jnp.asarray(seg)))(e)
        assert np.isfinite(np.asarray(g)).all(), seg_case


def test_cosine_affinity_clamped():
    rng = np.random.default_rng(1)
    e = jnp.asarray(rng.normal(size=(1, 12, 12, 4)).astype(np.float32))
    a = cosine_affinity_2d(e, [(-1, 0), (0, -1)])
    assert a.shape == (1, 2, 12, 12)
    assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0


def test_distance_affinity_identity():
    e = jnp.ones((1, 8, 8, 4))
    a = embeddings_to_affinities_distance(e, [(-1, 0), (0, -3)], delta=1.5)
    np.testing.assert_allclose(np.asarray(a), 1.0, atol=1e-6)
    r = rescaled_affinity(jnp.asarray([-1.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(r), [0.0, 0.5, 1.0])


def test_shift_channels_tables():
    for n in (3, 7, 9, 15, 17, 23):
        offs = shift_channels_offsets(n)
        assert len(offs) == n
        assert offs[0] == [-1, 0, 0]


def test_gen_affs_mutex_3d():
    lab = np.zeros((4, 10, 10), np.int64)
    lab[:, :5] = 1
    lab[:, 5:] = 2
    offs = shift_channels_offsets(3)
    affs = gen_affs_mutex_3d(lab, offs, padding=False, background=False)
    assert affs.shape == (3, 4, 10, 10)
    # y-affinity across the boundary at y=5 is 0; inside is 1
    assert affs[1, 1, 5, 3] == 0
    assert affs[1, 1, 3, 3] == 1


def test_resnet_embedding_shapes():
    from pixel_embedded_affinity_tpu.models import ResNetEmbedding

    model = ResNetEmbedding(depth=50, emd=8, out_channels=2)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert len(outs) == 6
    shapes = [tuple(o.shape) for o in outs]
    assert shapes[0] == (1, 4, 4, 8)     # 1/16
    assert shapes[3] == (1, 32, 32, 8)   # 1/2
    assert shapes[4] == (1, 64, 64, 8)   # 1/1 embedding
    assert shapes[5] == (1, 64, 64, 2)   # mask


def test_cluster_decode():
    from pixel_embedded_affinity_tpu.postproc.cluster import cluster_embeddings

    lab = blob_labels(48, 48, grid=2, radius=9)
    emb = np.zeros((48, 48, 4), np.float32)
    for i in range(1, lab.max() + 1):
        emb[lab == i] = np.eye(4)[i % 4] * 3 + i
    fg = (lab > 0).astype(np.uint8)
    seg = cluster_embeddings(emb, fg, method="dbscan", eps=0.5, min_samples=5,
                             subsample=1)
    from synth import partitions_equal

    assert partitions_equal(seg, lab)


def test_ema_update():
    p = {"w": jnp.ones((2, 2))}
    t = {"w": jnp.zeros((2, 2))}
    t2 = update_ema_variables(p, t, alpha=0.99, global_step=1000)
    np.testing.assert_allclose(np.asarray(t2["w"]), 0.01, atol=1e-6)
    assert sigmoid_rampup(0, 100) < sigmoid_rampup(50, 100) < 1.0
    assert sigmoid_rampup(100, 100) == 1.0


def test_random_affine_and_rsis_mode(tmp_path):
    from pixel_embedded_affinity_tpu.data.augment2d import random_affine

    rng = np.random.default_rng(0)
    img = rng.random((64, 60, 3)).astype(np.float32)
    lab = blob_labels(64, 60, grid=2, radius=8)
    img2, lab2 = random_affine(img, lab, rng)
    assert img2.shape == img.shape and lab2.shape == lab.shape
    assert set(np.unique(lab2)) <= set(np.unique(lab))

    from pixel_embedded_affinity_tpu.data.cvppp import synthesize, CVPPPTrain

    folder = str(tmp_path / "cvppp")
    synthesize(folder, n_train=4, n_valid=1, h=114, w=84)
    ds = CVPPPTrain(folder, size=128, aug_mode="rsis")
    s = ds.sample(np.random.default_rng(1))
    assert s["image"].shape == (128, 128, 3)
    assert s["affs"].shape == (10, 128, 128)


def test_mean_iou():
    from pixel_embedded_affinity_tpu.metrics.sbd import mean_iou

    gt = np.array([[0, 0, 1, 1]])
    assert mean_iou(gt, gt, 2) == 1.0
    pred = np.array([[0, 1, 1, 1]])
    # class 0: i=1 u=2; class 1: i=2 u=3
    assert np.isclose(mean_iou(pred, gt, 2), (0.5 + 2 / 3) / 2)


def test_em_artifact_augmentations():
    from pixel_embedded_affinity_tpu.data.ac3ac4 import (
        missing_section_augment, misalign_augment)

    rng = np.random.default_rng(0)
    imgs = np.full((8, 20, 20), 0.5, np.float32)
    out = missing_section_augment(imgs, rng, max_sections=2, fill_mode="zero")
    changed = [(out[z] != imgs[z]).any() for z in range(8)]
    assert 1 <= sum(changed) <= 2
    assert (out[np.argmax(changed)] == 0).all()

    lab = np.arange(8 * 20 * 20).reshape(8, 20, 20)
    imgs2, lab2 = misalign_augment(imgs, lab, np.random.default_rng(3))
    assert imgs2.shape == imgs.shape
    # slices below the misalignment point are untouched
    assert (lab2[0] == lab[0]).all()


def test_cutblur_cutnoise_regions():
    """CutBlur/CutNoise modify only a cuboid region and preserve range."""
    from pixel_embedded_affinity_tpu.data.augment2d import cutblur, cutnoise

    rng = np.random.default_rng(0)
    stack = rng.random((1, 64, 64)).astype(np.float32)
    out = cutblur(stack, rng, length_ratio=0.25)
    assert out.shape == stack.shape
    changed = out != stack
    assert 0 < changed.sum() <= int(0.25 * 64) ** 2  # only the cuboid
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-6

    rng = np.random.default_rng(1)
    stack3 = rng.random((8, 48, 48)).astype(np.float32)
    out3 = cutnoise(stack3, rng, length_ratio=0.5, scale=0.2)
    changed = out3 != stack3
    assert 0 < changed.sum() <= (8 // 2 + 1) * 24 * 24
    assert np.all(np.abs(out3 - stack3) <= 0.2 + 1e-6)
    assert out3.min() >= 0 and out3.max() <= 1


def test_mixup_batch_convexity():
    from pixel_embedded_affinity_tpu.data.augment2d import mixup_batch

    rng = np.random.default_rng(2)
    batch = np.stack([np.full((4, 4), float(i)) for i in range(4)])
    out = mixup_batch(batch, rng, num_aug=2)
    n_changed = sum(not np.allclose(out[i], batch[i]) for i in range(4))
    assert n_changed == 2
    for i in range(4):
        # each sample stays a convex combination of two originals
        v = out[i].flat[0]
        assert np.allclose(out[i], v)
        lo, hi = batch.min(), batch.max()
        assert lo <= v <= hi


def test_motion_blur_applies_mean_kernel():
    from pixel_embedded_affinity_tpu.data.augment2d import motion_blur

    rng = np.random.default_rng(3)
    stack = np.zeros((1, 32, 32), np.float32)
    stack[0, 16, 16] = 1.0
    out = motion_blur(stack, rng, sections=1, kernel_size=11)
    # the impulse is spread along one axis into 11 values of 1/11
    assert np.isclose(out.sum(), 1.0, atol=1e-5)
    assert np.isclose(out.max(), 1 / 11, atol=1e-5)
    assert (out > 0).sum() == 11


def test_missing_parts_fills_band_with_mean():
    from pixel_embedded_affinity_tpu.data.augment2d import missing_parts

    rng = np.random.default_rng(4)
    stack = rng.random((3, 50, 40)).astype(np.float32)  # non-square
    out = missing_parts(stack, rng, iterations=5, p=1.0)
    assert out.shape == stack.shape
    # slice 0 must be augmented (p=1); its band equals the slice mean
    changed = out[0] != stack[0]
    assert changed.sum() > 0
    band_vals = np.unique(np.round(out[0][changed], 5))
    assert len(band_vals) == 1
    assert np.isclose(band_vals[0], stack[0].mean(), atol=1e-4)
    # at most one deformed slice in any 3 consecutive (i += 2 rule)
    aug_idx = [i for i in range(3) if (out[i] != stack[i]).any()]
    assert aug_idx == [0]


def test_random_rotate_arbitrary_angle():
    """random_rotate matches scipy.ndimage.rotate semantics on a labeled
    fixture: arbitrary angle about the center, image bilinear, label
    nearest, constant-zero border (rotation.py:40-57 parity)."""
    from pixel_embedded_affinity_tpu.data.augment2d import random_rotate

    class FixedAngle:
        """rng whose first random() drives the angle."""

        def __init__(self, frac):
            self.frac = frac

        def random(self):
            return self.frac

    h = w = 64
    label = np.zeros((h, w), np.int32)
    label[10:30, 12:40] = 1
    label[40:58, 8:28] = 2
    img = (label > 0).astype(np.float32) * 0.8 + 0.1

    # angle distribution: rand()*360, so frac=0.25 -> 90 degrees CCW about
    # the center; compare against scipy rotate (reshape=False, same pivot
    # convention for even sizes differs by the half-pixel cv2 center, so
    # check on the interior away from the 1px rim)
    from scipy.ndimage import rotate as nd_rotate

    img_o, lab_o = random_rotate(img, label, FixedAngle(0.25))
    ref_img = nd_rotate(img, 90, reshape=False, order=1, mode="constant")
    ref_lab = nd_rotate(label, 90, reshape=False, order=0, mode="constant")
    inner = (slice(2, -2), slice(2, -2))
    # cv2's center (h/2, w/2) vs scipy's (h-1)/2: for a 90-degree turn on an
    # even-sized grid the grids align after a 1px shift
    assert (lab_o[inner] == ref_lab[1:-3, 2:-2]).mean() > 0.98
    assert np.abs(img_o[inner] - ref_img[1:-3, 2:-2]).mean() < 0.02
    assert lab_o.dtype == label.dtype

    # a non-multiple-of-90 angle must produce rotated (not rot90) content
    img_o2, lab_o2 = random_rotate(img, label, FixedAngle(0.1))  # 36 deg
    for k in range(4):
        assert (lab_o2 != np.rot90(label, k)).mean() > 0.05
    # labels stay a subset of the original ids (nearest interp, 0 border)
    assert set(np.unique(lab_o2)) <= {0, 1, 2}
