"""Device-side GT generation vs the host numpy path (exact parity)."""

import pytest
import numpy as np
import jax.numpy as jnp

from synth import blob_labels

from pixel_embedded_affinity_tpu.ops import (
    gen_affs, multi_offset, weight_binary_ratio, label_pyramid,
)
from pixel_embedded_affinity_tpu.ops.affinity_jax import (
    gen_affs_jax, weight_binary_ratio_jax, label_pyramid_jax,
    build_targets_2d_jax,
)

pytestmark = pytest.mark.slow


def test_gen_affs_jax_matches_numpy():
    lab = blob_labels(48, 52, grid=3, radius=6).astype(np.int32)
    offsets = multi_offset([1, 3, 5, 9, 27], neighbor=4)
    for padding in (True, False):
        exp_a, exp_m = gen_affs(lab, offsets, padding=padding)
        got_a, got_m = gen_affs_jax(jnp.asarray(lab[None]), offsets,
                                    padding=padding)
        np.testing.assert_array_equal(np.asarray(got_a)[0], exp_a)
        np.testing.assert_array_equal(np.asarray(got_m)[0],
                                      exp_m.astype(np.float32))


def test_weight_binary_ratio_jax_matches_numpy():
    lab = blob_labels(40, 40, grid=2, radius=8).astype(np.int32)
    offsets = multi_offset([1, 5], neighbor=4)
    affs, _ = gen_affs(lab, offsets, padding=True)
    exp = np.stack([weight_binary_ratio(affs[i]) for i in range(len(offsets))])
    got = np.asarray(weight_binary_ratio_jax(jnp.asarray(affs[None])))[0]
    np.testing.assert_allclose(got, exp, rtol=1e-5)

    # uniform plane -> ones
    u = np.ones((1, 1, 8, 8), np.float32)
    np.testing.assert_array_equal(
        np.asarray(weight_binary_ratio_jax(jnp.asarray(u))), np.ones_like(u))


def test_label_pyramid_jax_matches_cv2():
    lab = blob_labels(53, 47, grid=2, radius=7).astype(np.int32)
    exp = label_pyramid(lab, num_levels=4)
    got = label_pyramid_jax(jnp.asarray(lab[None]), num_levels=4)
    for e, g in zip(exp, got):
        np.testing.assert_array_equal(np.asarray(g)[0], e)


def test_build_targets_matches_host_builder():
    from pixel_embedded_affinity_tpu.data.cvppp import build_cvppp_targets

    rng = np.random.default_rng(0)
    lab = blob_labels(64, 64, grid=2, radius=9).astype(np.int32)
    img = rng.random((64, 64, 3)).astype(np.float32)
    host = build_cvppp_targets(img, lab, multi_offset([1, 3, 5, 9, 27], 4),
                               nb_half=2, separate_weight=True, rng=rng,
                               ema_intensity=False, ema_mask=False,
                               ema_flip=False)
    affs, wmap, mask, downs = build_targets_2d_jax(
        jnp.asarray(lab[None]), multi_offset([1, 3, 5, 9, 27], 4))
    np.testing.assert_array_equal(np.asarray(affs)[0], host["affs"])
    np.testing.assert_allclose(np.asarray(wmap)[0], host["wmap"], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask)[0],
                                  host["mask"].astype(np.float32))
    for k in range(4):
        np.testing.assert_allclose(np.asarray(downs[k])[0],
                                   host[f"down{k+1}"], rtol=1e-5)


def test_train_step_device_gt_matches_host_gt():
    """The device-GT train step computes the same loss as the host-GT step."""
    import jax

    from pixel_embedded_affinity_tpu.config import load_config
    from pixel_embedded_affinity_tpu.train.loop import build_model, init_state
    from pixel_embedded_affinity_tpu.train.optim import make_optimizer
    from pixel_embedded_affinity_tpu.train.train_step import make_train_step_2d

    rng = np.random.default_rng(0)
    offsets = multi_offset([1, 3, 5, 9, 27], neighbor=4)
    lab = np.stack([blob_labels(64, 64, grid=2, radius=9, seed=s)
                    for s in (1, 2)]).astype(np.int32)
    image = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    light = {"image": image, "ema_image": image.copy(),
             "seg": lab, "rules": np.zeros((2, 3), np.float32)}

    # host-GT batch from the same labels
    affs, wmap, mask, downs = build_targets_2d_jax(jnp.asarray(lab), offsets)
    full = dict(light, affs=np.asarray(affs), wmap=np.asarray(wmap),
                mask=np.asarray(mask),
                **{f"down{k+1}": np.asarray(d) for k, d in enumerate(downs)})

    cfg = load_config("cvppp")
    cfg.model.filters = (4, 6, 8, 12, 16)
    model = build_model(cfg)
    tx = make_optimizer(1e-4)
    state = init_state(cfg, model, tx, full)

    step_host = jax.jit(make_train_step_2d(model, tx, offsets,
                                           use_pallas=False))
    step_dev = jax.jit(make_train_step_2d(model, tx, offsets,
                                          use_pallas=False, device_gt=True))
    _, _, m_host = step_host(state, full)
    _, _, m_dev = step_dev(state, light)
    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]),
                               rtol=1e-5)


def test_bbbc_targets_match_device_builder():
    """BBBC's host GT (padding=True, per-channel weights) is bit-matched
    by build_targets_2d_jax — the precondition for device_gt on the
    bbbc039v1 preset."""
    import numpy as np
    import jax.numpy as jnp
    from pixel_embedded_affinity_tpu.data.bbbc import _build_bbbc_targets
    from pixel_embedded_affinity_tpu.ops import multi_offset
    from pixel_embedded_affinity_tpu.ops.affinity_jax import (
        build_targets_2d_jax)

    rng = np.random.default_rng(0)
    label = np.zeros((64, 48), np.int32)
    label[4:20, 6:22] = 1
    label[28:60, 10:40] = 2
    label[10:18, 30:44] = 3
    offsets = multi_offset([1, 3, 5, 9, 11], neighbor=4)
    image = rng.random((64, 48, 3)).astype(np.float32)
    host = _build_bbbc_targets(image, label, offsets, 2, True, rng,
                               False, False, False)
    affs, wmap, mask, downs = build_targets_2d_jax(
        jnp.asarray(label)[None], tuple(map(tuple, offsets)), neighbor=4)
    np.testing.assert_allclose(np.asarray(affs)[0], host["affs"], atol=1e-6)
    # rtol covers f32 accumulation noise between numpy and jit means on the
    # large-weight planes (observed max abs diff 1.5e-5 at rel 5.8e-7)
    np.testing.assert_allclose(np.asarray(wmap)[0], host["wmap"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mask)[0], host["mask"], atol=1e-6)
    for k, d in enumerate(downs):
        np.testing.assert_allclose(np.asarray(d)[0], host[f"down{k+1}"],
                                   rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# 3D device GT + in-jit EMA view (round 3)
# ---------------------------------------------------------------------------


def test_3d_targets_match_device_builder():
    """build_targets_3d_jax bit-matches the host 3D GT stack (12-ch affs,
    per-channel weights, xy pyramids with unit affs + weights)."""
    from synth import tile_labels_3d
    from pixel_embedded_affinity_tpu.ops.affinity_np import (
        seg_to_aff_3d, seg_to_aff_3d_12ch)
    from pixel_embedded_affinity_tpu.ops.affinity_jax import (
        build_targets_3d_jax)

    lab = tile_labels_3d(d=8, h=64, w=48, nz=2, ny=3, nx=3).astype(np.int32)
    # carve some background so weights are non-trivial
    lab[:, 10:14, 10:14] = 0
    affs_h = seg_to_aff_3d_12ch(lab).astype(np.float32)
    wmap_h = np.stack([weight_binary_ratio(affs_h[i]) for i in range(12)])
    affs_d, wmap_d, downs_d = build_targets_3d_jax(jnp.asarray(lab[None]))
    np.testing.assert_array_equal(np.asarray(affs_d)[0], affs_h)
    np.testing.assert_allclose(np.asarray(wmap_d)[0], wmap_h,
                               rtol=1e-5, atol=1e-5)
    for k, lab_d in enumerate(label_pyramid(lab, num_levels=4)):
        a = seg_to_aff_3d(lab_d).astype(np.float32)
        w = np.stack([weight_binary_ratio(a[i]) for i in range(3)])
        exp = np.concatenate([a, w], axis=0)
        np.testing.assert_allclose(np.asarray(downs_d[k])[0], exp,
                                   rtol=1e-5, atol=1e-5)


def test_flip_2d_roundtrip_and_host_parity():
    """device_aug.flip_2d == host simple_augment per rule, and the train
    step's convert_consistency_flip_jax inverts it exactly."""
    from pixel_embedded_affinity_tpu.data.device_aug import flip_2d
    from pixel_embedded_affinity_tpu.data.consistency import (
        simple_augment, convert_consistency_flip_jax)

    rng = np.random.default_rng(0)
    img = rng.random((8, 16, 16, 3)).astype(np.float32)
    rules = rng.integers(0, 2, (8, 3)).astype(np.float32)
    flipped = np.asarray(flip_2d(jnp.asarray(img), jnp.asarray(rules)))
    for b in range(8):
        exp = simple_augment(img[b], rules[b].astype(np.uint8))
        np.testing.assert_array_equal(flipped[b], exp)
    back = np.asarray(convert_consistency_flip_jax(
        jnp.asarray(flipped), jnp.asarray(rules)))
    np.testing.assert_array_equal(back, img)


def test_flip_3d_roundtrip_and_host_parity():
    from pixel_embedded_affinity_tpu.data.device_aug import flip_3d_rule4
    from pixel_embedded_affinity_tpu.data.ac3ac4 import (
        simple_augment_3d, convert_consistency_flip_jax_3d_rule4)

    rng = np.random.default_rng(1)
    img = rng.random((8, 4, 12, 12, 1)).astype(np.float32)
    rules = rng.integers(0, 2, (8, 4)).astype(np.float32)
    flipped = np.asarray(flip_3d_rule4(jnp.asarray(img), jnp.asarray(rules)))
    for b in range(8):
        exp = simple_augment_3d(img[b, ..., 0], rules[b].astype(np.uint8))
        np.testing.assert_array_equal(flipped[b, ..., 0], exp)
    back = np.asarray(convert_consistency_flip_jax_3d_rule4(
        jnp.asarray(flipped), jnp.asarray(rules)))
    np.testing.assert_array_equal(back, img)


def test_device_ema_perturbations_behavior():
    """In-jit EMA perturbations: ranges, cutout boxes, FG-mean fill."""
    import jax
    from pixel_embedded_affinity_tpu.data.device_aug import (
        add_intensity_2d, add_mask_2d, intensity_3d, cutout_3d)

    rng = np.random.default_rng(2)
    key = jax.random.PRNGKey(0)

    img2 = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    out = np.asarray(add_intensity_2d(img2, key))
    assert out.min() >= 0 and out.max() <= 1
    assert not np.allclose(out, np.asarray(img2))

    fg = np.zeros((2, 32, 32), np.int32)
    fg[:, 4:28, 4:28] = 1
    masked = np.asarray(add_mask_2d(img2, jnp.asarray(fg > 0), key))
    # changed pixels (if any) are set to the per-channel FG mean
    fgm = (np.asarray(img2) * fg[..., None]).sum((1, 2)) / fg.sum((1, 2))[:, None]
    for b in range(2):
        ch = np.where(~np.isclose(masked[b], np.asarray(img2)[b]))
        if len(ch[0]):
            np.testing.assert_allclose(masked[b][ch],
                                       np.broadcast_to(fgm[b], (32, 32, 3))[ch],
                                       rtol=1e-5)

    img3 = jnp.asarray(rng.random((2, 6, 24, 24, 1)).astype(np.float32))
    out3 = np.asarray(intensity_3d(img3, key))
    assert out3.min() >= 0 and out3.max() <= 1
    cut = np.asarray(cutout_3d(img3, key))
    zeroed = (cut == 0) & (np.asarray(img3) != 0)
    assert zeroed.any()  # some box landed (counts up to 60 at p uniform)


def test_3d_train_step_device_gt_matches_host():
    """Same batch, host-built vs device-built 3D targets -> identical loss."""
    import jax
    from synth import tile_labels_3d
    from pixel_embedded_affinity_tpu.config import load_config
    from pixel_embedded_affinity_tpu.data.ac3ac4 import AC3AC4Train
    from pixel_embedded_affinity_tpu.data.provider import collate
    from pixel_embedded_affinity_tpu.train.loop import build_model, init_state
    from pixel_embedded_affinity_tpu.train.optim import make_optimizer
    from pixel_embedded_affinity_tpu.train.train_step import (
        make_train_step_3d)

    rng = np.random.default_rng(3)
    raw = (rng.random((24, 80, 80)) * 255).astype(np.uint8)
    lab = tile_labels_3d(d=24, h=80, w=80, nz=3, ny=3, nx=3)
    ds_full = AC3AC4Train("", train_split=24, crop_size=(8, 32, 32),
                          padding=4, aug_prob=0.0, arrays=(raw, lab), seed=9)
    ds_light = AC3AC4Train("", train_split=24, crop_size=(8, 32, 32),
                           padding=4, aug_prob=0.0, light=True,
                           arrays=(raw, lab), seed=9)
    full = collate([ds_full.sample(np.random.default_rng(5))])
    light = collate([ds_light.sample(np.random.default_rng(5))])
    np.testing.assert_array_equal(full["seg"], light["seg"])
    # identical EMA view/rules (same rng stream order)
    np.testing.assert_array_equal(full["ema_image"], light["ema_image"])

    cfg = load_config("ac3ac4")
    cfg.model.filters = (4, 6, 8, 12, 16)
    model = build_model(cfg)
    tx = make_optimizer(1e-4)
    state = init_state(cfg, model, tx, full)
    step_host = jax.jit(make_train_step_3d(model, tx, use_pallas=False))
    step_dev = jax.jit(make_train_step_3d(model, tx, use_pallas=False,
                                          device_gt=True))
    _, _, m_host = step_host(state, full)
    _, _, m_dev = step_dev(state, light)
    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]),
                               rtol=1e-5)


def test_3d_train_step_device_ema_runs():
    """device_gt + device_ema: batch = image+seg only; step runs, loss
    finite, and the in-jit EMA view actually perturbs (cross loss off the
    clean-identity value)."""
    import jax
    from synth import tile_labels_3d
    from pixel_embedded_affinity_tpu.config import load_config
    from pixel_embedded_affinity_tpu.data.ac3ac4 import AC3AC4Train
    from pixel_embedded_affinity_tpu.data.provider import collate
    from pixel_embedded_affinity_tpu.train.loop import build_model, init_state
    from pixel_embedded_affinity_tpu.train.optim import make_optimizer
    from pixel_embedded_affinity_tpu.train.train_step import (
        make_train_step_3d)

    rng = np.random.default_rng(4)
    raw = (rng.random((24, 80, 80)) * 255).astype(np.uint8)
    lab = tile_labels_3d(d=24, h=80, w=80, nz=3, ny=3, nx=3)
    ds = AC3AC4Train("", train_split=24, crop_size=(8, 32, 32), padding=4,
                     aug_prob=0.0, light=True, device_ema=True,
                     arrays=(raw, lab), seed=9)
    batch = collate([ds.sample(np.random.default_rng(5))])
    assert set(batch) == {"image", "seg"}

    cfg = load_config("ac3ac4")
    cfg.model.filters = (4, 6, 8, 12, 16)
    model = build_model(cfg)
    tx = make_optimizer(1e-4)
    state = init_state(cfg, model, tx, batch)
    step = jax.jit(make_train_step_3d(model, tx, use_pallas=False,
                                      device_gt=True, device_ema=True))
    state, pred, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_cross"]) > 0
