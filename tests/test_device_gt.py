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
    np.testing.assert_allclose(np.asarray(wmap)[0], host["wmap"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(mask)[0], host["mask"], atol=1e-6)
    for k, d in enumerate(downs):
        np.testing.assert_allclose(np.asarray(d)[0], host[f"down{k+1}"],
                                   atol=1e-5)
