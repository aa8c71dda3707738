"""Provider threading, device prefetch, freezing, baselines, viz, checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp

from synth import blob_labels, tile_labels_3d, partitions_equal


class ToyDataset:
    def sample(self, rng):
        return {"x": rng.normal(size=(4, 4)).astype(np.float32),
                "y": np.float32(rng.random())}


def test_provider_threads_and_collate():
    from pixel_embedded_affinity_tpu.data.provider import Provider

    p = Provider(ToyDataset(), batch_size=4, num_workers=3, seed=1)
    b1 = p.next()
    b2 = p.next()
    assert b1["x"].shape == (4, 4, 4)
    assert b1["y"].shape == (4,)
    assert not np.allclose(b1["x"], b2["x"])
    p.close()


def test_provider_surfaces_worker_errors():
    import pytest

    from pixel_embedded_affinity_tpu.data.provider import Provider

    class Bad:
        def sample(self, rng):
            raise ValueError("boom")

    p = Provider(Bad(), batch_size=1, num_workers=1)
    with pytest.raises(ValueError, match="boom"):
        p.next()


def test_device_prefetch():
    from pixel_embedded_affinity_tpu.data.provider import device_prefetch

    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    assert float(out[3]["x"][0, 0]) == 3.0


def test_freeze_by_prefix():
    import optax

    from pixel_embedded_affinity_tpu.train.freeze import (
        freeze_by_prefix, trainable_param_count)

    params = {"inconv": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(2)}}
    tx = freeze_by_prefix(optax.sgd(1.0), params, frozen_prefixes=("inconv",))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert np.allclose(np.asarray(updates["inconv"]["w"]), 0.0)
    assert not np.allclose(np.asarray(updates["head"]["w"]), 0.0)
    assert trainable_param_count(params, ("inconv",)) == 2


def test_agglomerate_multi_threshold():
    from pixel_embedded_affinity_tpu.postproc.agglomerate import (
        agglomerate_multi)

    frag = np.zeros((1, 4, 12), np.uint64)
    frag[0, :, :4] = 1
    frag[0, :, 4:8] = 2
    frag[0, :, 8:] = 3
    affs = np.zeros((3, 1, 4, 12), np.float32)
    affs[:] = 1.0
    affs[2, 0, :, 4] = 0.6   # weak-ish boundary 1|2
    affs[2, 0, :, 8] = 0.1   # strong boundary 2|3
    segs = agglomerate_multi(affs, frag, thresholds=[0.3, 0.95])
    # t=0.3: only merges with mean aff > 0.7 -> nothing except interior 1.0?
    # edges: (1,2) mean 0.6 -> score 0.4 >= 0.3 kept separate;
    # (2,3) mean 0.1 -> score 0.9 separate. 3 segments.
    assert len(np.unique(segs[0])) == 3
    # t=0.95 merges (1,2) (score 0.4 < 0.95) and (2,3) (0.9 < 0.95) -> 1 seg
    assert len(np.unique(segs[1])) == 1


def test_mc_superpixel_baselines():
    from pixel_embedded_affinity_tpu.postproc.mc_baselines import (
        McSuperpixel, gen_pseudo_labels)
    from pixel_embedded_affinity_tpu.ops.affinity_np import seg_to_aff_3d
    from pixel_embedded_affinity_tpu.metrics import adapted_rand_error

    lab = tile_labels_3d(4, 40, 40, nz=1, ny=2, nx=2)
    affs = seg_to_aff_3d(lab, pad="replicate")
    seg = McSuperpixel()(affs)
    assert adapted_rand_error(lab, seg.astype(np.int64) + 1)[0] < 0.1

    from pixel_embedded_affinity_tpu.ops import multi_offset, gen_affs

    lab2 = blob_labels(48, 48, grid=2, radius=9)
    offsets = multi_offset([1, 3], neighbor=4)
    a2, _ = gen_affs(lab2, offsets, ignore=True)
    pseudo = gen_pseudo_labels(a2, offsets, strides=(2, 2), min_size=10)
    assert pseudo.max() >= 1


def test_show_utils(tmp_path):
    from pixel_embedded_affinity_tpu.utils.show import (
        draw_fragments_2d, embedding_pca, val_show, show_affs_emb)

    lab = blob_labels(32, 32, grid=2, radius=6)
    rgb = draw_fragments_2d(lab)
    assert rgb.shape == (32, 32, 3)
    assert (rgb[lab == 0] == 0).all()

    emb = np.random.default_rng(0).normal(size=(32, 32, 8))
    pca = embedding_pca(emb)
    assert pca.shape == (32, 32, 3) and pca.dtype == np.uint8

    val_show(1, np.random.rand(32, 32), np.random.rand(32, 32), lab, lab,
             str(tmp_path))
    show_affs_emb(2, np.random.rand(32, 32, 3), np.random.rand(32, 32, 3),
                  np.random.rand(32, 32), np.random.rand(32, 32), emb, emb,
                  str(tmp_path))
    import os

    assert os.path.exists(str(tmp_path / "000001.png"))
    assert os.path.exists(str(tmp_path / "000002.png"))


def test_embedding_slic_segments_piecewise_constant_embedding():
    """SLIC viz (reference scripts_ac3ac4/utils/embeddings.py:35-46): on a
    piecewise-constant embedding the superpixels must not straddle the
    quadrant boundaries, and labels must be a dense 1..K range."""
    from pixel_embedded_affinity_tpu.utils.show import embedding_slic

    emb = np.zeros((48, 48, 8))
    emb[:24, :24, 0] = 4.0
    emb[:24, 24:, 1] = 4.0
    emb[24:, :24, 2] = 4.0
    emb[24:, 24:, 3] = 4.0
    seg = embedding_slic(emb, n_segments=16, n_iter=5)
    assert seg.shape == (48, 48) and seg.min() == 1
    assert np.array_equal(np.unique(seg), np.arange(1, seg.max() + 1))
    assert seg.max() >= 4
    # each superpixel stays inside one quadrant
    quad = (np.add.outer((np.arange(48) >= 24) * 2, np.arange(48) >= 24))
    for k in range(1, seg.max() + 1):
        assert len(np.unique(quad[seg == k])) == 1, k


def test_checkpoint_roundtrip(tmp_path):
    from pixel_embedded_affinity_tpu.train.checkpoint import (
        save_checkpoint, load_checkpoint, latest_checkpoint)
    from pixel_embedded_affinity_tpu.train.train_step import TrainState

    state = TrainState(params={"w": jnp.arange(4.0)},
                       batch_stats={"bn": {"mean": jnp.zeros(2)}},
                       opt_state=(), step=jnp.asarray(7))
    f = save_checkpoint(str(tmp_path), state, 7)
    assert latest_checkpoint(str(tmp_path)) == f
    restored = load_checkpoint(f)
    np.testing.assert_allclose(restored["params"]["w"], [0, 1, 2, 3])
    assert restored["step"] == 7


def test_throughput_meter():
    from pixel_embedded_affinity_tpu.utils.profiling import ThroughputMeter

    m = ThroughputMeter(warmup=1)
    for _ in range(5):
        m.step(10.0)
    assert m.rate > 0
