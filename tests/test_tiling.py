"""Tiled 3D inference engine: GT-affinity round-trip through the tiler.

Productizes the reference's self-check (provider_valid.py:367-423): feeding
ground-truth affinities through tile/stitch must reproduce them exactly in
the interior (Gaussian blending of identical overlapping values is identity).
"""

import functools

import numpy as np

from synth import tile_labels_3d

from pixel_embedded_affinity_tpu.ops.affinity_np import seg_to_aff_3d_12ch
from pixel_embedded_affinity_tpu.parallel import (
    TiledInference3D, gaussian_blend_weight)
from pixel_embedded_affinity_tpu.parallel.tiling import tile_grid


def test_gaussian_weight_properties():
    w = gaussian_blend_weight((18, 160, 160))
    assert w.shape == (18, 160, 160)
    assert w.max() <= 1.0 + 1e-5
    c = w[9, 80, 80]
    assert c > w[0, 0, 0]  # center-weighted


def test_tile_grid_covers_volume():
    shape = (28, 100, 100)
    crop = (18, 64, 64)
    stride = (10, 40, 40)
    positions = tile_grid(shape, crop, stride)
    covered = np.zeros(shape, bool)
    for z, y, x in positions:
        covered[z:z + 18, y:y + 64, x:x + 64] = True
        assert z + 18 <= shape[0] and y + 64 <= shape[1] and x + 64 <= shape[2]
    assert covered.all()


def test_tiler_roundtrip_gt_affinities():
    lab = tile_labels_3d(24, 72, 72, nz=2, ny=3, nx=3)
    gt_affs = seg_to_aff_3d_12ch(lab)  # (12, D, H, W)
    pad = (2, 8, 8)
    lab_pad = np.pad(lab, ((pad[0], pad[0]), (pad[1], pad[1]),
                           (pad[2], pad[2])), mode="reflect")
    gt_pad = seg_to_aff_3d_12ch(lab_pad)
    crop = (12, 40, 40)

    # position-encoding volume: voxel value = flat index, so each tile's
    # corner value recovers its (z, y, x) position in the padded volume
    pshape = lab_pad.shape
    enc = np.arange(np.prod(pshape), dtype=np.float32).reshape(pshape)

    def predict(tiles):
        out = np.zeros((tiles.shape[0], 12) + crop, np.float32)
        for b in range(tiles.shape[0]):
            flat = int(round(float(tiles[b, 0, 0, 0, 0])))
            z, rem = divmod(flat, pshape[1] * pshape[2])
            y, x = divmod(rem, pshape[2])
            out[b] = gt_pad[:, z:z + crop[0], y:y + crop[1], x:x + crop[2]]
        return out

    engine = TiledInference3D(crop_size=crop, stride=(6, 20, 20), padding=pad,
                              batch_size=4, device_accumulate=False)
    # run on the *unpadded* encoding so the engine's own reflect pad
    # reproduces enc's interior; instead pre-strip: feed enc's interior
    inner = enc[pad[0]:pshape[0] - pad[0], pad[1]:pshape[1] - pad[1],
                pad[2]:pshape[2] - pad[2]]
    # the engine pads with reflect which would NOT equal enc at borders, so
    # emulate by overriding: run on a volume whose reflect-pad == enc is not
    # possible; instead accept corner decoding only for interior tiles by
    # monkey-running on enc directly with zero padding:
    engine.padding = (0, 0, 0)
    stitched_pad = engine.run(enc, predict, n_channels=12)
    stitched = stitched_pad[:, pad[0]:pshape[0] - pad[0],
                            pad[1]:pshape[1] - pad[1],
                            pad[2]:pshape[2] - pad[2]]
    assert stitched.shape == (12, 24, 72, 72)
    # every tile returns the exact GT crop, so Gaussian blending of agreeing
    # overlaps must reproduce GT exactly; compare away from the volume border
    # (long-range channels see the pad there)
    m = 28
    sl = (slice(None), slice(4, -4), slice(m, -m), slice(m, -m))
    np.testing.assert_allclose(stitched[sl], gt_affs[sl], atol=1e-4)


def test_tiler_constant_volume_identity():
    """Constant predictions stitch to exactly that constant everywhere."""
    vol = np.zeros((20, 48, 48), np.float32)

    def predict(tiles):
        return np.full((tiles.shape[0], 3, 12, 32, 32), 0.7, np.float32)

    engine = TiledInference3D(crop_size=(12, 32, 32), stride=(6, 16, 16),
                              padding=(2, 8, 8), batch_size=4,
                              device_accumulate=False)
    out = engine.run(vol, predict, n_channels=3)
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_device_resident_matches_host_path():
    """run_device_resident == run (constant predictor, CPU)."""
    import jax
    import jax.numpy as jnp

    vol = np.random.default_rng(0).random((20, 48, 48)).astype(np.float32)

    def predict_np(tiles):
        return np.full((tiles.shape[0], 3, 12, 32, 32), 0.7, np.float32)

    def predict_jnp(tiles):
        return jnp.full((tiles.shape[0], 3, 12, 32, 32), 0.7, jnp.float32)

    engine = TiledInference3D(crop_size=(12, 32, 32), stride=(6, 16, 16),
                              padding=(2, 8, 8), batch_size=4,
                              device_accumulate=False)
    a = engine.run(vol, predict_np, n_channels=3)
    b = engine.run_device_resident(vol, predict_jnp, n_channels=3)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_device_resident_tile_content():
    """Tiles extracted on device carry the right content (mean predictor)."""
    import jax.numpy as jnp

    vol = np.random.default_rng(1).random((16, 40, 40)).astype(np.float32)

    def predict(tiles):
        # broadcast each tile's mean across one channel
        m = jnp.mean(tiles[..., 0], axis=(1, 2, 3))
        return jnp.ones((tiles.shape[0], 1, 12, 24, 24)) * m[:, None, None,
                                                             None, None]

    engine = TiledInference3D(crop_size=(12, 24, 24), stride=(6, 12, 12),
                              padding=(2, 4, 4), batch_size=2)
    out = engine.run_device_resident(vol, predict, n_channels=1)
    assert out.shape == (1, 16, 40, 40)
    # values must be near the volume's global mean (tile means blend)
    assert abs(out.mean() - vol.mean()) < 0.15


def test_tile_parallel_predict_over_mesh():
    """Tile batches shard over the 8-device mesh (tile parallelism)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P, NamedSharding

    from pixel_embedded_affinity_tpu.parallel import get_mesh, batch_sharding

    mesh = get_mesh()
    bsh = batch_sharding(mesh)

    @functools.partial(jax.jit, in_shardings=(bsh,), out_shardings=bsh)
    def predict(tiles):
        return jnp.mean(tiles, axis=-1, keepdims=True).transpose(
            0, 4, 1, 2, 3) * jnp.ones((1, 3, 1, 1, 1))

    vol = np.random.default_rng(0).random((16, 40, 40)).astype(np.float32)
    engine = TiledInference3D(crop_size=(12, 24, 24), stride=(6, 12, 12),
                              padding=(2, 4, 4), batch_size=8,
                              device_accumulate=False)
    out = engine.run(vol, lambda t: np.asarray(predict(jnp.asarray(t))),
                     n_channels=3)
    assert out.shape == (3, 16, 40, 40)
    assert np.isfinite(out).all()



def test_mesh_native_tiled_inference_matches_single_device():
    """TiledInference3D(mesh=...) shards the tile batch over the 8-device
    CPU mesh internally and must produce a canvas identical to the
    single-device engine (VERDICT r1 item 9)."""
    import jax
    import jax.numpy as jnp

    from pixel_embedded_affinity_tpu.parallel import get_mesh
    from pixel_embedded_affinity_tpu.parallel.tiling import TiledInference3D

    rng = np.random.default_rng(0)
    vol = rng.random((12, 40, 40)).astype(np.float32)

    def predict_fn(tiles):  # (B, d, h, w, 1) -> (B, 3, d, h, w)
        t = tiles[..., 0]
        return jnp.stack([t, t * 0.5, -t], axis=1)

    kw = dict(crop_size=(6, 16, 16), stride=(4, 8, 8), padding=(2, 4, 4),
              batch_size=8)
    single = TiledInference3D(**kw)
    meshed = TiledInference3D(**kw, mesh=get_mesh())

    out1 = single.run_device_resident(vol, predict_fn, n_channels=3)
    out2 = meshed.run_device_resident(vol, predict_fn, n_channels=3)
    np.testing.assert_allclose(out1, out2, atol=1e-6)

    out3 = meshed.run(vol, predict_fn, n_channels=3)
    np.testing.assert_allclose(out1, out3, atol=1e-5)


def test_dense_strip_sweep_matches_scatter_path():
    """Regular-grid dense-strip sweep == per-tile scatter stitching.

    The reference AC3 serving geometry is exactly regular; the dense
    sweep (static x-interleave + lane-aligned strip updates) must
    reproduce the scatter path's stitched canvas on a content-dependent
    predictor. Geometry here is a scaled-down regular grid (crop = 2x
    stride in every dim, no clamping)."""
    import jax.numpy as jnp

    from pixel_embedded_affinity_tpu.parallel.tiling import (
        regular_grid_dims)

    rng = np.random.default_rng(7)
    vol = rng.random((16, 56, 56)).astype(np.float32)

    def predict_fn(tiles):  # (B, d, h, w, 1) -> (B, 2, d, h, w)
        t = tiles[..., 0]
        return jnp.stack([t * 2.0, jnp.flip(t, axis=-1)], axis=1)

    kw = dict(crop_size=(8, 16, 16), stride=(4, 8, 8), padding=(2, 4, 4),
              batch_size=4)
    engine = TiledInference3D(**kw, dense=True)
    padded = tuple(v + 2 * p for v, p in zip(vol.shape, kw["padding"]))
    assert regular_grid_dims(padded, kw["crop_size"], kw["stride"]) is not None

    dense = engine.run_device_resident(vol, predict_fn, n_channels=2)
    scatter = engine.run(vol, predict_fn, n_channels=2)  # per-batch scatter
    np.testing.assert_allclose(dense, scatter, atol=1e-5)
    # the scatter device-resident sweep must agree too (cached-sweep path)
    sc2 = TiledInference3D(**kw).run_device_resident(vol, predict_fn,
                                                     n_channels=2)
    np.testing.assert_allclose(sc2, scatter, atol=1e-5)


def test_dense_strip_fallback_on_irregular_grid():
    """Geometries the dense sweep does not admit (x crop not a stride
    multiple here, plus a z-clamped grid) must fall back to the scatter
    sweep and still stitch correctly (constant predictor -> constant)."""
    import jax.numpy as jnp

    from pixel_embedded_affinity_tpu.parallel.tiling import (
        regular_grid_dims)

    vol = np.random.default_rng(3).random((13, 40, 44)).astype(np.float32)
    kw = dict(crop_size=(8, 16, 16), stride=(4, 8, 12), padding=(2, 4, 4),
              batch_size=4)
    padded = tuple(v + 2 * p for v, p in zip(vol.shape, kw["padding"]))
    # z: (17-8)%4 != 0 -> clamped grid; x: 16 % 12 != 0 -> no dense split
    assert regular_grid_dims(padded, kw["crop_size"], kw["stride"]) is None
    assert kw["crop_size"][2] % kw["stride"][2] != 0

    def predict_fn(tiles):
        return jnp.full((tiles.shape[0], 2) + tiles.shape[1:4], 0.3,
                        jnp.float32)

    engine = TiledInference3D(**kw)
    out = engine.run_device_resident(vol, predict_fn, n_channels=2)
    np.testing.assert_allclose(out, 0.3, atol=1e-5)
