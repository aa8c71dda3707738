"""Sliding-window tiled 3D inference with Gaussian-blended overlap.

Device-resident rebuild of the reference tiling engine
(scripts_ac3ac4/data/provider_valid.py:157-348): reflect-pad the volume,
enumerate a clamped (z, y, x) tile grid, run the model on batches of tiles,
and accumulate prediction * Gaussian weight into canvas arrays.

TPU-first differences: tiles are batched (one forward per B tiles instead of
per tile), the batch axis can be sharded over a device mesh (tile
parallelism), and the weighted accumulation runs on-device as a jitted
scatter-add with donated canvases (no per-tile host round trip).
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np


def gaussian_blend_weight(out_size, sigma: float = 0.2, mu: float = 0.0):
    """exp(-d^2 / 2 sigma^2) over normalized [-1,1]^3 coords (+1e-6 floor)."""
    zz, yy, xx = np.meshgrid(
        np.linspace(-1, 1, out_size[0], dtype=np.float32),
        np.linspace(-1, 1, out_size[1], dtype=np.float32),
        np.linspace(-1, 1, out_size[2], dtype=np.float32), indexing="ij")
    dd = np.sqrt(zz * zz + yy * yy + xx * xx)
    return (1e-6 + np.exp(-((dd - mu) ** 2) / (2.0 * sigma ** 2))).astype(
        np.float32)


def regular_grid_dims(padded_shape, crop_size, stride):
    """(nz, ny, nx) when the clamped grid is exactly regular, else None.

    The reference's AC3 serving geometry is regular: padded 108x1120x1120,
    crop (18,160,160), stride (10,80,80) -> (10,13,13), no clamping
    (scripts_ac3ac4/data/provider_valid.py:157-198 computes the same
    num_zyx=[10,13,13]).
    """
    ns = []
    for d in range(3):
        r = padded_shape[d] - crop_size[d]
        if r < 0 or r % stride[d]:
            return None
        ns.append(r // stride[d] + 1)
    return tuple(ns)


def tile_grid(padded_shape, crop_size, stride):
    """Clamped tile start positions covering the padded volume."""
    num = [int(np.ceil((padded_shape[d] - crop_size[d]) / stride[d])) + 1
           for d in range(3)]
    positions = []
    for iz in range(num[0]):
        for iy in range(num[1]):
            for ix in range(num[2]):
                pos = []
                for d, i in zip(range(3), (iz, iy, ix)):
                    start = i * stride[d]
                    if start + crop_size[d] > padded_shape[d]:
                        start = padded_shape[d] - crop_size[d]
                    pos.append(start)
                positions.append(tuple(pos))
    # dedupe clamped duplicates, preserve order
    seen = set()
    out = []
    for p in positions:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


class TiledInference3D:
    """Runs ``predict_fn`` over tiles and stitches a (K, D, H, W) canvas.

    predict_fn: (B, d, h, w, 1) float32 -> (B, K, d, h, w) affinities.
    """

    def __init__(self, crop_size=(18, 160, 160), stride=(10, 80, 80),
                 padding=(4, 48, 48), sigma: float = 0.2,
                 batch_size: int = 8, device_accumulate: bool = True,
                 mesh=None, dense: bool = False):
        """``mesh``: optional jax.sharding.Mesh with a 'data' axis. The tile
        batch axis of every forward is sharded over it (tile parallelism —
        the reference's per-tile loop, provider_valid.py:212-240, is the
        unit of distribution), while the canvases stay replicated; XLA
        inserts the all-gather of the (small) per-tile affinities before
        the accumulation scatter. batch_size must divide by the mesh size."""
        self.crop_size = tuple(crop_size)
        self.stride = tuple(stride)
        self.padding = tuple(padding)
        self.batch_size = batch_size
        self.weight = gaussian_blend_weight(self.crop_size, sigma=sigma)
        self.device_accumulate = device_accumulate
        self.mesh = mesh
        # dense-strip sweep opt-in: wins engine-only (1.2 vs 1.5 s/vol at
        # AC3 geometry) but the forward chunk padding (13 -> 2x7 tiles/row)
        # loses more than the engine saves once the network dominates
        # (58.4 vs 47.9 s/vol full, docs/profile_tiled_full.py) — kept as
        # an opt-in for geometries where rows divide the forward batch.
        self.dense = dense
        if mesh is not None:
            n_dev = mesh.devices.size
            assert batch_size % n_dev == 0, (batch_size, n_dev)

    def _shard_tiles(self, tiles):
        """Constrain the tile batch axis onto the mesh 'data' axis."""
        if self.mesh is None:
            return tiles
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("data", *([None] * (tiles.ndim - 1))))
        return jax.lax.with_sharding_constraint(tiles, sh)

    def _cached(self, key, builder):
        """The device-resident sweeps are closures over predict_fn and the
        geometry; rebuilding them per call would re-trace (and re-upload
        constants) every volume — at serving geometry that overhead dwarfs
        the sweep itself (docs/profile_dense_strip.py: 1.2 s of compute
        measured as 60+ s through a rebuild-per-call engine). Compiled
        sweeps are cached per (volume shape, channels, predictor)."""
        cache = getattr(self, "_sweep_cache", None)
        if cache is None:
            cache = self._sweep_cache = {}
        fn = cache.get(key)
        if fn is None:
            fn = cache[key] = builder()
        return fn

    def _build_dense_sweep(self, vshape, dims, predict_fn, n_channels):
        """Dense-interleave sweep for exactly-regular grids (the reference's
        AC3 serving geometry). Unaligned minor-dim canvas updates (x stride
        80 against the 128 lane) are replaced by a STATIC x-interleave —
        tile x-part p of tile t lands at block t+p, so concatenating part p
        across a whole x-row of tiles is a transpose+reshape with no
        dynamic offsets — followed by ONE lane-aligned strip
        read-modify-write per row (x offset 0, y a stride multiple, z in a
        major dim; measured 1.7 ms/row at AC3 geometry vs ~12 ms/tile for
        the unaligned scatter, docs/profile_dense_strip.py). y/z overlaps
        accumulate through the RMW exactly as in the scatter form, so the
        stitched canvas matches up to addition order (parity-tested in
        tests/test_tiling.py). The forward runs in chunks of ``batch_size``
        tiles so the row batch cannot blow activation memory."""
        import jax
        import jax.numpy as jnp

        nz, ny, nx = dims
        cz, cy, cx = self.crop_size
        sz, sy, sx = self.stride
        q = cx // sx
        pad = self.padding
        pshape = tuple(s + 2 * p for s, p in zip(vshape, pad))
        wp = pshape[2]
        assert wp == (nx + q - 1) * sx
        weight = jnp.asarray(self.weight)
        xs = jnp.arange(nx, dtype=jnp.int32) * sx
        bs = min(self.batch_size, nx) if self.batch_size > 0 else nx
        n_chunks = -(-nx // bs)
        # balance the chunks (13 tiles at bs=8 -> 2x7, not 8+5-padded-to-8):
        # the forward dominates, so padded duplicate tiles are pure waste
        bs = -(-nx // n_chunks)
        n_pad = n_chunks * bs - nx

        def interleave_x(t):
            # t: (nx, ..., cx) weighted tiles -> (..., wp) strip
            out = jnp.zeros(t.shape[1:-1] + (wp,), t.dtype)
            for p in range(q):
                part = jnp.moveaxis(t[..., p * sx:(p + 1) * sx], 0, -2)
                part = part.reshape(part.shape[:-2] + (nx * sx,))
                out = out.at[..., p * sx:p * sx + nx * sx].add(part)
            return out

        def predict_row(tiles):
            if n_pad:
                tiles = jnp.concatenate(
                    [tiles, jnp.broadcast_to(tiles[-1:],
                                             (n_pad,) + tiles.shape[1:])])
            outs = [predict_fn(tiles[i * bs:(i + 1) * bs])
                    for i in range(n_chunks)]
            affs = outs[0] if n_chunks == 1 else jnp.concatenate(outs)
            return affs[:nx]

        @jax.jit
        def sweep(vol_in, rows_in):
            volp = jnp.pad(vol_in, tuple((p, p) for p in pad),
                           mode="reflect")
            wstrip = interleave_x(
                jnp.broadcast_to(weight, (nx,) + weight.shape))

            def row_step(carry, zy):
                canvas, wmap = carry
                z, y = zy[0], zy[1]
                row = jax.lax.dynamic_slice(volp, (z, y, 0), (cz, cy, wp))
                tiles = jax.vmap(lambda x0: jax.lax.dynamic_slice(
                    row, (0, 0, x0), (cz, cy, cx)))(xs)
                affs = predict_row(tiles[..., None])  # (nx, K, cz, cy, cx)
                strip = interleave_x(affs * weight[None, None])
                cur = jax.lax.dynamic_slice(canvas, (0, z, y, 0),
                                            (n_channels, cz, cy, wp))
                canvas = jax.lax.dynamic_update_slice(canvas, cur + strip,
                                                      (0, z, y, 0))
                wm = jax.lax.dynamic_slice(wmap, (z, y, 0), (cz, cy, wp))
                wmap = jax.lax.dynamic_update_slice(wmap, wm + wstrip,
                                                    (z, y, 0))
                return (canvas, wmap), None

            init = (jnp.zeros((n_channels,) + pshape, jnp.float32),
                    jnp.zeros(pshape, jnp.float32))
            (canvas, wmap), _ = jax.lax.scan(row_step, init, rows_in)
            return canvas, wmap

        return sweep

    def _build_scatter_sweep(self, vshape, predict_fn, n_channels):
        import jax
        import jax.numpy as jnp

        cz, cy, cx = self.crop_size
        pad = self.padding
        pshape = tuple(s + 2 * p for s, p in zip(vshape, pad))
        bs = self.batch_size
        weight = jnp.asarray(self.weight)

        @jax.jit
        def sweep(vol_in, pos_all):
            volp = jnp.pad(vol_in, tuple((p, p) for p in pad),
                           mode="reflect")

            def batch_step(carry, pos_b):
                canvas, wmap = carry

                # (an r4 A/B replaced this vmapped dynamic_slice with a
                # fori_loop of plain dynamic slices on the theory that the
                # gather lowering was the engine overhead — measured
                # NEUTRAL-to-worse at AC3 serving geometry; the real
                # overhead was rebuild-per-call, see _cached. Kept the
                # simpler vmapped form.)
                tiles = jax.vmap(lambda p: jax.lax.dynamic_slice(
                    volp, (p[0], p[1], p[2]), (cz, cy, cx)))(pos_b)
                tiles = self._shard_tiles(tiles)
                affs = predict_fn(tiles[..., None])  # (B, K, cz, cy, cx)

                def body(i, c):
                    cv, wm = c
                    z, y, x = pos_b[i, 0], pos_b[i, 1], pos_b[i, 2]
                    cv = jax.lax.dynamic_update_slice(
                        cv,
                        jax.lax.dynamic_slice(cv, (0, z, y, x),
                                              (n_channels, cz, cy, cx))
                        + affs[i] * weight[None],
                        (0, z, y, x))
                    wm = jax.lax.dynamic_update_slice(
                        wm,
                        jax.lax.dynamic_slice(wm, (z, y, x), (cz, cy, cx))
                        + weight,
                        (z, y, x))
                    return cv, wm

                return jax.lax.fori_loop(0, bs, body, (canvas, wmap)), None

            init = (jnp.zeros((n_channels,) + pshape, jnp.float32),
                    jnp.zeros(pshape, jnp.float32))
            (canvas, wmap), _ = jax.lax.scan(batch_step, init, pos_all)
            return canvas, wmap

        return sweep

    def run_device_resident(self, volume, predict_fn: Callable,
                            n_channels: int,
                            progress: Callable | None = None,
                            fetch: bool = True) -> np.ndarray:
        """Fully device-resident variant: the UNPADDED volume is uploaded to
        HBM once (or passed as an already-resident jax.Array — repeat calls
        re-use it), reflect-padding happens in-jit, and the ENTIRE tile
        sweep (extraction, prediction, Gaussian weighting, canvas
        accumulation) is a single jitted lax.scan. One dispatch per volume
        instead of one per tile batch — on the tunneled chip each dispatch
        costs seconds of latency, and the reference round-trips every tile
        (provider_valid.py:212-240). The compiled sweep is cached across
        calls (see _cached).

        When the grid is exactly regular and the x crop is a stride
        multiple (the reference serving geometry), the sweep uses the
        dense-strip form — see _build_dense_sweep. Mesh-sharded runs keep
        the batch form."""
        import jax
        import jax.numpy as jnp

        pad = self.padding
        vshape = tuple(volume.shape)
        pshape = tuple(s + 2 * p for s, p in zip(vshape, pad))
        dims = regular_grid_dims(pshape, self.crop_size, self.stride)
        dense = (self.dense and dims is not None
                 and self.crop_size[2] % self.stride[2] == 0
                 and self.mesh is None)
        key = (dense, vshape, n_channels, id(predict_fn))
        if dense:
            nz, ny, nx = dims
            sz, sy, _ = self.stride
            aux = np.asarray([(z * sz, y * sy)
                              for z in range(nz) for y in range(ny)],
                             np.int32)
            n_pos = nz * ny * nx
            sweep = self._cached(key, lambda: self._build_dense_sweep(
                vshape, dims, predict_fn, n_channels))
        else:
            positions = tile_grid(pshape, self.crop_size, self.stride)
            bs = self.batch_size
            pos = list(positions)
            # pad the position list to a batch multiple (repeat last; the
            # extra accumulations are normalized away by the weight map)
            while len(pos) % bs:
                pos.append(pos[-1])
            aux = np.asarray(pos, np.int32).reshape(-1, bs, 3)
            n_pos = len(pos)
            sweep = self._cached(key, lambda: self._build_scatter_sweep(
                vshape, predict_fn, n_channels))

        canvas, wmap = sweep(jnp.asarray(volume), jnp.asarray(aux))
        if progress is not None:
            progress(n_pos, n_pos)
        if not fetch:
            # benchmarking/serving hook: leave the padded canvases in HBM
            # (the caller reduces or consumes them on device; avoids the
            # ~100s-of-MB canvas download where the link, not the chip,
            # would dominate)
            return canvas, wmap
        canvas = np.asarray(canvas)
        wmap = np.asarray(wmap)
        out = canvas / np.maximum(wmap[None], 1e-12)
        sl = tuple(slice(p, s - p) for p, s in zip(pad, pshape))
        return out[(slice(None),) + sl]

    def run(self, volume: np.ndarray, predict_fn: Callable, n_channels: int,
            progress: Callable | None = None) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        pad = self.padding
        vol = np.pad(volume, ((pad[0], pad[0]), (pad[1], pad[1]),
                              (pad[2], pad[2])), mode="reflect")
        pshape = vol.shape
        positions = tile_grid(pshape, self.crop_size, self.stride)
        cz, cy, cx = self.crop_size

        if self.device_accumulate:
            canvas = jnp.zeros((n_channels,) + pshape, jnp.float32)
            wmap = jnp.zeros(pshape, jnp.float32)
            weight = jnp.asarray(self.weight)

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def acc(canvas, wmap, affs_b, pos_b):
                def body(i, carry):
                    cv, wm = carry
                    z, y, x = pos_b[i, 0], pos_b[i, 1], pos_b[i, 2]
                    cv = jax.lax.dynamic_update_slice(
                        cv,
                        jax.lax.dynamic_slice(cv, (0, z, y, x),
                                              (n_channels, cz, cy, cx))
                        + affs_b[i] * weight[None],
                        (0, z, y, x))
                    wm = jax.lax.dynamic_update_slice(
                        wm,
                        jax.lax.dynamic_slice(wm, (z, y, x), (cz, cy, cx))
                        + weight,
                        (z, y, x))
                    return cv, wm

                return jax.lax.fori_loop(0, affs_b.shape[0], body,
                                         (canvas, wmap))
        else:
            canvas = np.zeros((n_channels,) + pshape, np.float32)
            wmap = np.zeros(pshape, np.float32)

        bs = self.batch_size
        for i0 in range(0, len(positions), bs):
            chunk = positions[i0:i0 + bs]
            tiles = np.stack([
                vol[z:z + cz, y:y + cy, x:x + cx] for z, y, x in chunk
            ]).astype(np.float32)[..., None]
            n_real = len(chunk)
            if n_real < bs:  # pad to static batch for jit
                tiles = np.concatenate(
                    [tiles, np.repeat(tiles[-1:], bs - n_real, axis=0)])
            if self.mesh is not None:
                import jax as _jax
                from jax.sharding import NamedSharding, PartitionSpec as P

                tiles = _jax.device_put(
                    tiles, NamedSharding(self.mesh,
                                         P("data", None, None, None, None)))
            affs = predict_fn(tiles)  # (B, K, cz, cy, cx)
            if self.device_accumulate:
                pos_arr = np.asarray(
                    list(chunk) + [chunk[-1]] * (bs - n_real), np.int32)
                if n_real < bs:
                    affs = affs[:n_real]
                    pos_arr = pos_arr[:n_real]
                canvas, wmap = acc(canvas, wmap, jnp.asarray(affs),
                                   jnp.asarray(pos_arr))
            else:
                affs = np.asarray(affs)
                for b, (z, y, x) in enumerate(chunk):
                    canvas[:, z:z + cz, y:y + cy, x:x + cx] += (
                        affs[b] * self.weight[None])
                    wmap[z:z + cz, y:y + cy, x:x + cx] += self.weight
            if progress is not None:
                progress(min(i0 + bs, len(positions)), len(positions))

        canvas = np.asarray(canvas)
        wmap = np.asarray(wmap)
        out = canvas / np.maximum(wmap[None], 1e-12)
        sl = tuple(slice(p, s - p) for p, s in zip(pad, pshape))
        return out[(slice(None),) + sl]
