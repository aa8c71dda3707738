"""Bisect the dense-strip tiled sweep at AC3 serving geometry.

The r4 dense-strip rewrite (parallel/tiling.py::_sweep_dense_strips)
measured SLOWER engine-only than the per-tile scatter (63.8 vs 21.2
s/vol) despite replacing unaligned minor-dim updates with static
interleaves + aligned strip updates. Both run ~4 GB/s effective, so
something other than the update alignment binds. This probe times the
row-step components cumulatively, each as the same 130-row lax.scan:

  A  gather: row slice + 13 vmapped tile slices, reduce
  B  A + free predictor + Gaussian multiply + x-interleave, reduce
  C  B + canvas read-modify-write (no wmap)
  D  C + wmap RMW  (== the shipped dense row step)
  E  canvas RMW alone (constant strip)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from pixel_embedded_affinity_tpu.parallel.tiling import (
    TiledInference3D, gaussian_blend_weight)

K = 12
CZ, CY, CX = 18, 160, 160
SZ, SY, SX = 10, 80, 80
NZ, NY, NX = 10, 13, 13
PSHAPE = (108, 1120, 1120)
WP = PSHAPE[2]
Q = CX // SX


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(PSHAPE, np.float32))
    weight = jnp.asarray(gaussian_blend_weight((CZ, CY, CX)))
    xs = jnp.arange(NX, dtype=jnp.int32) * SX
    rows = jnp.asarray([(z * SZ, y * SY)
                        for z in range(NZ) for y in range(NY)], jnp.int32)

    def interleave_x(t):
        out = jnp.zeros(t.shape[1:-1] + (WP,), t.dtype)
        for p in range(Q):
            part = jnp.moveaxis(t[..., p * SX:(p + 1) * SX], 0, -2)
            part = part.reshape(part.shape[:-2] + (NX * SX,))
            out = out.at[..., p * SX:p * SX + NX * SX].add(part)
        return out

    def pfree(tiles):
        s = jnp.sum(tiles, axis=(1, 2, 3))
        return jnp.broadcast_to(s[:, None, None, None, None],
                                (tiles.shape[0], K, CZ, CY, CX))

    def make(variant):
        @jax.jit
        def sweep(vol_in, rows_in):
            wstrip = interleave_x(jnp.broadcast_to(weight, (NX,) + weight.shape))
            cstrip = jnp.ones((K, CZ, CY, WP), jnp.float32)

            def row_step(carry, zy):
                canvas, wmap, acc = carry
                z, y = zy[0], zy[1]
                if variant == "E":
                    cur = jax.lax.dynamic_slice(canvas, (0, z, y, 0),
                                                (K, CZ, CY, WP))
                    canvas = jax.lax.dynamic_update_slice(
                        canvas, cur + cstrip, (0, z, y, 0))
                    return (canvas, wmap, acc), None
                row = jax.lax.dynamic_slice(vol_in, (z, y, 0), (CZ, CY, WP))
                tiles = jax.vmap(lambda x0: jax.lax.dynamic_slice(
                    row, (0, 0, x0), (CZ, CY, CX)))(xs)
                if variant == "A":
                    return (canvas, wmap, acc + jnp.sum(tiles)), None
                affs = pfree(tiles)  # (NX, K, CZ, CY, CX)
                strip = interleave_x(affs * weight[None, None])
                if variant == "B":
                    return (canvas, wmap, acc + jnp.sum(strip)), None
                cur = jax.lax.dynamic_slice(canvas, (0, z, y, 0),
                                            (K, CZ, CY, WP))
                canvas = jax.lax.dynamic_update_slice(canvas, cur + strip,
                                                      (0, z, y, 0))
                if variant == "C":
                    return (canvas, wmap, acc), None
                wm = jax.lax.dynamic_slice(wmap, (z, y, 0), (CZ, CY, WP))
                wmap = jax.lax.dynamic_update_slice(wmap, wm + wstrip,
                                                    (z, y, 0))
                return (canvas, wmap, acc), None

            init = (jnp.zeros((K,) + PSHAPE, jnp.float32),
                    jnp.zeros(PSHAPE, jnp.float32), jnp.float32(0))
            (canvas, wmap, acc), _ = jax.lax.scan(row_step, init, rows_in)
            return jnp.sum(canvas[0, 0, 0]) + jnp.sum(wmap[0, 0]) + acc

        return sweep

    for v in ["A", "B", "E", "C", "D"]:
        fn = make(v)
        float(fn(vol, rows))  # compile
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(vol, rows))
            best = min(best, time.perf_counter() - t0)
        print(f"variant {v}: {best:.2f} s/vol ({best / 130 * 1e3:.1f} ms/row)",
              flush=True)


if __name__ == "__main__":
    main()
