"""Round-5 probe: candidate fixes for the B=1 fwd->fused-affinity
composition overhead (+3.7 ms; docs/profile_b1_split.py).

Usage: python docs/profile_b1_fix.py [B]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=1):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
    from pixel_embedded_affinity_tpu.models.fast_forward import (
        build_fast_resunet_forward, pack_image_s2d)
    from pixel_embedded_affinity_tpu.ops import multi_offset
    from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_2d

    H = W = 544
    N = 30
    offsets = tuple(map(tuple, multi_offset([1, 3, 5, 9, 27], neighbor=4)))
    dtype = jnp.bfloat16

    model = ResidualUNet2DDeep(out_channels=2, nfeatures=(16, 32, 64, 128, 256),
                               emd=16, dtype=dtype)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x0)
    fwd = build_fast_resunet_forward(variables, dtype=dtype,
                                     input_format="s2d")

    rng = np.random.default_rng(0)
    img = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    x = jnp.asarray(pack_image_s2d(img)).astype(dtype)

    def timeit(fn, x, iters=N, reps=3):
        @jax.jit
        def run(x, eps):
            def body(c, e):
                out = fn(x + e.astype(x.dtype))
                outs = out if isinstance(out, (tuple, list)) else (out,)
                return c + sum(o.astype(jnp.float32).sum() for o in outs), None
            s, _ = jax.lax.scan(body, jnp.float32(0), eps)
            return s

        eps = jnp.zeros((iters,), x.dtype)
        float(run(x, eps))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, eps))
            times.append(time.perf_counter() - t0)
        return min(times) / iters

    variants = {
        "baseline tile_h=32": lambda xx: jax.nn.relu(
            fused_affinity_2d(fwd(xx)[0], offsets, 32, False)),
        "tile_h=64": lambda xx: jax.nn.relu(
            fused_affinity_2d(fwd(xx)[0], offsets, 64, False)),
        "tile_h=136": lambda xx: jax.nn.relu(
            fused_affinity_2d(fwd(xx)[0], offsets, 136, False)),
        "f32 emb": lambda xx: jax.nn.relu(
            fused_affinity_2d(fwd(xx)[0].astype(jnp.float32), offsets, 32,
                              False)),
        "emb also output": lambda xx: (lambda e: (jax.nn.relu(
            fused_affinity_2d(e, offsets, 32, False)), e))(fwd(xx)[0]),
    }
    for name, fn in variants.items():
        dt = timeit(fn, x)
        print(f"{name:24s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
