"""Round-5 probe: where does the B=1 2D serving latency go?

VERDICT r4 #3: B=1 544^2 latency is 9.01 ms while B=8 throughput implies
4.75 ms/image — the B=1 graph leaves ~1.9x on the table, and per-image
latency is the reference's serving pattern (scripts_cvppp/inference.py:
166-254). Measure:

  1. fast-forward (+fused affinity) ms/image at B in {1, 2, 4, 8}
     -> shape of the batch-amortization curve (fixed-cost share)
  2. the fused affinity kernel alone at B=1 vs B=8
  3. int8 serving mode at B=1
  4. candidate B=1 specializations (added as they are built)

Usage: python docs/profile_b1.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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

    rng = np.random.default_rng(0)

    def packed(B):
        img = rng.normal(size=(B, H, W, 3)).astype(np.float32)
        return jnp.asarray(pack_image_s2d(img)).astype(dtype)

    def full(x):
        emb, _ = fwd(x)
        return jax.nn.relu(fused_affinity_2d(emb, offsets, 32, False))

    def fwd_only(x):
        return fwd(x)[0]

    print(f"{'variant':30s} {'ms/img':>8s} {'ms tot':>8s}")
    for B in (1, 2, 4, 8):
        x = packed(B)
        dt = timeit(full, x)
        print(f"fast+fused B={B:<2d}               {dt/B*1e3:8.2f} "
              f"{dt*1e3:8.2f}", flush=True)
    for B in (1, 8):
        x = packed(B)
        dt = timeit(fwd_only, x)
        print(f"fast fwd only B={B:<2d}            {dt/B*1e3:8.2f} "
              f"{dt*1e3:8.2f}", flush=True)
        emb = fwd(x)[0]

        def aff_only(e):
            return jax.nn.relu(fused_affinity_2d(e, offsets, 32, False))

        dt = timeit(aff_only, emb)
        print(f"fused affinity only B={B:<2d}      {dt/B*1e3:8.2f} "
              f"{dt*1e3:8.2f}", flush=True)


if __name__ == "__main__":
    main()
