"""Round-5 probe: where do the ~2.9 ms of fwd->affinity composition go
at B=1? (docs/profile_b1.py: full 8.59 ms but fwd 4.84 + affinity 0.89.)

Times a ladder of prefixes of the composed serving graph at B=1 544^2:
emb_s (s2d out) -> +depth_to_space -> +NCHW transpose -> +fused affinity
-> +relu, plus the XLA roll-based affinity alternative.

Usage: python docs/profile_b1_split.py [B]
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
    from pixel_embedded_affinity_tpu.ops.emb2aff import (
        embedding_to_affinity_2d)
    from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_2d
    from pixel_embedded_affinity_tpu.ops.s2d import depth_to_space

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

    # the fast forward always ends with depth_to_space(emb_s); rebuild the
    # prefix by intercepting: emb is full-res NHWC. Ladder:
    ladder = {
        "fwd (emb NHWC out)": lambda xx: fwd(xx)[0],
        "fwd + NCHW transpose": lambda xx: jnp.transpose(
            fwd(xx)[0], (0, 3, 1, 2)),
        "fwd + fused affinity": lambda xx: fused_affinity_2d(
            fwd(xx)[0], offsets, 32, False),
        "fwd + fused + relu": lambda xx: jax.nn.relu(fused_affinity_2d(
            fwd(xx)[0], offsets, 32, False)),
        "fwd + xla-roll affinity": lambda xx: jax.nn.relu(
            embedding_to_affinity_2d(fwd(xx)[0].astype(jnp.float32),
                                     offsets)),
        "fwd + barrier + fused": lambda xx: jax.nn.relu(fused_affinity_2d(
            jax.lax.optimization_barrier(fwd(xx)[0]), offsets, 32, False)),
    }
    for name, fn in ladder.items():
        dt = timeit(fn, x)
        print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)

    # locus test: does the d2s relayout feeding the pallas kernel carry
    # the cost when the conv graph is NOT in the program?
    emb = fwd(x)[0]
    emb_s = jnp.asarray(np.transpose(
        np.asarray(emb, np.float32).reshape(B, H // 2, 2, W // 2, 2, -1),
        (0, 1, 3, 2, 4, 5)).reshape(B, H // 2, W // 2, -1)).astype(emb.dtype)

    def d2s_aff(es):
        return jax.nn.relu(fused_affinity_2d(depth_to_space(es),
                                             offsets, 32, False))

    dt = timeit(d2s_aff, emb_s)
    print(f"{'emb_s -> d2s -> fused':28s} {dt*1e3:8.3f} ms", flush=True)
    dt = timeit(lambda e: jax.nn.relu(fused_affinity_2d(e, offsets, 32,
                                                        False)), emb)
    print(f"{'emb -> fused (+relu)':28s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
