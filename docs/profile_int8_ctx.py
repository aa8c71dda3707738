"""In-context A/B of int8 stage sets inside the full fast forward.

Times the bench-identical fast forward (B=8, 544^2, s2d-packed input,
fused affinity kernel) with different int8 site assignments, since isolated
per-conv wins on this toolchain routinely invert under composition
(docs/PERF.md). Run on the TPU:  python docs/profile_int8_ctx.py
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

    from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
    from pixel_embedded_affinity_tpu.models.fast_forward import (
        build_fast_resunet_forward, calibrate_int8_ranges, pack_image_s2d)
    from pixel_embedded_affinity_tpu.ops import multi_offset
    from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_2d

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    B, H, W = 8, 544, 544
    N = 20
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    offsets = tuple(map(tuple, multi_offset([1, 3, 5, 9, 27], neighbor=4)))

    rng = jax.random.PRNGKey(0)
    x = np.random.default_rng(0).normal(size=(B, H, W, 3)).astype(np.float32)
    model = ResidualUNet2DDeep(out_channels=2,
                               nfeatures=(16, 32, 64, 128, 256), emd=16,
                               dtype=dtype)
    variables = jax.jit(functools.partial(model.init, train=False))(
        rng, jnp.asarray(x[:1]))
    x_packed = jnp.asarray(pack_image_s2d(x)).astype(dtype)

    print("# calibrating", file=sys.stderr, flush=True)
    ranges = calibrate_int8_ranges(variables, [x_packed], dtype=dtype,
                                   input_format="s2d")

    def aff(emb):
        if on_tpu:
            return jax.nn.relu(fused_affinity_2d(emb, offsets, 32, False))
        from pixel_embedded_affinity_tpu.ops.emb2aff import \
            embedding_to_affinity_2d
        return jax.nn.relu(embedding_to_affinity_2d(
            emb.astype(jnp.float32), offsets, padding="valid"))

    def timeit(fwd):
        @jax.jit
        def run(xin, eps):
            def body(c, e):
                emb, _ = fwd(xin + e.astype(xin.dtype))
                return c + aff(emb).astype(jnp.float32).sum(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), eps)
            return s

        eps = jnp.zeros((N,), jnp.float32)
        float(run(x_packed, eps))
        print("# compiled", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(run(x_packed, eps))
        return (time.perf_counter() - t0) / (reps * N)

    more = ("down1.c2", "up2.c1", "up2.c2", "up3.c1",
            "up3.c2", "up4.c1", "up4.c2", "up1.c1",
            "up1.c2", "down4.c1", "down4.c2")
    variants = {
        "i8 defaults+more": more,
        "i8 +mid": more + ("down2.c1", "down2.c2", "down3.c2"),
        "i8 all-but-losers": more + ("down2.c1", "down2.c2", "down3.c2",
                                     "inconv.c2"),
        "i8 everything": more + ("down2.c1", "down2.c2", "down3.c1",
                                 "down3.c2", "inconv.c1", "inconv.c2",
                                 "down1.c1"),
    }
    mp = B * H * W / 1e6
    for name, sites in variants.items():
        fwd = build_fast_resunet_forward(
            variables, dtype=dtype, input_format="s2d",
            int8_sites=sites, act_ranges=ranges if sites else None)
        dt = timeit(fwd)
        print(f"{name:22s} {dt*1e3:7.2f} ms  {mp/dt:7.1f} MP/s", flush=True)


if __name__ == "__main__":
    main()
