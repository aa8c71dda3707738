"""Round-5 probe: which Pallas-operand arrangement avoids the B=1
slow-conv demotion?

A trivial Pallas identity (copy) kernel stands in for the affinity
kernel; the variable is the shape/axis arrangement of the tensor the
conv tail must deliver to it. fwd-only baseline is ~4.85 ms; the shipped
composition is ~8.6 ms (docs/profile_b1_split.py).

Usage: python docs/profile_b1_arrange.py [B]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
    from pixel_embedded_affinity_tpu.models.fast_forward import (
        build_fast_resunet_forward, pack_image_s2d)

    H = W = 544
    N = 30
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
                return c + out.astype(jnp.float32).sum(), None
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

    def _id_kernel(in_ref, out_ref):
        out_ref[...] = in_ref[...]

    def pallas_copy(t, tile_axis=1, tile=32):
        shape = t.shape
        n = shape[tile_axis] // tile
        blk = list(shape)
        blk[tile_axis] = tile

        def idx(i):
            out = [0] * len(shape)
            out[tile_axis] = i
            return tuple(out)

        return pl.pallas_call(
            _id_kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec(tuple(blk), idx, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(tuple(blk), idx, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, t.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(t)

    variants = {
        "no pallas (fwd only)": lambda xx: fwd(xx)[0],
        "pallas on emb NHWC": lambda xx: pallas_copy(fwd(xx)[0], 1),
        "pallas on e NCHW": lambda xx: pallas_copy(
            jnp.transpose(fwd(xx)[0], (0, 3, 1, 2)), 2),
        "pallas on (B,H,C,W)": lambda xx: pallas_copy(
            jnp.transpose(fwd(xx)[0], (0, 1, 3, 2)), 1),
    }
    for name, fn in variants.items():
        try:
            dt = timeit(fn, x)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            continue
        print(f"{name:24s} {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
