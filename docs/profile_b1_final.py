"""Round-5 probe: the consolidated B=1 serving-latency A/B.

Variants (all exact-math vs the shipped serving graph):
  base        : fwd (s2d head) + fused Pallas affinity  (shipped r4 path)
  fullres     : fwd(head_at_fullres=True) + fused Pallas affinity
  fullres+vmem: same, with PEA_PALLAS_VMEM_MB=16 (scoped-VMEM reservation
                shrunk so XLA keeps the surrounding graph VMEM-resident)
  fullres+xla : fwd(head_at_fullres=True) + pure-XLA NCHW small-batch
                affinity (no custom call at all)
  xla         : fwd (s2d head) + pure-XLA small-batch affinity

Usage: PEA_PALLAS_VMEM_MB=16 python docs/profile_b1_final.py [B]
(the vmem variant requires the env var at process start; run twice)
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
    from pixel_embedded_affinity_tpu.ops import (multi_offset,
                                                 affinity_2d_small_batch)
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
    fwd_fr = build_fast_resunet_forward(variables, dtype=dtype,
                                        input_format="s2d",
                                        head_at_fullres=True)

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

    vmem_mb = os.environ.get("PEA_PALLAS_VMEM_MB", "100")
    variants = {
        f"base (pallas, vmem={vmem_mb}M)": lambda xx: jax.nn.relu(
            fused_affinity_2d(fwd(xx)[0], offsets, 32, False)),
        f"fullres-head + pallas (vmem={vmem_mb}M)": lambda xx: jax.nn.relu(
            fused_affinity_2d(fwd_fr(xx)[0], offsets, 32, False)),
        "fullres-head + xla-small-batch": lambda xx: jax.nn.relu(
            affinity_2d_small_batch(fwd_fr(xx)[0], offsets)),
        "s2d-head + xla-small-batch": lambda xx: jax.nn.relu(
            affinity_2d_small_batch(fwd(xx)[0], offsets)),
        "fwd only (floor)": lambda xx: fwd(xx)[0],
        "fullres fwd only": lambda xx: fwd_fr(xx)[0],
    }
    for name, fn in variants.items():
        dt = timeit(fn, x)
        print(f"B={B} {name:38s} {dt*1e3:8.3f} ms/img", flush=True)

    # parity check: fullres-head graph must match the s2d-head graph
    a = np.asarray(jax.nn.relu(fused_affinity_2d(fwd(x)[0].astype(jnp.float32),
                                                 offsets, 32, False)))
    b = np.asarray(jax.nn.relu(affinity_2d_small_batch(
        fwd_fr(x)[0].astype(jnp.float32), offsets)))
    print(f"max |fullres+xla - base| = {np.abs(a - b).max():.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
