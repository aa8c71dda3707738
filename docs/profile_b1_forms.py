"""Round-5 probe: per-stage kernel-form sweep of the fast forward at B=1.

The fast forward's per-stage form table (dense / 2x2 / pallas for the
s2d stages) was tuned at B=8 (docs/PERF.md). At B=1 the op-overhead /
MXU-fill tradeoffs change (VERDICT r4 #3: 9.01 ms vs the 4.75 ms/image
B=8 amortized cost). Sweep each s2d stage's form against the B=8 table
and report the in-context marginal on the full fast+fused graph.

Usage: python docs/profile_b1_forms.py [B]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S2D_STAGES = ("inconv", "down1", "down2", "up3", "up4")
FORMS = ("dense", "2x2", "pallas")


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

    def make(forms):
        fwd = build_fast_resunet_forward(variables, dtype=dtype,
                                         input_format="s2d",
                                         stage_forms=forms or None)

        def full(xx):
            emb, _ = fwd(xx)
            return jax.nn.relu(fused_affinity_2d(emb, offsets, 32, False))

        return full

    base_forms = {"inconv": "dense", "down1": "dense", "down2": "2x2",
                  "up3": "2x2", "up4": "dense"}
    base = timeit(make({}), x)
    print(f"B={B} baseline (B=8 table): {base*1e3:8.3f} ms", flush=True)
    results = {}
    for stage in S2D_STAGES:
        for form in FORMS:
            if form == base_forms[stage]:
                continue
            try:
                dt = timeit(make({stage: form}), x)
            except Exception as e:  # pallas form limits etc.
                print(f"{stage:8s} -> {form:8s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            results[(stage, form)] = dt
            print(f"{stage:8s} -> {form:8s}: {dt*1e3:8.3f} ms "
                  f"({(dt-base)*1e3:+7.3f})", flush=True)

    # greedy combination of every per-stage winner
    best = {}
    for (stage, form), dt in results.items():
        if dt < base and (stage not in best or dt < results[(stage, best[stage])]):
            best[stage] = form
    if best:
        dt = timeit(make(best), x)
        print(f"combined winners {best}: {dt*1e3:8.3f} ms "
              f"({(dt-base)*1e3:+7.3f})", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
