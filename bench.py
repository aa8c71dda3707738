"""Headline benchmark: megapixels/sec/chip for embedding->affinity inference.

Flagship config (BASELINE config 1): CVPPP-scale 544x544 RGB through
ResUNet2D-deep + fused Pallas embedding->affinity (10 offsets).

Baseline for `vs_baseline`: the reference-faithful computation graph — the
same model with the reference's per-offset roll+multiply+reduce affinity
chain (scripts_cvppp/loss/loss_embedding_mse.py:58-66 semantics, circular
roll) — compiled by XLA on the SAME chip. This isolates the framework-level
win (fused kernel + layout) from hardware differences.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
    from pixel_embedded_affinity_tpu.ops import multi_offset
    from pixel_embedded_affinity_tpu.ops.emb2aff import normalize_embedding
    from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_2d

    on_tpu = jax.devices()[0].platform == "tpu"
    B, H, W = 4, 544, 544
    # ours: bf16 compute (production TPU config) + fused Pallas affinity
    model = ResidualUNet2DDeep(out_channels=2,
                               nfeatures=(16, 32, 64, 128, 256), emd=16,
                               dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    # baseline: the reference-faithful graph — f32 model + per-offset rolls
    model_ref = ResidualUNet2DDeep(out_channels=2,
                                   nfeatures=(16, 32, 64, 128, 256), emd=16)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, H, W, 3)).astype(np.float32))
    import functools

    # jit the init: on the tunneled TPU backend each *eager* op would
    # trigger its own remote compile, which takes tens of minutes
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = jax.block_until_ready(init_fn(rng, x[:1]))
    print("# init done", file=__import__("sys").stderr, flush=True)
    offsets = tuple(map(tuple, multi_offset([1, 3, 5, 9, 27], neighbor=4)))

    @jax.jit
    def ours(image):
        _, _, _, _, emb, _ = model.apply(variables, image, train=False)
        emb = emb.astype(jnp.float32)
        if on_tpu:
            return jax.nn.relu(fused_affinity_2d(emb, offsets, 32, False))
        from pixel_embedded_affinity_tpu.ops import embedding_to_affinity_2d

        return jax.nn.relu(embedding_to_affinity_2d(emb, offsets))

    @jax.jit
    def reference_style(image):
        # reference embedding2affs: normalize then per-offset circular roll +
        # channel-dot, one full pass per offset
        _, _, _, _, emb, _ = model_ref.apply(variables, image, train=False)
        n = normalize_embedding(emb, axis=-1)
        chans = []
        for oy, ox in offsets:
            shifted = jnp.roll(n, shift=(-oy, -ox), axis=(1, 2))
            chans.append(jnp.sum(n * shifted, axis=-1))
        return jax.nn.relu(jnp.stack(chans, axis=1))

    def timeit(fn, iters=30):
        fn(x).block_until_ready()
        print("# compiled", file=__import__("sys").stderr, flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters

    dt_ours = timeit(ours)
    dt_ref = timeit(reference_style)
    mp = B * H * W / 1e6
    value = mp / dt_ours
    baseline = mp / dt_ref
    print(json.dumps({
        "metric": "megapixels/sec/chip emb2aff inference (ResUNet2D 544x544)",
        "value": round(value, 2),
        "unit": "MP/s/chip",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
