"""Headline benchmark: megapixels/sec/chip for embedding->affinity inference.

Flagship config (BASELINE config 1): CVPPP-scale 544x544 RGB through
ResUNet2D-deep + fused Pallas embedding->affinity (10 offsets). "Ours" runs
the s2d fast forward (models/fast_forward.py: exact space-to-depth
reformulation of the lane-starved high-res stages + folded BN + virtual
skip concats) in bf16 at the best measured batch (B=8).

Baseline for `vs_baseline`: the reference-faithful computation graph — the
same model in f32 (the reference runs f32 torch, scripts_cvppp README env)
with the reference's per-offset roll+multiply+reduce affinity chain
(scripts_cvppp/loss/loss_embedding_mse.py:58-66 semantics) — compiled by XLA
on the SAME chip. A same-dtype (bf16) reference-style graph is also timed and
reported on stderr so the framework-level win is separable from the dtype win.

Timing methodology: on this environment block_until_ready does NOT
synchronize (the axon tunnel acks dispatch, not completion), so wall-clock
loops over async dispatches measure host throughput. We therefore scan N
forwards inside ONE jit (with a per-iteration input perturbation so XLA
cannot hoist the computation) and fetch a scalar reduction, which forces a
real device round-trip; time = total / N.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
    from pixel_embedded_affinity_tpu.ops import multi_offset
    from pixel_embedded_affinity_tpu.ops.emb2aff import (
        embedding_to_affinity_2d, normalize_embedding)
    from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_2d

    on_tpu = jax.devices()[0].platform == "tpu"
    B, H, W = 8, 544, 544
    N = 20  # forwards per timed program
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, H, W, 3)).astype(np.float32))
    offsets = tuple(map(tuple, multi_offset([1, 3, 5, 9, 27], neighbor=4)))

    def build(dtype):
        model = ResidualUNet2DDeep(out_channels=2,
                                   nfeatures=(16, 32, 64, 128, 256), emd=16,
                                   dtype=dtype)
        # jit the init: eager ops on the tunneled TPU trigger per-op
        # remote compiles
        variables = jax.jit(functools.partial(model.init, train=False))(
            rng, x[:1])
        return model, variables

    def timeit(model, variables, aff_fn, x_override=None):
        xin = x if x_override is None else x_override

        @jax.jit
        def run(x, eps):
            def body(c, e):
                _, _, _, _, emb, _ = model.apply(variables, x + e,
                                                 train=False)
                affs = aff_fn(emb)
                return c + affs.astype(jnp.float32).sum(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), eps)
            return s

        eps = jnp.zeros((N,), xin.dtype)
        float(run(xin, eps))  # compile + warm
        print("# compiled", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(run(xin, eps))
        return (time.perf_counter() - t0) / (reps * N)

    def fused(emb):
        # bf16 embedding straight into the kernel (it upcasts per-tile)
        if on_tpu:
            return jax.nn.relu(fused_affinity_2d(emb, offsets, 32, False))
        return jax.nn.relu(embedding_to_affinity_2d(
            emb.astype(jnp.float32), offsets, padding="valid"))

    def ref_style(emb):
        # reference embedding2affs: normalize then per-offset circular roll +
        # channel-dot, one full pass per offset (f32, as the reference runs)
        n = normalize_embedding(emb.astype(jnp.float32), axis=-1)
        chans = []
        for oy, ox in offsets:
            shifted = jnp.roll(n, shift=(-oy, -ox), axis=(1, 2))
            chans.append(jnp.sum(n * shifted, axis=-1))
        return jax.nn.relu(jnp.stack(chans, axis=1))

    fast_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model_fast, vars_fast = build(fast_dtype)
    model_f32, vars_f32 = build(jnp.float32)

    from pixel_embedded_affinity_tpu.models.fast_forward import (
        build_fast_resunet_forward, pack_image_s2d)

    # "ours" is the real deployment ingest (infer/inference2d.py): the
    # image is packed to s2d form on the host (free) and uploaded in the
    # compute dtype, so the 42x-lane-padded NHWC f32 tensor never exists
    # on device. The reference-style baselines keep NHWC f32 input, as
    # the reference runs.
    fast_fwd = build_fast_resunet_forward(vars_fast, dtype=fast_dtype,
                                          input_format="s2d")
    x_packed = jnp.asarray(pack_image_s2d(np.asarray(x))).astype(fast_dtype)

    class _FastModel:
        def apply(self, variables, image, train=False):
            emb, mask = fast_fwd(image)
            return None, None, None, None, emb, mask

    dt_ours = timeit(_FastModel(), vars_fast, fused, x_override=x_packed)
    dt_ref_f32 = timeit(model_f32, vars_f32, ref_style)
    dt_ref_same = timeit(model_fast, vars_fast, ref_style)

    mp = B * H * W / 1e6
    value = mp / dt_ours
    base_f32 = mp / dt_ref_f32
    base_same = mp / dt_ref_same
    print(f"# ours {dt_ours*1e3:.2f} ms | ref-graph f32 {dt_ref_f32*1e3:.2f}"
          f" ms ({value/base_f32:.2f}x) | ref-graph same-dtype"
          f" {dt_ref_same*1e3:.2f} ms ({value/base_same:.2f}x)",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "megapixels/sec/chip emb2aff inference (ResUNet2D 544x544)",
        "value": round(value, 2),
        "unit": "MP/s/chip",
        "vs_baseline": round(value / base_f32, 3),
    }))


if __name__ == "__main__":
    main()
