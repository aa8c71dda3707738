"""Per-layer microbenchmark of the ResUNet2D forward on the real chip.

Times each conv/upsample/pool shape of the flagship bench config (B=4,
544x544, filters 16/32/64/128/256) in isolation, plus the full forward, and
reports ms, GFLOP/s, and % of v5e bf16 peak (197 TFLOP/s). Run on the TPU:

    python docs/profile_forward.py [--dtype bf16|f32] [--batch 4]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B = args.batch
    PEAK = 197e12 if dtype == jnp.bfloat16 else 98.5e12

    rng = np.random.default_rng(0)

    def timeit(fn, *xs, iters=args.iters):
        """True device time: scan `iters` executions inside ONE jit with a
        per-iteration input perturbation (prevents hoisting) and fetch a
        scalar (block_until_ready does NOT synchronize on the axon tunnel,
        so host-side loops measure dispatch, not compute)."""

        @jax.jit
        def run(eps, x0, *rest):
            def body(c, e):
                out = fn(x0 + e.astype(x0.dtype), *rest)
                outs = out if isinstance(out, (tuple, list)) else (out,)
                return c + sum(o.astype(jnp.float32).sum()
                               for o in outs), None
            s, _ = jax.lax.scan(body, jnp.float32(0), eps)
            return s

        eps = jnp.zeros((iters,), jnp.float32)
        float(run(eps, *xs))  # compile + warm up
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(run(eps, *xs))
        return (time.perf_counter() - t0) / (reps * iters)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32),
                           dtype=dtype)

    results = []

    def bench_conv(name, hw, cin, cout, k=3):
        x = mk((B, hw, hw, cin))
        w = mk((k, k, cin, cout))
        f = functools.partial(
            jax.lax.conv_general_dilated,
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        dt = timeit(lambda a, b: f(a, b), x, w)
        flops = 2 * B * hw * hw * k * k * cin * cout
        results.append((name, dt * 1e3, flops / dt / 1e12,
                        100 * flops / dt / PEAK))

    # encoder blocks (conv1, conv2, project at each scale)
    bench_conv("inconv c1 544 3->16", 544, 3, 16)
    bench_conv("inconv c2 544 16->16", 544, 16, 16)
    bench_conv("down1 c1 544 16->32", 544, 16, 32)
    bench_conv("down1 c2 544 32->32", 544, 32, 32)
    bench_conv("down2 c1 272 32->64", 272, 32, 64)
    bench_conv("down2 c2 272 64->64", 272, 64, 64)
    bench_conv("down3 c1 136 64->128", 136, 64, 128)
    bench_conv("down3 c2 136 128->128", 136, 128, 128)
    bench_conv("down4 c1 68 128->256", 68, 128, 256)
    bench_conv("down4 c2 68 256->256", 68, 256, 256)
    # decoder
    bench_conv("up1 c1 68 256->256", 68, 256, 256)
    bench_conv("up2 c1 136 384->128", 136, 384, 128)
    bench_conv("up3 c1 272 192->64", 272, 192, 64)
    bench_conv("up3 c2 272 64->64", 272, 64, 64)
    bench_conv("up4 c1 544 96->32", 544, 96, 32)
    bench_conv("up4 c2 544 32->32", 544, 32, 32)
    bench_conv("emb head 544 32->16 1x1", 544, 32, 16, k=1)

    # upsample + pool
    from pixel_embedded_affinity_tpu.models.common import \
        upsample_align_corners

    for hw, c in [(272, 32), (136, 64), (68, 128), (34, 256)]:
        x = mk((B, hw, hw, c))
        dt = timeit(lambda a: upsample_align_corners(a, axes=(1, 2),
                                                     factors=(2, 2)), x)
        results.append((f"upsample {hw}->{2*hw} c{c}", dt * 1e3, 0, 0))
    x = mk((B, 544, 544, 16))
    dt = timeit(lambda a: nn.max_pool(a, (2, 2), strides=(2, 2)), x)
    results.append(("maxpool 544 c16", dt * 1e3, 0, 0))

    # BN inference affine
    x = mk((B, 544, 544, 32))
    s = mk((32,))
    b = mk((32,))
    dt = timeit(lambda a, s, b: jax.nn.relu(a * s + b), x, s, b)
    results.append(("bn+relu 544 c32", dt * 1e3, 0, 0))

    # full model forward
    from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep

    model = ResidualUNet2DDeep(out_channels=2,
                               nfeatures=(16, 32, 64, 128, 256), emd=16,
                               dtype=dtype)
    x = mk((B, 544, 544, 3)).astype(jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x[:1])
    jax.block_until_ready(variables)
    dt_full = timeit(lambda a: model.apply(variables, a, train=False), x)
    results.append(("FULL forward", dt_full * 1e3, 0, 0))

    conv_sum = sum(r[1] for r in results if "->" in r[0])
    print(f"\n{'layer':34s} {'ms':>8s} {'TFLOP/s':>9s} {'%peak':>7s}")
    for name, ms, tf, pk in results:
        print(f"{name:34s} {ms:8.3f} {tf:9.2f} {pk:7.1f}")
    print(f"\nsum of timed convs: {conv_sum:.2f} ms; "
          f"full forward: {dt_full*1e3:.2f} ms; "
          f"overhead: {dt_full*1e3 - conv_sum:.2f} ms")
    print(f"MP/s at full forward: {B*544*544/dt_full/1e6:.1f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
