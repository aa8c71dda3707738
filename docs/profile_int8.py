"""int8 vs bf16 conv throughput probe at the fast-forward's hot shapes.

The v5e MXU runs int8 matmuls at 2x bf16 throughput (394 vs 197 TOPS), and
int8 activations halve HBM traffic — relevant because docs/PERF.md measured
the decoder stages near the HBM roofline at bf16. This probe answers the
prior question for a quantized inference path: does XLA actually deliver
int8 conv speedups at OUR shapes, with the dequant(+requant) epilogue that
any real quantized network needs fused in?

Per-shape variants timed (tunnel-safe scan harness, see docs/PERF.md):
  bf16      : conv in bf16, shift+ReLU epilogue            (current path)
  int8-deq  : int8 in/weights -> int32 conv -> scale+shift+ReLU -> bf16 out
  int8-req  : same but epilogue requantizes to int8 output (chained stages)

Run on the TPU:  python docs/profile_int8.py [--batch 8]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B = args.batch
    rng = np.random.default_rng(0)

    def timeit(fn, *xs, iters=args.iters):
        # scan-in-one-jit with per-iter perturbation + scalar fetch
        # (block_until_ready does not synchronize on the axon tunnel)
        @jax.jit
        def run(eps, x0, *rest):
            def body(c, e):
                # integer inputs: perturb by adding the (int) eps so the
                # conv cannot be hoisted out of the scan
                out = fn(x0 + e.astype(x0.dtype), *rest)
                return c + out.astype(jnp.float32).sum(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), eps)
            return s

        eps = jnp.zeros((iters,), jnp.int32)
        float(run(eps, *xs))  # compile + warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(run(eps, *xs))
        return (time.perf_counter() - t0) / (reps * iters)

    _conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def mk_f(shape, dtype):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)

    def mk_i8(shape):
        return jnp.asarray(
            rng.integers(-127, 128, size=shape).astype(np.int8))

    results = []

    def bench(name, hw, cin, cout, k=3):
        x_bf = mk_f((B, hw, hw, cin), jnp.bfloat16)
        w_bf = mk_f((k, k, cin, cout), jnp.bfloat16)
        shift = mk_f((cout,), jnp.bfloat16)
        x_i8 = mk_i8((B, hw, hw, cin))
        w_i8 = mk_i8((k, k, cin, cout))
        scale = mk_f((cout,), jnp.float32)  # s_x * s_w[c]
        shift_f = mk_f((cout,), jnp.float32)

        def f_bf16(x, w, s):
            return jax.nn.relu(_conv(x, w) + s)

        def f_i8_deq(x, w, sc, sh):
            acc = _conv(x, w, preferred_element_type=jnp.int32)
            return jax.nn.relu(acc.astype(jnp.float32) * sc
                               + sh).astype(jnp.bfloat16)

        def f_i8_req(x, w, sc, sh):
            acc = _conv(x, w, preferred_element_type=jnp.int32)
            y = jax.nn.relu(acc.astype(jnp.float32) * sc + sh)
            return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

        flops = 2 * B * hw * hw * k * k * cin * cout
        dt_bf = timeit(f_bf16, x_bf, w_bf, shift)
        dt_dq = timeit(f_i8_deq, x_i8, w_i8, scale, shift_f)
        dt_rq = timeit(f_i8_req, x_i8, w_i8, scale, shift_f)
        results.append((name, dt_bf * 1e3, dt_dq * 1e3, dt_rq * 1e3,
                        dt_bf / dt_rq, flops / dt_rq / 394e12 * 100))

    # fast-forward "dense s2d" stage shapes (544^2 runs as 272^2 x 4C)
    bench("inconv s2d 272 12->64+64", 272, 12, 128)
    bench("inconv c2 s2d 272 64->64", 272, 64, 64)
    bench("down1 s2d 272 64->128+128", 272, 64, 256)
    bench("down1 c2 s2d 272 128->128", 272, 128, 128)
    bench("up4 s2d 272 384->128+128", 272, 384, 256)
    bench("up4 c2 s2d 272 128->128", 272, 128, 128)
    # mid stages (direct resolution)
    bench("down3 c1 136 64->128", 136, 64, 128)
    bench("up2 c1 136 384->128", 136, 384, 128)
    bench("down4 c2 68 256->256", 68, 256, 256)
    # 2x2-parity tap shape (up3 s2d136 form), as plain matmul-equiv conv
    bench("up3 2x2 136 768->256 k2", 136, 768, 256, k=2)

    print(f"\n{'shape':30s} {'bf16':>8s} {'i8-deq':>8s} {'i8-req':>8s} "
          f"{'speedup':>8s} {'%i8peak':>8s}")
    for name, a, b, c, sp, pk in results:
        print(f"{name:30s} {a:8.3f} {b:8.3f} {c:8.3f} {sp:8.2f} {pk:8.1f}")


if __name__ == "__main__":
    main()
