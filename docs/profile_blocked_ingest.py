"""Blocked-layout boundary costs + the producer-side blocked-emission trick.

profile_blocked_stage.py measured: chained blocked convs at 272^2 C64 run
at 0.606 ms/conv (1.87x XLA's 1.133) but the NHWC<->blocked boundary costs
~3.7 ms per ingest+egress pair, so short chains lose. This probe:

  1. splits the boundary cost: ingest (pad+reshape) vs egress
     (reshape+crop), each isolated by a scalar-reduce consumer;
  2. measures the PRODUCER trick: a (3,4) stride-(1,2) conv with 128
     output channels (two x-shifted copies of a (3,3,cin,64) kernel) emits
     the 2-pixel-blocked 128-lane layout DIRECTLY — exact same math as the
     (3,3)->64 conv followed by the blocked relayout, but the relayout
     becomes a free reshape of a dense-128-minor tensor. Compares its cost
     against the plain (3,3)->64 conv: the delta is the true ingest cost
     when the producing conv cooperates.
  3. checks the producer trick's exactness vs conv->relayout.
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixel_embedded_affinity_tpu.ops.conv3x3_blocked import blocked_ingest


def timeit(fn, x, N=20, reps=3):
    @jax.jit
    def run(x, eps):
        def body(c, e):
            return c + fn(x + e).astype(jnp.float32).sum(), None
        s, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return s

    eps = jnp.zeros((N,), x.dtype)
    float(run(x, eps))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x, eps))
        best = min(best, (time.perf_counter() - t0) / N)
    return best * 1e3


def blocked_producer_weights(w):
    """(3, 3, cin, c) -> (3, 4, cin, 2c): two x-shifted copies, so the
    stride-(1, 2) conv's output (y, X, :) = [out(y, 2X) | out(y, 2X+1)]."""
    kh, kw, cin, c = w.shape
    wp = jnp.zeros((3, 4, cin, 2 * c), w.dtype)
    wp = wp.at[:, 0:3, :, :c].set(w)
    wp = wp.at[:, 1:4, :, c:].set(w)
    return wp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    rng = np.random.default_rng(0)
    on_tpu = jax.devices()[0].platform == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    B, H, W, C = 8, 272, 272, 64
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), dt)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, dt)

    # 1. boundary split
    def ingest_only(v):
        xf, _ = blocked_ingest(v, top=16, left=4)
        return xf

    def egress_only(v):
        # the inverse relayout at the same geometry: blocked (R,128) ->
        # NHWC crop. Build the blocked stream OUTSIDE the timed region by
        # timing (ingest+egress) - ingest.
        xf, g = blocked_ingest(v, top=16, left=4)
        y = xf[:, 0].reshape(g.b, g.alloc, g.wp, g.cc)
        return y[:, 16:16 + g.h, 4:4 + g.wd, :]

    t_in = timeit(ingest_only, x)
    t_inout = timeit(egress_only, x)
    print(f"ingest {t_in:.2f} ms | ingest+egress {t_inout:.2f} ms "
          f"(egress ~{t_inout - t_in:.2f})", flush=True)

    # 2. producer trick cost
    _conv = functools.partial(jax.lax.conv_general_dilated,
                              dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def plain_conv(v):
        return _conv(v, w, window_strides=(1, 1), padding="SAME")

    wp2 = blocked_producer_weights(w)

    def producer_conv(v):
        return _conv(v, wp2, window_strides=(1, 2), padding=((1, 1), (1, 1)))

    t_plain = timeit(plain_conv, x)
    t_prod = timeit(producer_conv, x)
    print(f"plain (3,3)->64 conv {t_plain:.2f} ms | blocked-emitting "
          f"(3,4) s2 ->128 conv {t_prod:.2f} ms (ingest-when-fused "
          f"{t_prod - t_plain:+.2f})", flush=True)

    # 3. exactness
    y = np.asarray(plain_conv(x), np.float32)
    yb = np.asarray(producer_conv(x), np.float32)
    ref = np.stack([y[:, :, 0::2, :], y[:, :, 1::2, :]], axis=3)
    ref = ref.reshape(yb.shape)
    err = np.abs(ref - yb).max()
    print(f"producer-trick exactness max|diff| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
