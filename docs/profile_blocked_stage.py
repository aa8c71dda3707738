"""Blocked-pixel layout carried through a full stage (VERDICT r3 #5).

docs/PERF.md:64-66 (round 2) proposed the blocked-pixel Pallas conv
applied ON TOP of the s2d layout (C64 -> cc=64, bx=2, useful-FLOP ceiling
75%) as "the next lever", IF the blocked layout is carried end-to-end so
the ingest relayout amortizes. This probe settles it:

  A. XLA dense 3x3 conv at the shipped s2d stage shapes (272^2-class,
     C64/C128) — the incumbent.
  B. conv3x3_blocked at the same shapes, single conv (pays one ingest +
     one egress relayout).
  C. a 3-conv chain (64->64->64->64) in each form — the end-to-end case:
     if blocked chaining amortizes the relayouts, the per-conv marginal
     cost (chain/3) is the number to compare against XLA's.

Timing: N-scan inside one jit + scalar fetch, min over reps (bench.py
methodology — block_until_ready does not synchronize on this tunnel).
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixel_embedded_affinity_tpu.ops.conv3x3_blocked import conv3x3_blocked


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


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32

    for (B, H, W, cin, cout) in [(8, 272, 272, 64, 64),
                                 (8, 272, 272, 64, 128),
                                 (8, 136, 136, 128, 128)]:
        x = jnp.asarray(rng.normal(size=(B, H, W, cin)), dt)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, dt)

        def xla_conv(v, w=w):
            return jax.lax.conv_general_dilated(
                v, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def blk_conv(v, w=w):
            return conv3x3_blocked(v, w, relu=False)

        t_xla = timeit(xla_conv, x)
        t_blk = timeit(blk_conv, x)
        flops = 2 * 9 * B * H * W * cin * cout
        pk = 197e12
        print(f"({B},{H},{W},{cin})->{cout}: XLA {t_xla:.2f} ms "
              f"({100 * flops / (t_xla / 1e3) / pk:.1f}% bf16 peak) | "
              f"blocked {t_blk:.2f} ms "
              f"({100 * flops / (t_blk / 1e3) / pk:.1f}%)", flush=True)

    # end-to-end chain: 3 convs 64->64, relu between (stage-like)
    B, H, W, C = 8, 272, 272, 64
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), dt)
    ws = [jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, dt)
          for _ in range(3)]

    def xla_chain(v):
        for w in ws:
            v = jax.nn.relu(jax.lax.conv_general_dilated(
                v, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return v

    def blk_chain(v):
        for w in ws:
            v = conv3x3_blocked(v, w, relu=True)
        return v

    from pixel_embedded_affinity_tpu.ops.conv3x3_blocked import (
        conv3x3_blocked_chain, blocked_ingest, conv3x3_blocked_flat)

    def blk_chained(v):
        return conv3x3_blocked_chain(v, ws, relu=True)

    t_xla = timeit(xla_chain, x)
    t_blk = timeit(blk_chain, x)
    t_chn = timeit(blk_chained, x)
    print(f"3-conv chain 64->64 @272^2: XLA {t_xla:.2f} ms | blocked "
          f"per-conv-relayout {t_blk:.2f} ms | CHAINED one-ingest "
          f"{t_chn:.2f} ms (marginal/conv {t_chn / 3:.2f} vs XLA "
          f"{t_xla / 3:.2f})", flush=True)

    # kernel-core-only marginal: time k=3 vs k=6 chains in flat form (same
    # single ingest/egress) — the difference isolates 3 pure in-stream convs.
    ws6 = ws + ws

    def chain_k(v, wlist):
        xf, g = blocked_ingest(v, top=16, left=len(wlist) + 1)
        oy, ox = 16, len(wlist) + 1
        for w in wlist:
            xf = conv3x3_blocked_flat(xf, w, g, oy, ox, relu=True)
            oy, ox = oy - 1, ox - 1
        return xf

    t3 = timeit(lambda v: chain_k(v, ws), x)
    t6 = timeit(lambda v: chain_k(v, ws6), x)
    print(f"flat-chain marginal (k=6 minus k=3)/3: "
          f"{(t6 - t3) / 3:.3f} ms/conv (XLA {t_xla / 3:.3f})", flush=True)


if __name__ == "__main__":
    main()
