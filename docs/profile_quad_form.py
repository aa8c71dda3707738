"""Quad-block (2x4 pixel-block-to-depth) conv form vs the shipped s2d
forms at the real 272^2-class stage shapes.

Generalizing ops/s2d.py: grouping (sy, sx) pixels per block turns a 3x3
logical conv into a 3x3 block conv with C*sy*sx channels and sy*sx-times
the logical FLOPs (kernel density 1/(sy*sx)). The shipped form uses
(2, 2) -> C64/C128 tensors (4x FLOPs); C64 minors are still lane-padded
2x and the conv runs at ~30% raw MXU. A (2, 4) block makes every stage
tensor a DENSE 128-minor and the conv a (3,3,128k,128k) matmul (87% raw
measured at 136^2 C128) at 8x logical FLOPs for C16 stages / the same 2x
executed-FLOP step-up for C32 stages. This probe measures 3-conv-chain
marginals (the honest in-context number) for each candidate stage shape,
current form vs quad form, plus the one-off relayout between them.
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


_conv = functools.partial(jax.lax.conv_general_dilated,
                          window_strides=(1, 1), padding="SAME",
                          dimension_numbers=("NHWC", "HWIO", "NHWC"))


def chain_marginal(shape, cio, dt, rng, label):
    """(k=4 minus k=1)/3 chain marginal of a 3x3 conv at the given shape."""
    B, H, W = shape
    cin, cout = cio
    x = jnp.asarray(rng.normal(size=(B, H, W, cin)), dt)
    ws = ([jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, dt)]
          + [jnp.asarray(rng.normal(size=(3, 3, cout, cout)) * 0.05, dt)
             for _ in range(3)])

    def chain(v, k):
        for w in ws[:k]:
            v = jax.nn.relu(_conv(v, w))
        return v

    t1 = timeit(lambda v: chain(v, 1), x)
    t4 = timeit(lambda v: chain(v, 4), x)
    m = (t4 - t1) / 3
    flops = 2 * 9 * B * H * W * cout * cout
    pk = 197e12
    print(f"{label}: marginal {m:.3f} ms/conv "
          f"({100 * flops / (m / 1e3) / pk:.1f}% raw bf16 peak)", flush=True)
    return m


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32

    # inconv/up4 conv2-class: logical 544^2 C16 -> C16 (1.09e10 useful FLOPs)
    m_cur = chain_marginal((8, 272, 272), (64, 64), dt, rng,
                           "s2d(2,2)  272^2 C64 ->C64  (4x FLOPs)")
    m_quad = chain_marginal((8, 272, 136), (128, 128), dt, rng,
                            "quad(2,4) 272x136 C128->C128 (8x FLOPs)")
    useful = 2 * 9 * 8 * 544 * 544 * 16 * 16
    print(f"  -> logical C16 stage conv: s2d {m_cur:.3f} ms "
          f"({100 * useful / (m_cur / 1e3) / 197e12:.1f}% useful) | quad "
          f"{m_quad:.3f} ms ({100 * useful / (m_quad / 1e3) / 197e12:.1f}%"
          f" useful)", flush=True)

    # down1/up4-wide class: logical 272^2 C32/C64 convs
    chain_marginal((8, 272, 272), (128, 128), dt, rng,
                   "s2d(2,2)  272^2 C128->C128 (down1.c2, 4x)")
    chain_marginal((8, 272, 136), (256, 256), dt, rng,
                   "quad(2,4) 272x136 C256->C256 (down1.c2, 8x)")

    # relayout cost between the forms: (B,272,272,64) <-> (B,272,136,128)
    x = jnp.asarray(rng.normal(size=(8, 272, 272, 64)), dt)

    def to_quad(v):
        b, h, w, c = v.shape
        return v.reshape(b, h, w // 2, 2 * c)

    def from_quad(v):
        b, h, w2, c2 = v.shape
        return v.reshape(b, h, w2 * 2, c2 // 2)

    t_to = timeit(to_quad, x)
    xq = to_quad(x)
    t_from = timeit(from_quad, xq)
    print(f"relayout s2d->quad {t_to:.3f} ms | quad->s2d {t_from:.3f} ms",
          flush=True)

    # exactness of the quad form for one logical conv (pair grouping of the
    # s2d tensor: logical 3x3 conv == 3x3 block conv with banded kernel)
    rngs = np.random.default_rng(1)
    xs = jnp.asarray(rngs.normal(size=(2, 16, 20, 8)), jnp.float32)
    w = jnp.asarray(rngs.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)
    # build the pair-form kernel: out (qx, co) at block X from in (px, ci)
    # of block X+bx-1, tap dx = 2*(bx-1) + px - qx in [-1,0,1]
    wq = np.zeros((3, 3, 16, 16), np.float32)
    wn = np.asarray(w)
    for bx in range(3):
        for px in range(2):
            for qx in range(2):
                dx = 2 * (bx - 1) + px - qx
                if -1 <= dx <= 1:
                    wq[:, bx, px * 8:(px + 1) * 8, qx * 8:(qx + 1) * 8] = \
                        wn[:, dx + 1]
    y = np.asarray(_conv(xs, w))
    xq2 = np.asarray(xs).reshape(2, 16, 10, 16)
    yq = np.asarray(_conv(jnp.asarray(xq2), jnp.asarray(wq)))
    err = np.abs(yq.reshape(y.shape) - y).max()
    print(f"pair-form exactness max|diff| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
