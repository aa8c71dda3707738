"""3D serving forward: where do the 28 ms/tile-batch go, and is any conv
schedulable headroom left?

Applies the clean chain-marginal methodology (docs/profile_quad_form.py)
to the PNI tile forward's actual conv shapes at serving geometry
(B=8 tiles of (18, 160, 160), xy-s2d eval twin), plus a whole-forward
measurement for the MFU denominator.
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, x, N=10, reps=3):
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


_conv3 = functools.partial(jax.lax.conv_general_dilated,
                           window_strides=(1, 1, 1), padding="SAME",
                           dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def chain_marginal(shape, cio, kd, dt, rng, label):
    B, D, H, W = shape
    cin, cout = cio
    x = jnp.asarray(rng.normal(size=(B, D, H, W, cin)), dt)
    ws = ([jnp.asarray(rng.normal(size=(kd, 3, 3, cin, cout)) * 0.05, dt)]
          + [jnp.asarray(rng.normal(size=(kd, 3, 3, cout, cout)) * 0.05, dt)
             for _ in range(3)])

    def chain(v, k):
        for w in ws[:k]:
            v = jax.nn.relu(_conv3(v, w))
        return v

    t1 = timeit(lambda v: chain(v, 1), x)
    t4 = timeit(lambda v: chain(v, 4), x)
    m = (t4 - t1) / 3
    flops = 2 * kd * 9 * B * D * H * W * cout * cout
    pk = 197e12
    print(f"{label}: marginal {m:.3f} ms/conv "
          f"({100 * flops / (m / 1e3) / pk:.1f}% raw bf16 peak)", flush=True)
    return m


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32

    # hot stage (conv0 block): logical (18,160,160) C28; xy-s2d C112
    chain_marginal((8, 18, 80, 80), (112, 112), 3, dt, rng,
                   "s2d conv0 (8,18,80,80) C112 (3,3,3) [4x logical]")
    chain_marginal((8, 18, 160, 160), (28, 28), 3, dt, rng,
                   "direct conv0 (8,18,160,160) C28 (3,3,3)")
    chain_marginal((8, 18, 80, 80), (112, 112), 1, dt, rng,
                   "s2d conv0 (1,3,3) [4x logical]")
    # stage 1: logical (18,80,80) C36; s2d C144
    chain_marginal((8, 18, 40, 40), (144, 144), 3, dt, rng,
                   "s2d conv1 (8,18,40,40) C144 (3,3,3) [4x logical]")
    chain_marginal((8, 18, 80, 80), (36, 36), 3, dt, rng,
                   "direct conv1 (8,18,80,80) C36 (3,3,3)")
    # stage 2: logical (18,40,40) C48; s2d C192
    chain_marginal((8, 18, 20, 20), (192, 192), 3, dt, rng,
                   "s2d conv2 (8,18,20,20) C192 (3,3,3) [4x logical]")
    chain_marginal((8, 18, 40, 40), (48, 48), 3, dt, rng,
                   "direct conv2 (8,18,40,40) C48 (3,3,3)")

    # whole tile forward via the SHIPPED serving predictor (the direct
    # graph — infer/inference3d.py uses it after the r3 in-scan A/B)
    from pixel_embedded_affinity_tpu.models.unet3d_pni import (
        UNetPNIEmbeddingDeep)

    model = UNetPNIEmbeddingDeep(dtype=dt)
    xs = jnp.asarray(rng.normal(size=(1, 18, 160, 160, 1)), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), xs, train=False))()

    def fwd(v):
        outs = model.apply(variables, v, train=False)
        return outs[-1] if isinstance(outs, (tuple, list)) else outs

    xt = jnp.asarray(rng.normal(size=(8, 18, 160, 160, 1)), dt)
    t = timeit(fwd, xt, N=5)
    from pixel_embedded_affinity_tpu.utils.flops import unet3d_pni_flops
    fl, hbm, _ = unet3d_pni_flops(8, 18, 160, 160)
    print(f"tile forward B=8 (18,160,160) direct {dt.__name__}: {t:.2f} ms"
          f" ({100 * fl / (t / 1e3) / 197e12:.1f}% MFU, {fl / 1e9:.1f} "
          f"GFLOP, HBM floor {100 * hbm / 819e9 / (t / 1e3):.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
