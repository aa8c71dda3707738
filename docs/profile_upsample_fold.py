"""VERDICT-r2 #2a experiment: fold the 2x upsample into the following conv.

Claim under test: conv3x3(upsample2x(x)) can be ONE lax.conv_general_dilated
with lhs_dilation=2 and a composed kernel, removing the upsample
materialization + one HBM round trip per decoder stage.

Algebraic finding (documented in docs/PERF.md): the fold is EXACT only for
uniform-phase upsampling. The reference decoder uses
nn.Upsample(align_corners=True) (scripts_cvppp/model/unet2d_residual.py:57),
whose output row i samples input coordinate i*(H-1)/(2H-1) — the fractional
phase drifts with i (aperiodic), so conv-after-upsample is position-
dependent and has NO fixed-kernel conv form. The fold is therefore a
non-parity variant (exact for align_corners=False semantics, where phases
alternate 0.75/0.25). This script measures all three on chip:

  A. align_corners=True dense-interp einsum upsample + conv3x3   (parity path)
  B. align_corners=False 2-phase einsum upsample + conv3x3        (uniform)
  C. folded: ONE conv_general_dilated(lhs_dilation=2), == B exactly

and verifies C == B numerically.
"""

import sys
import time

import numpy as np


def interp_matrix_false(out_size, in_size):
    """align_corners=False bilinear (out, in) matrix, edge-clamped."""
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
    lo = np.floor(src).astype(np.int64)
    w = (src - lo).astype(np.float32)
    a = np.zeros((out_size, in_size), np.float32)
    idx = np.arange(out_size)
    np.add.at(a, (idx, np.clip(lo, 0, in_size - 1)), 1.0 - w)
    np.add.at(a, (idx, np.clip(lo + 1, 0, in_size - 1)), w)
    return a


def composed_kernel(k33, dtype):
    """(3, 3, Cin, Cout) -> (6, 6, Cin, Cout): K composed with the bilinear
    2x kernel u = [1, 3, 3, 1]/4 per axis (align_corners=False phases)."""
    import jax.numpy as jnp

    u = np.array([1.0, 3.0, 3.0, 1.0], np.float32) / 4.0
    # compose along H then W: K'[a] = sum_b K[b] * u[a - 2? ] -- full conv
    k = np.asarray(k33, np.float32)
    kh = np.zeros((6,) + k.shape[1:], np.float32)
    for a in range(3):
        for b in range(4):
            kh[a + b] += k[a] * u[b]
    kf = np.zeros((6, 6) + k.shape[2:], np.float32)
    for a in range(3):
        for b in range(4):
            kf[:, a + b] += kh[:, a] * u[b]
    return jnp.asarray(kf, dtype)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pixel_embedded_affinity_tpu.models.common import (
        upsample_align_corners, _interp_matrix)

    B, H, C_IN, C_OUT = 8, 272, 96, 32
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, H, C_IN)), dtype)
    k33 = jnp.asarray(rng.normal(size=(3, 3, C_IN, C_OUT)) * 0.05, dtype)
    m_false = jnp.asarray(interp_matrix_false(2 * H, H), dtype)
    dn = lax.conv_dimension_numbers(x.shape, (3, 3, C_IN, C_OUT),
                                    ("NHWC", "HWIO", "NHWC"))

    def conv33(y, k):
        return lax.conv_general_dilated(y, k, (1, 1), "SAME",
                                        dimension_numbers=dn)

    def path_a(x):  # parity: align_corners=True einsum up + conv
        y = upsample_align_corners(x, axes=(1, 2), factors=(2, 2))
        return conv33(y, k33)

    def path_b(x):  # uniform-phase einsum up + conv
        y = jnp.einsum("oh,bhwc->bowc", m_false, x)
        y = jnp.einsum("ow,bhwc->bhoc", m_false, y)
        return conv33(y, k33)

    kf = composed_kernel(k33, dtype)
    dn6 = lax.conv_dimension_numbers(x.shape, (6, 6, C_IN, C_OUT),
                                     ("NHWC", "HWIO", "NHWC"))

    def path_c(x):  # folded: one conv on the 2x-dilated input
        # composed taps: out[j] = sum_t kf[t] xd[j - 3 + t] (upsample pad 2
        # + conv SAME pad 1); interior-exact vs B, the border differs
        # (edge-clamp vs zero-pad) and is excluded from the check below
        return lax.conv_general_dilated(
            x, kf, window_strides=(1, 1), padding=((3, 3), (3, 3)),
            lhs_dilation=(2, 2), dimension_numbers=dn6)

    # numeric check (f32, interior)
    xf = x.astype(jnp.float32)

    def f32_run(fn):
        return np.asarray(jax.jit(
            lambda v: fn(v.astype(jnp.float32)).astype(jnp.float32))(xf))

    ob = f32_run(lambda v: path_b(v))
    oc = f32_run(lambda v: path_c(v))
    inner = (slice(None), slice(4, -4), slice(4, -4), slice(None))
    err = np.abs(ob[inner] - oc[inner]).max() / (np.abs(ob[inner]).max() + 1e-9)
    print(f"# C == B interior rel err: {err:.2e}", file=sys.stderr)
    assert err < 3e-2, err  # bf16-composed weights; f32 run of same graph

    N = 20

    def timeit(fn):
        @jax.jit
        def run(x, eps):
            def body(c, e):
                return c + fn(x + e).astype(jnp.float32).sum(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), eps)
            return s

        eps = jnp.zeros((N,), dtype)
        float(run(x, eps))
        t0 = time.perf_counter()
        for _ in range(3):
            float(run(x, eps))
        return (time.perf_counter() - t0) / (3 * N) * 1e3

    ta = timeit(path_a)
    tb = timeit(path_b)
    tc = timeit(path_c)
    print(f"A align_corners=True einsum+conv : {ta:.2f} ms")
    print(f"B uniform-phase einsum+conv      : {tb:.2f} ms")
    print(f"C folded lhs_dilation conv (==B) : {tc:.2f} ms")


if __name__ == "__main__":
    main()
