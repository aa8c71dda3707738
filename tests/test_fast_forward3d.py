"""build_fast_pni_forward must reproduce UNetPNIEmbeddingDeep's serving
embedding exactly (f32) — folded BN + z-concat 2D-conv lowering is a pure
reformulation, not an approximation."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pni_setup():
    import functools

    import jax
    import jax.numpy as jnp

    from pixel_embedded_affinity_tpu.models.unet3d_pni import (
        UNetPNIEmbeddingDeep)

    model = UNetPNIEmbeddingDeep(filters=(4, 6, 8, 12, 16), emd=5)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 6, 32, 48, 1)).astype(np.float32))
    variables = jax.jit(functools.partial(model.init, train=False))(rng, x)
    # non-trivial BN stats so folding is actually exercised
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.3 * np.random.default_rng(1).normal(
            size=a.shape).astype(np.float32) ** 2,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    return model, variables, x


def test_fast_pni_forward_matches_flax_f32(pni_setup):
    import jax
    import jax.numpy as jnp

    from pixel_embedded_affinity_tpu.models.fast_forward3d import (
        build_fast_pni_forward)

    model, variables, x = pni_setup
    ref = jax.jit(lambda v: model.apply(variables, v, train=False)[-1])(x)
    fast = build_fast_pni_forward(variables, dtype=jnp.float32,
                                  filters=(4, 6, 8, 12, 16), emd=5)
    out = jax.jit(fast)(x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fast_pni_forward_bf16_close(pni_setup):
    import jax
    import jax.numpy as jnp

    from pixel_embedded_affinity_tpu.models.fast_forward3d import (
        build_fast_pni_forward)

    model, variables, x = pni_setup
    ref = jax.jit(lambda v: model.apply(variables, v, train=False)[-1])(x)
    fast = build_fast_pni_forward(variables, dtype=jnp.bfloat16,
                                  filters=(4, 6, 8, 12, 16), emd=5)
    out = np.asarray(jax.jit(fast)(x))
    assert out.dtype == np.float32  # emb_f32 default
    ref = np.asarray(ref)
    # bf16 compute tolerance; the serving decoders consume cosine
    # similarities of these embeddings, pinned separately by the tiled
    # canvas-closeness tests
    cos = (out * ref).sum(-1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-8)
    # random-init weights + artificially inflated BN stats are a worst case
    # for bf16 drift (trained-checkpoint closeness is pinned by the tiled
    # canvas tests and the serving quality gates)
    assert cos.min() > 0.95, cos.min()
    assert cos.mean() > 0.995, cos.mean()
