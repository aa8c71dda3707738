"""Diff convolution/custom-call layouts between fwd-only and composed
B=1 graphs (follow-up to profile_b1_hlo.py)."""

import functools
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(B=1):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")

    from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
    from pixel_embedded_affinity_tpu.models.fast_forward import (
        build_fast_resunet_forward, pack_image_s2d)
    from pixel_embedded_affinity_tpu.ops import multi_offset
    from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_2d

    H = W = 544
    offsets = tuple(map(tuple, multi_offset([1, 3, 5, 9, 27], neighbor=4)))
    dtype = jnp.bfloat16

    model = ResidualUNet2DDeep(out_channels=2, nfeatures=(16, 32, 64, 128, 256),
                               emd=16, dtype=dtype)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), x0)
    fwd = build_fast_resunet_forward(variables, dtype=dtype,
                                     input_format="s2d")

    rng = np.random.default_rng(0)
    img = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    x = jnp.asarray(pack_image_s2d(img)).astype(dtype)

    def sig(fn):
        txt = jax.jit(fn).lower(x).compile().as_text()
        convs = []
        for line in txt.splitlines():
            if re.search(r"=\s+\S+\s+convolution\(", line):
                m = re.search(r"=\s+(\S+)\s+convolution.*window={(\S+)}", line)
                convs.append((m.group(1) if m else line[:60],
                              m.group(2) if m else ""))
            if "custom-call" in line:
                convs.append(("CUSTOM", line.strip()[:200]))
        return convs

    a = sig(lambda xx: fwd(xx)[0])
    b = sig(lambda xx: jax.nn.relu(
        fused_affinity_2d(fwd(xx)[0], offsets, 32, False)))
    sa = [f"{t} {w}" for t, w in a]
    sb = [f"{t} {w}" for t, w in b]
    only_a = [s for s in sa if s not in sb]
    only_b = [s for s in sb if s not in sa]
    print(f"fwd convs {len(a)}, composed convs {len(b)}")
    print("--- only in fwd-only:")
    for s in only_a:
        print("  ", s[:200])
    print("--- only in composed:")
    for s in only_b:
        print("  ", s[:200])


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
