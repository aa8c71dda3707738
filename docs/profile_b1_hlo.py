"""Round-5 probe: diff the compiled-HLO op mix of fwd vs fwd+fused-affinity
at B=1 to find the +3.7 ms composition overhead (docs/profile_b1_split.py).

Prints per-op-kind counts and the largest copy/transpose/fusion ops.

Usage: python docs/profile_b1_hlo.py [B]
"""

import collections
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

    def summarize(name, fn):
        txt = jax.jit(fn).lower(x).compile().as_text()
        counts = collections.Counter()
        lines = []
        for line in txt.splitlines():
            m = re.search(r"=\s+\S+\s+(\w+)\(", line)
            if not m:
                continue
            kind = m.group(1)
            counts[kind] += 1
            if kind in ("copy", "transpose", "custom"):
                lines.append(line.strip()[:160])
        print(f"== {name}: total ops "
              f"{sum(counts.values())}", flush=True)
        for k, v in sorted(counts.items(), key=lambda kv: -kv[1])[:15]:
            print(f"   {k:20s} {v}")
        for ln in lines[:20]:
            print(f"   | {ln}")

    summarize("fwd only", lambda xx: fwd(xx)[0])
    summarize("fwd + fused affinity", lambda xx: jax.nn.relu(
        fused_affinity_2d(fwd(xx)[0], offsets, 32, False)))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
