"""XLA-flag A/B for the headline forward (docs/PERF.md follow-up).

Each candidate flag set runs in a SUBPROCESS (flags must be set before
backend init) and times the bench's 'ours' path (s2d fast forward + fused
affinity, B=8 544^2 bf16) with the min-of-reps in-jit-scan harness.

Usage: python docs/profile_xla_flags.py
"""

import json
import os
import subprocess
import sys

CANDIDATES = {
    "default": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "no_latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "async_ag": "--xla_enable_async_all_gather=true",
    "flash_fusion": "--xla_tpu_enable_flash_fusion=true",
}

CHILD = r"""
import json, sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")

from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
from pixel_embedded_affinity_tpu.models.fast_forward import (
    build_fast_resunet_forward, pack_image_s2d)
from pixel_embedded_affinity_tpu.ops import multi_offset
from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_2d

B, H, W, N = 8, 544, 544, 20
rng = jax.random.PRNGKey(0)
x = np.random.default_rng(0).normal(size=(B, H, W, 3)).astype(np.float32)
offsets = tuple(map(tuple, multi_offset([1, 3, 5, 9, 27], neighbor=4)))
model = ResidualUNet2DDeep(out_channels=2, nfeatures=(16, 32, 64, 128, 256),
                           emd=16, dtype=jnp.bfloat16)
variables = jax.jit(functools.partial(model.init, train=False))(rng, jnp.asarray(x[:1]))
fwd = build_fast_resunet_forward(variables, dtype=jnp.bfloat16, input_format="s2d")
xp = jnp.asarray(pack_image_s2d(x)).astype(jnp.bfloat16)

@jax.jit
def run(xs, eps):
    def body(c, e):
        emb, _ = fwd(xs + e)
        affs = jax.nn.relu(fused_affinity_2d(emb, offsets, 32, False))
        return c + affs.astype(jnp.float32).sum(), None
    s, _ = jax.lax.scan(body, jnp.float32(0), eps)
    return s

eps = jnp.zeros((N,), xp.dtype)
float(run(xp, eps))
times = []
for _ in range(3):
    t0 = time.perf_counter()
    float(run(xp, eps))
    times.append(time.perf_counter() - t0)
print(json.dumps({"ms": min(times) / N * 1e3}))
"""


def main():
    results = {}
    for name, flags in CANDIDATES.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # flag variants change the program hash; don't pollute the shared
        # compile cache with near-duplicates
        if name != "default":
            env["JAX_COMPILATION_CACHE_DIR"] = ""
        try:
            out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                                 capture_output=True, text=True, timeout=1800)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            results[name] = json.loads(line[-1])["ms"] if line else \
                f"no output (rc={out.returncode}): {out.stderr[-300:]}"
        except Exception as e:  # noqa: BLE001
            results[name] = f"error: {e}"
        print(name, "->", results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
