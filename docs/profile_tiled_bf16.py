"""In-scan A/B: dense f32 vs dense bf16 predictor in the one-dispatch
tiled 3D engine. The xy-s2d twin and the fused Pallas affinity kernel both
INVERT inside the scan (docs/PERF.md round 3); plain bf16 compute keeps
the graph structure identical, so it may hold its isolated 1.3x.

Run on the TPU:  python docs/profile_tiled_bf16.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

from pixel_embedded_affinity_tpu.config import load_config
from pixel_embedded_affinity_tpu.ops import embedding_to_affinity_3d
from pixel_embedded_affinity_tpu.ops.offsets import SHIFTS_3D
from pixel_embedded_affinity_tpu.parallel import TiledInference3D
from pixel_embedded_affinity_tpu.train.loop import build_model

cfg = load_config("ac3ac4")
dense_f32 = build_model(cfg)
cfg_bf = load_config("ac3ac4")
cfg_bf.model.dtype = "bfloat16"
dense_bf16 = build_model(cfg_bf)

rng = jax.random.PRNGKey(0)
variables = jax.jit(functools.partial(dense_f32.init, train=False))(
    rng, jnp.zeros((1, 18, 160, 160, 1)))
vol = np.random.default_rng(1).random((20, 320, 320)).astype(np.float32)
engine = TiledInference3D(crop_size=(18, 160, 160), stride=(10, 80, 80),
                          padding=(4, 48, 48), batch_size=4)


@jax.jit
def reduce_(cv, wm):
    return jnp.sum(cv) + jnp.sum(wm)


def predict_maker(mdl):
    def predict(tiles):
        outs = mdl.apply(variables, tiles, train=False)
        emb = outs[-1] if isinstance(outs, (tuple, list)) else outs
        return jax.nn.relu(embedding_to_affinity_3d(
            emb.astype(jnp.float32), tuple(SHIFTS_3D)))
    return predict


for name, mdl in [("dense f32 + roll", dense_f32),
                  ("dense bf16 + roll", dense_bf16)]:
    p = predict_maker(mdl)

    def once():
        cv, wm = engine.run_device_resident(vol, p, n_channels=12,
                                            fetch=False)
        float(reduce_(cv, wm))

    once()
    print("# compiled", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(2):
        once()
    print(f"{name}: {(time.perf_counter() - t0) / 2:.2f} s/vol", flush=True)
