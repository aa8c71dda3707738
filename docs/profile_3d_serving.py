"""Round-5 A/B: the 3D tiled-serving forward at the REAL AC3 geometry.

VERDICT r4 #1: the predictor choice at infer/inference3d.py was justified by
a round-3 toy-geometry measurement taken BEFORE the r4 engine fix. Re-run
the A/B INSIDE the fixed, cached, device-resident engine, at full geometry
(100x1024x1024, 1690 tiles) or a mid geometry for iteration, across:

  f32-roll     dense Flax graph, f32, roll-based affinities (ref-faithful)
  bf16-roll    dense Flax graph bf16 (the shipped model.bf16_tiled_infer)
  s2d-roll     xy-s2d twin (models/unet3d_pni_s2d.py), bf16
  fast-roll    fast_forward3d folded-BN z-concat 2D-conv graph, bf16
  fast-fused   fast graph + fused Pallas 3D affinity kernel
  fast-bN      fast graph at tile batch N (engine batch sweep)

Usage: python docs/profile_3d_serving.py [full|mid] [variants...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from pixel_embedded_affinity_tpu.config import load_config
    from pixel_embedded_affinity_tpu.models.fast_forward3d import (
        build_fast_pni_forward)
    from pixel_embedded_affinity_tpu.ops import embedding_to_affinity_3d
    from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_3d
    from pixel_embedded_affinity_tpu.ops.offsets import SHIFTS_3D
    from pixel_embedded_affinity_tpu.parallel import TiledInference3D
    from pixel_embedded_affinity_tpu.train.loop import build_model

    geom = sys.argv[1] if len(sys.argv) > 1 else "mid"
    wanted = sys.argv[2:] or ["f32-roll", "bf16-roll", "s2d-roll",
                              "fast-roll", "fast-fused"]
    vol_shape = (100, 1024, 1024) if geom == "full" else (40, 512, 512)
    vol = np.random.default_rng(1).random(vol_shape).astype(np.float32)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 18, 160, 160, 1), jnp.float32)
    cfg = load_config("ac3ac4")
    model_f32 = build_model(cfg)
    variables = jax.jit(functools.partial(model_f32.init, train=False))(rng, x0)
    cfg_bf = load_config("ac3ac4")
    cfg_bf.model.dtype = "bfloat16"
    model_bf16 = build_model(cfg_bf)

    from pixel_embedded_affinity_tpu.models.unet3d_pni_s2d import (
        UNetPNIEmbeddingDeepS2D)

    model_s2d = UNetPNIEmbeddingDeepS2D(dtype=jnp.bfloat16)
    fast = build_fast_pni_forward(variables, dtype=jnp.bfloat16)

    def roll_affs(emb):
        return jax.nn.relu(embedding_to_affinity_3d(
            emb.astype(jnp.float32), tuple(SHIFTS_3D)))

    def fused_affs(emb):
        return jax.nn.relu(fused_affinity_3d(emb, tuple(SHIFTS_3D)))

    def make_flax(mdl, aff):
        @jax.jit
        def predict(tiles):
            outs = mdl.apply(variables, tiles, train=False)
            emb = outs[-1] if isinstance(outs, (tuple, list)) else outs
            return aff(emb)
        return predict

    def make_fast(aff):
        @jax.jit
        def predict(tiles):
            return aff(fast(tiles))
        return predict

    preds = {
        "f32-roll": lambda: make_flax(model_f32, roll_affs),
        "bf16-roll": lambda: make_flax(model_bf16, roll_affs),
        "s2d-roll": lambda: make_flax(model_s2d, roll_affs),
        "fast-roll": lambda: make_fast(roll_affs),
        "fast-fused": lambda: make_fast(fused_affs),
    }

    @jax.jit
    def _reduce(cv, wm):
        return jnp.sum(cv) + jnp.sum(wm)

    vol_dev = jax.device_put(vol)

    def timed(pfn, batch_size=8, reps=2):
        engine = TiledInference3D(crop_size=(18, 160, 160),
                                  stride=(10, 80, 80), padding=(4, 48, 48),
                                  batch_size=batch_size,
                                  device_accumulate=False)

        def once():
            cv, wm = engine.run_device_resident(
                vol_dev, pfn, n_channels=len(SHIFTS_3D), fetch=False)
            float(_reduce(cv, wm))

        once()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            once()
            times.append(time.perf_counter() - t0)
        return min(times)

    mvox = vol.size / 1e6
    for name in wanted:
        if name.startswith("fast-b"):
            bs = int(name[6:])
            pfn = make_fast(roll_affs)
            dt = timed(pfn, batch_size=bs)
        elif name.startswith("fused-b"):
            bs = int(name[7:])
            pfn = make_fast(fused_affs)
            dt = timed(pfn, batch_size=bs)
        else:
            dt = timed(preds[name]())
        print(f"{geom} {name:12s} {dt:8.2f} s/vol  {mvox/dt:7.2f} MVox/s",
              flush=True)


if __name__ == "__main__":
    main()
