"""Where does the full-geometry tiled 3D engine spend its time?

BENCH r4 first run measured the AC3-geometry sweep (1690 tiles,
100x1024^2) at ~105 s/vol f32 = 62 ms/tile-pair (B=2), while the B=4 PNI
forward alone is ~20 ms/tile — i.e. most of the step is NOT the network.
This probe splits the scan step: full engine vs the same engine with the
predictor replaced by a free constant (isolating tile extraction +
Gaussian-weight multiply + canvas read-modify-write), at serving batch
size 8, plus a batch-size sweep of the full engine.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from pixel_embedded_affinity_tpu.config import load_config
from pixel_embedded_affinity_tpu.ops import embedding_to_affinity_3d
from pixel_embedded_affinity_tpu.ops.offsets import SHIFTS_3D
from pixel_embedded_affinity_tpu.parallel import TiledInference3D
from pixel_embedded_affinity_tpu.train.loop import build_model


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    cfg = load_config("ac3ac4")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 18, 160, 160, 1), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(rng, x0)

    @jax.jit
    def predict(tiles):
        outs = model.apply(variables, tiles, train=False)
        emb = outs[-1] if isinstance(outs, (tuple, list)) else outs
        return jax.nn.relu(embedding_to_affinity_3d(
            emb.astype(jnp.float32), tuple(SHIFTS_3D)))

    @jax.jit
    def predict_free(tiles):
        # data-dependent but compute-free: one scalar per tile broadcast
        # (prevents hoisting; costs ~nothing)
        s = jnp.sum(tiles, axis=(1, 2, 3, 4))  # (B,)
        return jnp.broadcast_to(
            s[:, None, None, None, None],
            (tiles.shape[0], len(SHIFTS_3D), 18, 160, 160))

    # upload once; the engine accepts a device-resident volume (repeat
    # sweeps must not re-measure the ~400 MB tunnel transfer)
    vol = jnp.asarray(
        np.random.default_rng(1).random((100, 1024, 1024)).astype(np.float32))

    @jax.jit
    def _reduce(cv, wm):
        return jnp.sum(cv) + jnp.sum(wm)

    def timed(pfn, bs, reps=1, dense=True):
        engine = TiledInference3D(crop_size=(18, 160, 160),
                                  stride=(10, 80, 80), padding=(4, 48, 48),
                                  batch_size=bs, device_accumulate=False,
                                  dense=dense)

        def once():
            cv, wm = engine.run_device_resident(
                vol, pfn, n_channels=len(SHIFTS_3D), fetch=False)
            float(_reduce(cv, wm))
        once()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            once()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_free_sc = timed(predict_free, 8, dense=False)
    print(f"engine-only SCATTER (free predictor, B=8): {t_free_sc:.1f} s/vol",
          flush=True)
    t_free_dn = timed(predict_free, 8, dense=True)
    print(f"engine-only DENSE-STRIP (free predictor): {t_free_dn:.1f} s/vol",
          flush=True)
    t_sc = timed(predict, 8, dense=False)
    print(f"full engine SCATTER B=8: {t_sc:.1f} s/vol "
          f"({t_sc / 1690 * 1e3:.1f} ms/tile)", flush=True)
    t_dn = timed(predict, 8, dense=True)
    print(f"full engine DENSE-STRIP (fwd chunk 8): {t_dn:.1f} s/vol "
          f"({t_dn / 1690 * 1e3:.1f} ms/tile)", flush=True)


if __name__ == "__main__":
    main()
