import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception: pass

from pixel_embedded_affinity_tpu.config import load_config
from pixel_embedded_affinity_tpu.ops import embedding_to_affinity_3d
from pixel_embedded_affinity_tpu.ops.offsets import SHIFTS_3D
from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_3d
from pixel_embedded_affinity_tpu.parallel import TiledInference3D
from pixel_embedded_affinity_tpu.train.loop import build_model
from pixel_embedded_affinity_tpu.models.unet3d_pni_s2d import UNetPNIEmbeddingDeepS2D

cfg = load_config("ac3ac4")
dense = build_model(cfg)
twin = UNetPNIEmbeddingDeepS2D(filters=tuple(cfg.model.filters), emd=cfg.model.emd)
rng = jax.random.PRNGKey(0)
variables = jax.jit(functools.partial(dense.init, train=False))(jnp.zeros((1,18,160,160,1)), train=False) if False else jax.jit(functools.partial(dense.init, train=False))(rng, jnp.zeros((1,18,160,160,1)))
vol = np.random.default_rng(1).random((20,320,320)).astype(np.float32)
engine = TiledInference3D(crop_size=(18,160,160), stride=(10,80,80), padding=(4,48,48), batch_size=4)

@jax.jit
def reduce_(cv, wm): return jnp.sum(cv)+jnp.sum(wm)

def predict_maker(mdl, aff):
    def predict(tiles):
        outs = mdl.apply(variables, tiles, train=False)
        emb = outs[-1] if isinstance(outs,(tuple,list)) else outs
        if aff == "fused":
            return jax.nn.relu(fused_affinity_3d(emb, tuple(SHIFTS_3D), 32, False))
        return jax.nn.relu(embedding_to_affinity_3d(emb, tuple(SHIFTS_3D)))
    return predict

for name, mdl, aff in [("twin+fused", twin, "fused"), ("twin+roll", twin, "roll"),
                        ("dense+fused", dense, "fused"), ("dense+roll", dense, "roll")]:
    p = predict_maker(mdl, aff)
    def once():
        cv, wm = engine.run_device_resident(vol, p, n_channels=12, fetch=False)
        float(reduce_(cv, wm))
    once()
    t0=time.perf_counter()
    for _ in range(2): once()
    print(f"{name}: {(time.perf_counter()-t0)/2:.2f} s/vol", flush=True)
