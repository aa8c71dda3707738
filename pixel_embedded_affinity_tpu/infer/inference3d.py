"""3D inference driver (AC3/AC4): tiled forward + three decoders.

Mirrors scripts_ac3ac4/inference.py: tiled sliding-window forward with
Gaussian blending over the full volume, then optional decoders on the
stitched (12, Z, H, W) canvas: mutex watershed with the 12-offset shift
table (strides [1,10,10]), waterz-style mean-affinity agglomeration at 0.5
on the first 3 channels, and multicut; VOI/ARAND per decoder.
"""

from __future__ import annotations

import numpy as np

from ..config import Config
from ..ops.offsets import offsets_3d, SHIFTS_3D
from ..ops.affinity_np import relabel
from ..parallel import TiledInference3D
from ..postproc import seg_mutex, seg_waterz, mc_baseline
from ..postproc.watershed import watershed_from_affs
from ..postproc.agglomerate import agglomerate
from ..metrics import voi, adapted_rand_error


def run_inference_3d(cfg: Config, variables, volume: np.ndarray,
                     gt: np.ndarray | None = None,
                     decoders=("mutex", "waterz", "lmc"),
                     crop_size=(18, 160, 160), stride=(10, 80, 80),
                     padding=(4, 48, 48), batch_size: int = 8,
                     use_pallas: bool | None = None):
    """Returns (affs canvas (12,Z,H,W), {decoder: (seg, metrics)})."""
    import jax

    from ..train.loop import build_model
    from ..ops import embedding_to_affinity_3d

    if cfg.model.bf16_tiled_infer and cfg.model.dtype == "float32":
        # dtype-only serving speedup (1.28x in-scan, docs/PERF.md r3): the
        # predictor runs bf16; the embedding is cast back to f32 before
        # the affinity dot so the canvas/decoders see f32 affinities
        import copy

        cfg = copy.deepcopy(cfg)
        cfg.model.dtype = "bfloat16"
    model = build_model(cfg)
    del use_pallas  # accepted for API symmetry with run_inference_2d but
    # unused: the tiled path always runs the roll-based affinity graph on
    # every platform — see the measured A/B below
    # Predictor choice (docs/PERF.md round-3 A/B, measured INSIDE the
    # one-dispatch scan engine at (20,320,320)): dense+roll 3.9 s/vol,
    # s2d-twin+roll 7.6, dense+fused 15.4, twin+fused 21.0 — both the
    # xy-s2d twin and the fused Pallas affinity kernel (isolated wins in
    # r2) INVERT inside lax.scan. The tiled path therefore uses the direct
    # graph with roll-based affinities; the fused kernel remains on the
    # (non-scan) training step where it wins.

    @jax.jit
    def predict(tiles):  # (B, d, h, w, 1) -> (B, 12, d, h, w)
        import jax.numpy as jnp

        outs = model.apply(variables, tiles, train=False)
        embedding = outs[-1] if isinstance(outs, (tuple, list)) else outs
        affs = embedding_to_affinity_3d(embedding.astype(jnp.float32),
                                        tuple(SHIFTS_3D))
        return jax.nn.relu(affs)

    engine = TiledInference3D(crop_size=crop_size, stride=stride,
                              padding=padding, batch_size=batch_size)
    if jax.devices()[0].platform == "tpu":
        # upload the volume once; tiles/accumulation stay in HBM
        affs = engine.run_device_resident(volume, predict,
                                          n_channels=len(SHIFTS_3D))
    else:
        affs = engine.run(volume, predict, n_channels=len(SHIFTS_3D))

    out = {}
    for dec in decoders:
        if dec == "mutex":
            seg = seg_mutex(affs, offsets=offsets_3d(),
                            strides=[1, 10, 10]).astype(np.uint64)
        elif dec == "waterz":
            fragments = watershed_from_affs(affs[:3])
            seg = agglomerate(affs[:3], fragments, threshold=0.5)
        elif dec == "lmc":
            seg = mc_baseline(affs[:3])
        else:
            raise ValueError(dec)
        seg = relabel(seg.astype(np.int64))
        metrics = {}
        if gt is not None:
            vs, vm = voi(gt, seg)
            metrics = {"voi_split": vs, "voi_merge": vm, "voi": vs + vm,
                       "arand": adapted_rand_error(gt, seg)[0]}
        out[dec] = (seg, metrics)
    return affs, out
