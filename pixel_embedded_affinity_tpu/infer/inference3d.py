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


def build_tiled_predictor(cfg: Config, variables,
                          use_pallas: bool | None = None):
    """The shipped tiled-serving predictor: (B, d, h, w, 1) f32 tiles ->
    (B, 12, d, h, w) relu'd affinities.

    Predictor choice, re-measured in round 5 INSIDE the fixed (cached,
    device-resident) engine at the FULL AC3 serving geometry
    (100x1024^2, 1690 tiles; docs/profile_3d_serving.py, PERF.md r5).
    The round-3 toy-geometry rejection of structural rewrites was an
    artifact of the engine re-tracing per call: with that fixed, the
    folded-BN z-concat 2D-conv serving graph (models/fast_forward3d.py)
    + the fused Pallas affinity kernel wins over the dense Flax graph
    with roll-based affinities. Fallbacks: non-PNI archs and
    fast_tiled_infer=False run the dense graph; CPU keeps roll affinities
    (no Pallas)."""
    import jax
    import jax.numpy as jnp

    from ..train.loop import build_model
    from ..ops import embedding_to_affinity_3d

    on_tpu = jax.devices()[0].platform == "tpu"
    from ..config import resolve_compute_dtype

    serve_dtype = (jnp.bfloat16
                   if (cfg.model.bf16_tiled_infer
                       or resolve_compute_dtype(cfg.model) == "bfloat16")
                   else jnp.float32)
    fast = (cfg.model.fast_tiled_infer
            and cfg.model.arch == "unet_pni_deep")
    use_fused = use_pallas if use_pallas is not None else on_tpu

    def affinities(embedding, fused):
        if fused:
            from ..ops.emb2aff_pallas import fused_affinity_3d

            return jax.nn.relu(fused_affinity_3d(embedding,
                                                 tuple(SHIFTS_3D)))
        return jax.nn.relu(embedding_to_affinity_3d(
            embedding.astype(jnp.float32), tuple(SHIFTS_3D)))

    if fast:
        from ..models.fast_forward3d import build_fast_pni_forward

        fwd = build_fast_pni_forward(variables, dtype=serve_dtype,
                                     filters=tuple(cfg.model.filters),
                                     emd=cfg.model.emd)

        @jax.jit
        def predict(tiles):  # (B, d, h, w, 1) -> (B, 12, d, h, w)
            return affinities(fwd(tiles), use_fused)
    else:
        if serve_dtype == jnp.bfloat16:
            # dtype-only serving speedup for the dense graph (1.28x
            # in-scan, docs/PERF.md r3); the embedding is cast back to
            # f32 before the affinity dot so canvases stay f32
            import copy

            cfg = copy.deepcopy(cfg)
            cfg.model.dtype = "bfloat16"
        model = build_model(cfg)

        @jax.jit
        def predict(tiles):
            # dense fallback keeps roll affinities: the fused-kernel
            # in-scan A/B was only (re-)measured for the fast graph
            outs = model.apply(variables, tiles, train=False)
            embedding = outs[-1] if isinstance(outs, (tuple, list)) else outs
            return affinities(embedding.astype(jnp.float32), False)

    return predict


def run_inference_3d(cfg: Config, variables, volume: np.ndarray,
                     gt: np.ndarray | None = None,
                     decoders=("mutex", "waterz", "lmc"),
                     crop_size=(18, 160, 160), stride=(10, 80, 80),
                     padding=(4, 48, 48), batch_size: int = 4,
                     use_pallas: bool | None = None,
                     timing: dict | None = None):
    """Returns (affs canvas (12,Z,H,W), {decoder: (seg, metrics)}).

    ``timing``: optional dict filled with the end-to-end COST TIME split —
    total / tiled forward+stitch (incl. canvas fetch) / per-decoder host
    decode seconds — mirroring the reference's whole-run COST TIME report
    (scripts_ac3ac4/inference.py 'COST TIME' prints) with the host-decode
    share separated out, which the reference never measures.
    """
    import time as _time

    import jax

    predict = build_tiled_predictor(cfg, variables, use_pallas=use_pallas)

    engine = TiledInference3D(crop_size=crop_size, stride=stride,
                              padding=padding, batch_size=batch_size)
    t_start = _time.perf_counter()
    if jax.devices()[0].platform == "tpu":
        # upload the volume once; tiles/accumulation stay in HBM
        affs = engine.run_device_resident(volume, predict,
                                          n_channels=len(SHIFTS_3D))
    else:
        affs = engine.run(volume, predict, n_channels=len(SHIFTS_3D))
    t_fwd = _time.perf_counter() - t_start

    out = {}
    dec_times = {}
    for dec in decoders:
        t0 = _time.perf_counter()
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
        dec_times[dec] = round(_time.perf_counter() - t0, 3)
        metrics = {}
        if gt is not None:
            vs, vm = voi(gt, seg)
            metrics = {"voi_split": vs, "voi_merge": vm, "voi": vs + vm,
                       "arand": adapted_rand_error(gt, seg)[0]}
        out[dec] = (seg, metrics)
    if timing is not None:
        timing.update(total_s=round(_time.perf_counter() - t_start, 3),
                      forward_s=round(t_fwd, 3),
                      decode_s=dict(dec_times))
    return affs, out
