"""Frozen serving artifacts via ``jax.export`` (StableHLO).

No reference analog: the reference serves from a live torch process
(scripts_*/inference.py keeps the Python model + checkpoint in memory).
For production deployment this module freezes checkpoint weights + the
forward graph + the embedding->affinity op into ONE portable StableHLO
artifact. A consumer needs only ``jax.export.deserialize`` (or any XLA
runtime that ingests StableHLO) — no model code, no config system, no
parameter pytree.

Design notes:
- The artifact embeds the reference-parity affinity oracle
  (``ops/emb2aff.py`` roll+dot graph), NOT the Pallas kernel: exports are
  for portability across platforms/toolchains, and the Mosaic kernel is a
  runtime optimization tied to this toolchain (docs/PERF.md). The decode
  stack (mutex/waterz/multicut) is host-side C++ and stays outside the
  artifact, exactly as it sits outside the jit at serving time.
- The batch dimension is exported symbolically by default (one artifact
  serves any batch size); spatial dims are static, matching the padded
  serving shapes (CVPPP 544x544, BBBC 704-pad crops, 3D tiles
  (18,160,160) — reference provider_valid.py:157-186 semantics).
"""

from __future__ import annotations

import copy

import numpy as np

from ..config import Config


def make_serving_fn_2d(cfg: Config, variables):
    """Returns ``fn(image NHWC f32) -> (affs (B,C,H,W), mask_logits|None)``.

    Same math as the inference drivers (infer/inference2d.py): direct
    module forward, f32 embedding, relu'd multi-offset affinities
    (reference embedding2affs, scripts_cvppp/loss/loss_embedding_mse.py:
    58-66). ``mask_logits`` is present iff the preset trains the mask head
    (BBBC, train.mask_weight > 0).
    """
    import jax
    import jax.numpy as jnp

    from ..ops import embedding_to_affinity_2d, multi_offset
    from ..train.loop import build_model

    cfg = copy.deepcopy(cfg)
    cfg.model.s2d_train = False  # serving uses the direct graph
    model = build_model(cfg)
    offsets = tuple(map(tuple, multi_offset(list(cfg.data.shifts),
                                            neighbor=cfg.data.neighbor)))
    need_mask = bool(cfg.train.mask_weight)

    def fn(image):
        _, _, _, _, emb, pred_mask = model.apply(variables, image,
                                                 train=False)
        affs = jax.nn.relu(embedding_to_affinity_2d(
            emb.astype(jnp.float32), offsets))
        if need_mask:
            return affs, pred_mask
        return (affs,)

    return fn


def make_serving_fn_3d(cfg: Config, variables):
    """Returns ``fn(tiles (B,d,h,w,1) f32) -> (affs (B,12,d,h,w),)``.

    The per-tile predictor of the tiled engine (infer/inference3d.py):
    forward + 12-offset norm5 affinities (reference
    scripts_ac3ac4/loss/loss_embedding_mse.py:212-234). Gaussian-blend
    stitching stays outside the artifact (it is volume-geometry-specific;
    parallel/tiling.py runs it device-resident at serving time).
    """
    import jax
    import jax.numpy as jnp

    from ..ops import embedding_to_affinity_3d
    from ..ops.offsets import SHIFTS_3D
    from ..train.loop import build_model

    model = build_model(cfg)

    def fn(tiles):
        outs = model.apply(variables, tiles, train=False)
        emb = outs[-1] if isinstance(outs, (tuple, list)) else outs
        affs = jax.nn.relu(embedding_to_affinity_3d(
            emb.astype(jnp.float32), tuple(SHIFTS_3D)))
        return (affs,)

    return fn


def export_serving(fn, arg_shapes, arg_dtype=np.float32,
                   symbolic_batch: bool = True, platforms=None):
    """Export ``fn`` over the given arg shapes; returns ``jax.export.Exported``.

    ``arg_shapes``: one shape tuple per positional arg, batch dim first.
    ``symbolic_batch=True`` replaces each leading dim with one shared
    symbolic size ``b`` so a single artifact serves any batch size.
    ``platforms``: lowering platforms (default: the current backend).
    """
    import jax
    from jax import export as jexport

    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        arg_shapes = [(b,) + tuple(s[1:]) for s in arg_shapes]
    specs = [jax.ShapeDtypeStruct(tuple(s), arg_dtype) for s in arg_shapes]
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(jax.jit(fn), **kwargs)(*specs)


def save_artifact(exported, path: str) -> None:
    """Serialize an ``Exported`` to ``path`` (raw StableHLO bytes)."""
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_artifact(path: str):
    """Deserialize a saved artifact; returns the ``Exported`` (call via
    ``.call(*args)`` — runs under the current backend's XLA runtime)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    return jexport.deserialize(bytearray(blob))


def export_checkpoint(cfg: Config, variables, path: str,
                      hw=None, tile=(18, 160, 160),
                      symbolic_batch: bool = True, platforms=None):
    """One-call CLI surface: freeze ``variables`` under ``cfg`` to ``path``.

    2D presets export ``image (b,H,W,3) -> (affs[, mask_logits])`` at
    ``hw`` (default: the preset's padded serving shape); 3D presets export
    the tile predictor at ``tile``. Returns the ``Exported``.
    """
    if cfg.model.arch in ("unet_pni_deep", "unet3d_mala"):
        fn = make_serving_fn_3d(cfg, variables)
        shapes = [(1,) + tuple(tile) + (1,)]
    else:
        if hw is None:
            hw = (336, 688) if cfg.name == "bbbc039v1" else (544, 544)
        fn = make_serving_fn_2d(cfg, variables)
        shapes = [(1, hw[0], hw[1], cfg.model.input_nc)]
    exported = export_serving(fn, shapes, symbolic_batch=symbolic_batch,
                              platforms=platforms)
    save_artifact(exported, path)
    return exported
