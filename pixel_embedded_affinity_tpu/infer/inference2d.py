"""2D inference driver (CVPPP / BBBC039V1).

Mirrors scripts_cvppp/inference.py / scripts_bbbc039v1/inference.py: load
checkpoint -> forward -> fused embedding->affinity -> mutex watershed (GT FG
mask for CVPPP; cleaned predicted mask for BBBC) -> merge_small -> relabel ->
metrics; writes seg/affs HDF5 and the CodaLab-format submission for CVPPP
test mode.
"""

from __future__ import annotations

import os

import numpy as np

from ..config import Config, resolve_compute_dtype
from ..ops import multi_offset
from ..ops.affinity_np import relabel
from ..postproc import seg_mutex, merge_func
from ..postproc.merge_small import remove_small_object
from ..metrics import (
    symmetric_best_dice, abs_diff_fg_labels, voi, adapted_rand_error,
    agg_jc_index, pixel_f1, get_fast_pq, remap_label,
)


def run_inference_2d(cfg: Config, variables, dataset, out_dir: str | None = None,
                     use_pallas: bool | None = None, save_h5: bool = False,
                     one_dispatch: bool | None = None,
                     timing: dict | None = None):
    """Returns per-image metric dict list + aggregate means.

    ``timing``: optional dict filled with the end-to-end COST TIME split
    (total / forward / decode / metrics seconds, n_images) mirroring the
    reference's whole-run COST TIME report
    (scripts_cvppp/inference.py:255-265) — but with the host-decode share
    separated, which the reference never measures.

    ``one_dispatch=True`` runs the WHOLE image set through the forward as a
    single jitted ``lax.scan`` and fetches the stacked affinities once,
    instead of one dispatch + one fetch per image. Exact same per-image
    math (decode metrics measured bit-identical); on a dispatch-latency-
    bound link (seconds per jit call on the tunneled chip, docs/PERF.md
    round 3) this removes N-1 round-trips — 12-image CVPPP CLI wall
    164 -> 83 s (1.97x). Software-pipelining dispatch against fetch is
    pathological on such links — a single dispatch is the safe
    amortization. Default (None): on for TPU, off on CPU. Falls back to
    the serial path when images are ragged-shaped or there is only one.
    """
    import jax

    from ..train.loop import build_model
    import copy

    # inference never trains, so always use the direct graph here (the
    # s2d training twin shares the exact parameter tree; the fast path
    # below covers TPU speed, and the direct module compiles much faster
    # on CPU)
    cfg_inf = copy.deepcopy(cfg)
    cfg_inf.model.s2d_train = False
    model = build_model(cfg_inf)
    offsets = multi_offset(list(cfg.data.shifts), neighbor=cfg.data.neighbor)
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    from ..ops import embedding_to_affinity_2d, affinity_2d_small_batch

    offsets_t = tuple(map(tuple, offsets))

    # s2d fast forward (exact math, ~1.2-1.3x on chip) when the shapes and
    # arch allow it; falls back to the Flax module otherwise. Every serving
    # forward below runs at B=1 (serial path: image[None]; one-dispatch
    # path: x1[None] inside the scan), so the graph is built for the
    # small-batch regime: the 1x1 embedding head applied at full
    # resolution (head_at_fullres) and the pure-XLA NCHW affinity
    # formulation instead of the Pallas kernel — at B=1 the mere presence
    # of a Mosaic custom call consuming the network output demotes the
    # high-res convs to a slow emitter (+3.7 ms of the 8.6 ms total;
    # docs/profile_b1_final.py: 8.65 -> 5.19 ms/img, exact parity).
    fast_fn = None
    if use_pallas and cfg.model.arch == "resunet2d_deep":
        try:
            from ..models.fast_forward import build_fast_resunet_forward
            import jax.numpy as jnp

            # follow the model's compute dtype so metrics match the
            # training-loop validation path bit-for-bit-ish
            fdt = (jnp.bfloat16 if resolve_compute_dtype(cfg.model) == "bfloat16"
                   else jnp.float32)
            fast_fn = build_fast_resunet_forward(variables, dtype=fdt)
        except Exception:  # unexpected param tree: use the module path
            fast_fn = None

    fast_packed_fn = None
    if fast_fn is not None:
        import jax.numpy as jnp

        fdt = (jnp.bfloat16 if resolve_compute_dtype(cfg.model) == "bfloat16"
               else jnp.float32)
        fast_packed_fn = build_fast_resunet_forward(variables, dtype=fdt,
                                                    input_format="s2d",
                                                    head_at_fullres=True)

    def _aff(embedding):
        if use_pallas:
            # B=1 serving: pure-XLA small-batch affinity (no custom call)
            affs = affinity_2d_small_batch(embedding, offsets_t)
        else:
            affs = embedding_to_affinity_2d(embedding, offsets_t)
        return jax.nn.relu(affs)

    @jax.jit
    def forward_fast(packed):
        # host-packed s2d image (models/fast_forward.py::pack_image_s2d):
        # the 42x-lane-padded NHWC image never materializes on device
        embedding, pred_mask = fast_packed_fn(packed)
        embedding = embedding.astype(jnp.float32)
        return _aff(embedding), embedding, pred_mask

    _q = {"fn": None}

    def forward_fast_int8(packed):
        # model.int8_infer, serial path: calibrate activation ranges on
        # the first image of the run (the one-dispatch default path uses
        # model.int8_calib_k images), then reuse the quantized forward
        # (ops/quant.py; ~8% on v5e at embedding cosine > 0.999 —
        # docs/PERF.md r3)
        if _q["fn"] is None:
            from ..models.fast_forward import (INT8_DEFAULT_SITES,
                                               calibrate_int8_ranges)

            ranges = calibrate_int8_ranges(
                variables, [packed], dtype=fdt, input_format="s2d",
                quantile=getattr(cfg.model, "int8_calib_pct", None))
            qfwd = build_fast_resunet_forward(
                variables, dtype=fdt, input_format="s2d",
                int8_sites=INT8_DEFAULT_SITES, act_ranges=ranges,
                head_at_fullres=True)

            @jax.jit
            def f(p):
                embedding, pred_mask = qfwd(p)
                embedding = embedding.astype(jnp.float32)
                return _aff(embedding), embedding, pred_mask

            _q["fn"] = f
        return _q["fn"](packed)

    @jax.jit
    def forward_slow(image):
        _, _, _, _, embedding, pred_mask = model.apply(variables, image,
                                                       train=False)
        return _aff(embedding), embedding, pred_mask

    def forward(image_np):
        if fast_packed_fn is not None and image_np.shape[1] % 16 == 0 \
                and image_np.shape[2] % 16 == 0:
            from ..models.fast_forward import pack_image_s2d

            fwd = (forward_fast_int8 if cfg.model.int8_infer
                   else forward_fast)
            return fwd(pack_image_s2d(image_np))
        return forward_slow(image_np)

    def _forward_all(samples):
        """One jitted lax.scan over the stacked image set; one fetch.
        Per-image math identical to ``forward`` (same forward graph, same
        fused affinity); only the dispatch pattern changes."""
        import jax.numpy as jnp

        need_mask = bool(cfg.train.mask_weight)
        imgs = np.stack([s["image"] for s in samples])
        use_fast = (fast_packed_fn is not None
                    and imgs.shape[1] % 16 == 0 and imgs.shape[2] % 16 == 0)
        if use_fast:
            from ..models.fast_forward import pack_image_s2d

            stack = jnp.asarray(pack_image_s2d(imgs)).astype(fdt)
            if cfg.model.int8_infer:
                from ..models.fast_forward import (INT8_DEFAULT_SITES,
                                                   calibrate_int8_ranges)

                # k-image calibration (one batch, statistic over all k)
                # with optional percentile clipping (model.int8_calib_pct)
                k = max(1, min(int(getattr(cfg.model, "int8_calib_k", 8)),
                               imgs.shape[0]))
                ranges = calibrate_int8_ranges(
                    variables, [pack_image_s2d(imgs[:k])], dtype=fdt,
                    input_format="s2d",
                    quantile=getattr(cfg.model, "int8_calib_pct", None))
                body_fwd = build_fast_resunet_forward(
                    variables, dtype=fdt, input_format="s2d",
                    int8_sites=INT8_DEFAULT_SITES, act_ranges=ranges,
                    head_at_fullres=True)
            else:
                body_fwd = fast_packed_fn

            def body_one(x1):
                emb, pm = body_fwd(x1)
                return _aff(emb.astype(jnp.float32)), pm
        else:
            stack = jnp.asarray(imgs)

            def body_one(x1):
                _, _, _, _, emb, pm = model.apply(variables, x1, train=False)
                return _aff(emb), pm

        @jax.jit
        def run_all(xs):
            def body(c, x1):
                affs, pm = body_one(x1[None])
                out = (affs[0], pm[0]) if need_mask else (affs[0],)
                return c, out
            _, outs = jax.lax.scan(body, 0, xs)
            return outs

        outs = run_all(stack)
        affs_all = np.asarray(outs[0])
        mask_all = np.asarray(outs[1]) if need_mask else None
        return affs_all, mask_all

    import time as _time

    t_start = _time.perf_counter()
    t_fwd = t_dec = t_met = 0.0
    if one_dispatch is None:
        one_dispatch = jax.devices()[0].platform == "tpu"
    pre_affs = pre_mask = None
    samples = None
    if one_dispatch and len(dataset) > 1:
        samples = [dataset[i] for i in range(len(dataset))]
        if len({s["image"].shape for s in samples}) == 1:
            t0 = _time.perf_counter()
            pre_affs, pre_mask = _forward_all(samples)
            t_fwd += _time.perf_counter() - t0
        else:  # ragged image shapes: per-image dispatch
            samples = None

    results = []
    segs = []
    all_affs = []
    for i in range(len(dataset)):
        s = samples[i] if samples is not None else dataset[i]
        if pre_affs is not None:
            out_affs = pre_affs[i]
            pred_mask_np = pre_mask[i] if pre_mask is not None else None
        else:
            t0 = _time.perf_counter()
            affs, embedding, pred_mask = forward(s["image"][None])
            out_affs = np.asarray(affs)[0]
            pred_mask_np = (np.asarray(pred_mask[0])
                            if cfg.train.mask_weight else None)
            t_fwd += _time.perf_counter() - t0
        gt = s["seg"].astype(np.uint16)
        t0 = _time.perf_counter()
        if cfg.train.mask_weight:
            # argmax(softmax(x)) == argmax(x): threshold the logits directly
            fg = (np.argmax(pred_mask_np, axis=-1) > 0).astype(np.uint8)
            fg = remove_small_object(fg, min_size=25)
        else:
            fg = (gt > 0).astype(np.uint8)
        seg = seg_mutex(out_affs, offsets=offsets,
                        strides=list(cfg.data.strides), mask=fg)
        seg = merge_func(seg.astype(np.uint16),
                         variant="bbbc" if cfg.train.mask_weight else "cvppp")
        seg = relabel(seg).astype(np.uint16)
        segs.append(seg)
        all_affs.append(out_affs)
        t_dec += _time.perf_counter() - t0

        t0 = _time.perf_counter()
        m = {"SBD": symmetric_best_dice(seg, gt),
             "DiC": abs_diff_fg_labels(seg, gt)}
        vs, vm = voi(gt, seg)
        m["VOI"] = vs + vm
        m["ARAND"] = adapted_rand_error(gt, seg)[0]
        if cfg.train.mask_weight:  # bbbc metric family
            gtr = remap_label(gt.astype(np.int64))
            pr = remap_label(seg.astype(np.int64))
            m["AJI"] = agg_jc_index(gtr, pr)
            m["F1"] = pixel_f1(gtr, pr)
            (dq, sq, pq), _ = get_fast_pq(gtr, pr)
            m.update({"DQ": dq, "SQ": sq, "PQ": pq})
        t_met += _time.perf_counter() - t0
        results.append(m)

    agg = {k: float(np.mean([r[k] for r in results]))
           for k in results[0]} if results else {}
    if timing is not None:
        timing.update(total_s=round(_time.perf_counter() - t_start, 3),
                      forward_s=round(t_fwd, 3), decode_s=round(t_dec, 3),
                      metrics_s=round(t_met, 3), n_images=len(dataset))
    if out_dir and save_h5:
        import h5py

        os.makedirs(out_dir, exist_ok=True)
        with h5py.File(os.path.join(out_dir, "seg.hdf"), "w") as f:
            f.create_dataset("main", data=np.stack(segs), compression="gzip")
        with h5py.File(os.path.join(out_dir, "affs.hdf"), "w") as f:
            f.create_dataset("main", data=np.stack(all_affs),
                             compression="gzip")
    return results, agg


def run_cvppp_test(cfg: Config, variables, dataset, out_path: str,
                   use_pallas: bool | None = None,
                   one_dispatch: bool | None = None,
                   timing: dict | None = None):
    """CVPPP test protocol: FG mask given, no labels; decode + write the
    CodaLab submission.h5 (inference.py:277-293). ``one_dispatch`` scans
    the whole test set through the forward in one jit (see
    run_inference_2d; default: on for TPU). ``timing``: COST TIME split
    (see run_inference_2d)."""
    import time as _time

    import jax

    from ..train.loop import build_model
    from ..ops import embedding_to_affinity_2d, affinity_2d_small_batch

    import copy

    cfg_inf = copy.deepcopy(cfg)
    cfg_inf.model.s2d_train = False
    model = build_model(cfg_inf)
    offsets = multi_offset(list(cfg.data.shifts), neighbor=cfg.data.neighbor)
    offsets_t = tuple(map(tuple, offsets))
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    # B=1 serving graph (see run_inference_2d): fullres-head fast forward
    # + pure-XLA small-batch affinity when the arch/shape allow it
    fast_packed_fn = None
    if use_pallas and cfg.model.arch == "resunet2d_deep":
        try:
            from ..models.fast_forward import build_fast_resunet_forward
            import jax.numpy as jnp

            fdt = (jnp.bfloat16 if resolve_compute_dtype(cfg.model) == "bfloat16"
                   else jnp.float32)
            fast_packed_fn = build_fast_resunet_forward(
                variables, dtype=fdt, input_format="s2d",
                head_at_fullres=True)
        except Exception:
            fast_packed_fn = None

    def _aff_of(embedding):
        if use_pallas:
            return jax.nn.relu(affinity_2d_small_batch(embedding, offsets_t))
        return jax.nn.relu(embedding_to_affinity_2d(embedding, offsets_t))

    @jax.jit
    def forward(image):
        _, _, _, _, embedding, _ = model.apply(variables, image, train=False)
        return _aff_of(embedding)

    @jax.jit
    def forward_fast(packed):
        import jax.numpy as jnp

        embedding, _ = fast_packed_fn(packed)
        return _aff_of(embedding.astype(jnp.float32))

    def forward_any(image_np):
        if fast_packed_fn is not None and image_np.shape[1] % 16 == 0 \
                and image_np.shape[2] % 16 == 0:
            from ..models.fast_forward import pack_image_s2d

            return forward_fast(pack_image_s2d(image_np))
        return forward(image_np)

    if one_dispatch is None:
        one_dispatch = jax.devices()[0].platform == "tpu"
    # materialize the set only for the one-dispatch scan; the serial path
    # streams one image at a time (the reference pattern)
    t_start = _time.perf_counter()
    t_fwd = t_dec = 0.0
    samples = None
    pre_affs = None
    if one_dispatch and len(dataset) > 1:
        samples = [dataset[i] for i in range(len(dataset))]
        if len({s["image"].shape for s in samples}) == 1:
            import jax.numpy as jnp

            imgs = np.stack([s["image"] for s in samples])
            use_fast = (fast_packed_fn is not None
                        and imgs.shape[1] % 16 == 0
                        and imgs.shape[2] % 16 == 0)
            if use_fast:
                from ..models.fast_forward import pack_image_s2d

                stack = jnp.asarray(pack_image_s2d(imgs)).astype(fdt)
                body_fwd = (lambda x1:
                            _aff_of(fast_packed_fn(x1)[0]
                                    .astype(jnp.float32)))
            else:
                stack = jnp.asarray(imgs)
                body_fwd = lambda x1: forward(x1)

            @jax.jit
            def run_all(xs):
                def body(c, x1):
                    return c, body_fwd(x1[None])[0]
                _, affs = jax.lax.scan(body, 0, xs)
                return affs

            t0 = _time.perf_counter()
            pre_affs = np.asarray(run_all(stack))
            t_fwd += _time.perf_counter() - t0

    segs, names = [], []
    for i in range(len(dataset)):
        s = samples[i] if samples is not None else dataset[i]
        if pre_affs is not None:
            affs = pre_affs[i]
        else:
            t0 = _time.perf_counter()
            affs = np.asarray(forward_any(s["image"][None]))[0]
            t_fwd += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        seg = seg_mutex(affs, offsets=offsets, strides=list(cfg.data.strides),
                        mask=s["fg"]).astype(np.uint16)
        seg = merge_func(seg)
        seg = relabel(seg).astype(np.uint16)
        t_dec += _time.perf_counter() - t0
        segs.append(seg)
        names.append(s["name"])
    write_cvppp_submission(segs, names, out_path,
                           pad=(7, 22) if cfg.data.padding else (0, 0))
    if timing is not None:
        timing.update(total_s=round(_time.perf_counter() - t_start, 3),
                      forward_s=round(t_fwd, 3), decode_s=round(t_dec, 3),
                      n_images=len(dataset))
    return segs, names


def write_cvppp_submission(segs: list[np.ndarray], names: list[str],
                           out_path: str, pad=(7, 22)):
    """CodaLab submission.h5: A1/plantXXX/label datasets, padding stripped."""
    import h5py

    with h5py.File(out_path, "w") as f:
        for seg, name in zip(segs, names):
            s = seg[pad[0]:-pad[0], pad[1]:-pad[1]] if pad[0] else seg
            f.create_dataset(f"A1/{name}/label", data=s.astype(np.uint8))
