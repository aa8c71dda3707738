"""Training driver: data -> sharded train step -> validation -> checkpoints.

Mirrors the reference loop structure (scripts_cvppp/main.py:170-459 /
scripts_ac3ac4/main.py:175-366) as one framework: per-iteration jitted step
(DP-sharded over the mesh), per-valid_freq instance decoding + metrics
(mutex watershed + SBD/DiC/VOI/ARAND for 2D; waterz/LMC VOI for 3D),
per-save_freq checkpoints, scalar logs (JSONL + optional tensorboardX).
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from ..config import Config
from ..models import (ResidualUNet2DDeep, UNetPNIEmbeddingDeep,
                      UNet3DMALADeep, ResNetEmbedding)
from ..ops import multi_offset
from ..ops import losses as L
from ..parallel import get_mesh, batch_sharding, replicated_sharding
from .optim import make_optimizer, make_schedule
from .train_step import (
    TrainState, make_train_step_2d, make_train_step_3d, make_eval_step_2d,
)
from .checkpoint import save_checkpoint, latest_checkpoint, load_checkpoint

log = logging.getLogger("pea")


def build_model(cfg: Config):
    import jax.numpy as jnp

    from ..config import resolve_compute_dtype

    dtype = (jnp.bfloat16 if resolve_compute_dtype(cfg.model) == "bfloat16"
             else jnp.float32)
    if cfg.model.arch == "resunet2d_deep":
        if getattr(cfg.model, "s2d_train", False):
            from ..models.resunet2d_s2d import ResidualUNet2DDeepS2D

            return ResidualUNet2DDeepS2D(out_channels=cfg.model.output_nc,
                                         nfeatures=tuple(cfg.model.filters),
                                         emd=cfg.model.emd, dtype=dtype)
        return ResidualUNet2DDeep(out_channels=cfg.model.output_nc,
                                  nfeatures=tuple(cfg.model.filters),
                                  emd=cfg.model.emd, dtype=dtype)
    if cfg.model.arch == "unet_pni_deep":
        # NOTE: an xy-s2d twin exists (models/unet3d_pni_s2d.py) but
        # measured 2.7x SLOWER on chip (907 vs 335 ms/step): under remat,
        # the 4x-FLOP block kernels cost more than the C28->C112 lane-
        # padding win saves. s2d_train therefore only affects the 2D arch.
        return UNetPNIEmbeddingDeep(filters=tuple(cfg.model.filters),
                                    emd=cfg.model.emd, dtype=dtype,
                                    remat=True)
    if cfg.model.arch == "unet3d_mala":
        return UNet3DMALADeep(emd=cfg.model.emd, dtype=dtype)
    if cfg.model.arch in ("resnet50_embedding", "resnet101_embedding"):
        return ResNetEmbedding(depth=50 if "50" in cfg.model.arch else 101,
                               emd=cfg.model.emd,
                               out_channels=cfg.model.output_nc, dtype=dtype)
    raise ValueError(cfg.model.arch)


def build_dataset(cfg: Config):
    if cfg.data.dataset == "cvppp":
        from ..data.cvppp import CVPPPTrain, CVPPPValidation

        train = CVPPPTrain(cfg.data.data_folder, size=cfg.data.size,
                           shifts=tuple(cfg.data.shifts),
                           neighbor=cfg.data.neighbor,
                           padding=cfg.data.padding,
                           separate_weight=cfg.data.separate_weight,
                           valid_set=cfg.data.valid_set,
                           ema_noise=cfg.data.if_ema_noise,
                           ema_blur=cfg.data.if_ema_blur,
                           ema_intensity=cfg.data.if_ema_intensity,
                           ema_mask=cfg.data.if_ema_mask,
                           ema_flip=cfg.data.if_ema_flip,
                           light=cfg.data.device_gt,
                           device_ema=cfg.data.device_ema,
                           seed=cfg.train.random_seed)
        valid = CVPPPValidation(cfg.data.data_folder,
                                shifts=tuple(cfg.data.shifts),
                                neighbor=cfg.data.neighbor,
                                valid_set=cfg.data.valid_set)
        return train, valid
    if cfg.data.dataset == "bbbc039v1":
        from ..data.bbbc import BBBCTrain, BBBCValidation

        train = BBBCTrain(cfg.data.data_folder, size=cfg.data.size,
                          padding=cfg.data.bbbc_padding,
                          shifts=tuple(cfg.data.shifts),
                          neighbor=cfg.data.neighbor,
                          light=cfg.data.device_gt,
                          device_ema=cfg.data.device_ema,
                          seed=cfg.train.random_seed)
        valid = BBBCValidation(cfg.data.data_folder,
                               shifts=tuple(cfg.data.shifts),
                               neighbor=cfg.data.neighbor)
        return train, valid
    if cfg.data.dataset == "ac3ac4":
        from ..data.ac3ac4 import AC3AC4Train, AC3AC4ValidVolume

        train = AC3AC4Train(cfg.data.data_folder,
                            dataset_name=cfg.data.dataset_name,
                            train_split=cfg.data.train_split,
                            crop_size=tuple(cfg.data.crop_size),
                            padding=cfg.data.padding_3d,
                            light=cfg.data.device_gt,
                            device_ema=cfg.data.device_ema,
                            seed=cfg.train.random_seed)
        valid = AC3AC4ValidVolume(cfg.data.data_folder,
                                  dataset_name=cfg.data.dataset_name,
                                  mode="valid")
        return train, valid
    raise ValueError(cfg.data.dataset)


class ScalarLogger:
    def __init__(self, record_path):
        os.makedirs(record_path, exist_ok=True)
        self.f = open(os.path.join(record_path, "scalars.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self.tb = SummaryWriter(record_path)
        except Exception:
            self.tb = None

    def add(self, step, **scalars):
        self.f.write(json.dumps({"step": step, **scalars}) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)
        # reference-style plain-text appenders (loss.txt / valid.txt,
        # scripts_cvppp/main.py:171-172)
        is_valid = any(k.startswith("valid") for k in scalars)
        fname = "valid.txt" if is_valid else "loss.txt"
        with open(os.path.join(os.path.dirname(self.f.name), fname), "a") as f:
            parts = ", ".join(f"{k} = {v:.6f}" for k, v in scalars.items())
            f.write(f"step = {step}, {parts}\n")


def init_state(cfg: Config, model, tx, sample_batch):
    import functools

    import jax

    rng = jax.random.PRNGKey(cfg.train.random_seed)
    # jitted init: one compile instead of per-op eager dispatch (the tunneled
    # TPU backend remote-compiles every eager op)
    variables = jax.jit(functools.partial(model.init, train=False))(
        rng, sample_batch["image"][:1])
    variables = jax.device_get(variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    import jax.numpy as jnp

    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))


def validate_2d(cfg: Config, eval_step, state, valid_dataset, offsets,
                iters: int = 0, show_dir: str | None = None):
    """Decode + metrics over the validation set (2D pipelines)."""
    from ..postproc import seg_mutex, merge_func
    from ..ops.affinity_np import relabel
    from ..metrics import (symmetric_best_dice, abs_diff_fg_labels, voi,
                           adapted_rand_error)
    from ..postproc.merge_small import remove_small_object
    import jax

    losses, dices, diffs, vois, arands = [], [], [], [], []
    ajis, f1s, pqs = [], [], []
    for i in range(len(valid_dataset)):
        s = valid_dataset[i]
        batch = {k: v[None] for k, v in s.items()}
        loss, pred, embedding, pred_mask = eval_step(state.params,
                                                     state.batch_stats, batch)
        if cfg.train.mask_weight:  # reference valid loss includes the mask term
            from ..ops.losses import mask_head_loss

            loss = float(loss) + cfg.train.mask_weight * float(
                mask_head_loss(pred_mask, batch["seg"] > 0))
        out_affs = np.asarray(pred)[0]
        gt = s["seg"].astype(np.uint16)
        if cfg.train.mask_weight:  # bbbc: predicted FG mask seeds the decode
            pm = np.asarray(jax.nn.softmax(pred_mask[0], axis=-1))
            fg = (np.argmax(pm, axis=-1) > 0).astype(np.uint8)
            fg = remove_small_object(fg, min_size=25)
        else:
            fg = (gt > 0).astype(np.uint8)
        seg = seg_mutex(out_affs, offsets=offsets,
                        strides=list(cfg.data.strides), mask=fg).astype(
                            np.uint16)
        seg = merge_func(seg,
                         variant="bbbc" if cfg.train.mask_weight else "cvppp")
        seg = relabel(seg).astype(np.uint16)
        losses.append(float(loss))
        dices.append(symmetric_best_dice(seg, gt))
        diffs.append(abs_diff_fg_labels(seg, gt))
        vs, vm = voi(gt, seg)
        vois.append(vs + vm)
        arands.append(adapted_rand_error(gt, seg)[0])
        if cfg.train.mask_weight:
            # the reference's BBBC validation reports the AJI family
            # (scripts_bbbc039v1/main.py:369-434), not SBD
            from ..metrics import agg_jc_index, pixel_f1, get_fast_pq, \
                remap_label

            gtr = remap_label(gt.astype(np.int64))
            pr = remap_label(seg.astype(np.int64))
            if pr.max() == 0 or gtr.max() == 0:
                ajis.append(0.0); f1s.append(0.0); pqs.append(0.0)
            else:
                ajis.append(float(agg_jc_index(gtr, pr)))
                f1s.append(float(pixel_f1(gtr, pr)))
                pqs.append(float(get_fast_pq(gtr, pr)[0][2]))
        if i == 0 and show_dir is not None:
            from ..utils.show import val_show

            val_show(iters, out_affs[-1], s["affs"][-1], seg, gt, show_dir)
    out = {"valid/loss": float(np.mean(losses)),
           "valid/SBD": float(np.mean(dices)),
           "valid/DiC": float(np.mean(diffs)),
           "valid/VOI": float(np.mean(vois)),
           "valid/ARAND": float(np.mean(arands))}
    if ajis:
        out.update({"valid/AJI": float(np.mean(ajis)),
                    "valid/F1": float(np.mean(f1s)),
                    "valid/PQ": float(np.mean(pqs))})
    return out


def validate_3d(cfg: Config, model, state, valid_volume, iters: int = 0,
                decoders=("waterz",), crop_size=(18, 160, 160),
                stride=(10, 80, 80), padding=(4, 48, 48)):
    """Full-volume tiled validation (scripts_ac3ac4/main.py:276-366): tiled
    forward -> stitch -> decode -> VOI/ARAND, plus affinity MSE/BCE."""
    from ..infer.inference3d import run_inference_3d
    from ..ops.affinity_np import seg_to_aff_3d_12ch

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    affs, results = run_inference_3d(
        cfg, variables, valid_volume.raw, gt=valid_volume.label,
        decoders=decoders, crop_size=crop_size, stride=stride,
        padding=padding)
    out = {}
    for dec, (seg, m) in results.items():
        for k, v in m.items():
            out[f"valid/{dec}_{k}"] = float(v)
    gt_affs = seg_to_aff_3d_12ch(valid_volume.label)
    diff = affs - gt_affs
    out["valid/affs_mse"] = float(np.mean(diff ** 2))
    p = np.clip(affs, 1e-6, 1 - 1e-6)
    out["valid/affs_bce"] = float(np.mean(
        -(gt_affs * np.log(p) + (1 - gt_affs) * np.log(1 - p))))
    return out


def train(cfg: Config, max_iters: int | None = None, data_override=None,
          interpret: bool = False, log_dir: str | None = None):
    """Run training; returns the final state (and metrics history)."""
    import jax

    total_iters = max_iters or cfg.train.total_iters
    # use the largest device count that divides the batch (the reference
    # DataParallel refused non-divisible batches; we shrink the mesh instead)
    devices = jax.devices()
    n_use = len(devices)
    while cfg.train.batch_size % n_use:
        n_use -= 1
    mesh = get_mesh(devices[:n_use])
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)

    model = build_model(cfg)
    if data_override is not None:
        train_ds, valid_ds = data_override
    else:
        train_ds, valid_ds = build_dataset(cfg)

    # HBM-resident dataset mode: the whole training set is uploaded once;
    # sampling/aug/normalization run inside the train jit
    # (data/device_data.py). No host sampler processes, no per-step
    # host->device batch transfer. Supported: CVPPP ('xiaoyu' chain) and
    # AC3/AC4 (full _augs_mix), single-host.
    dr_ok = (cfg.data.dataset == "cvppp"
             and getattr(cfg.data, "aug_mode", "xiaoyu") == "xiaoyu") \
        or cfg.data.dataset in ("ac3ac4", "bbbc039v1")
    use_dr = (getattr(cfg.data, "device_resident", False) and dr_ok
              and cfg.data.device_gt and cfg.data.device_ema
              and data_override is None
              and jax.process_count() == 1)
    if getattr(cfg.data, "device_resident", False) and not use_dr:
        log.info("device_resident requested but unsupported for this config "
                 "(needs cvppp 'xiaoyu' or ac3ac4, device_gt + device_ema, "
                 "single-host); using the host sampler")

    from ..data.provider import Provider

    if use_dr:
        if cfg.data.dataset == "cvppp":
            from ..data.device_data import load_cvppp_arrays

            dr_images, dr_labels = load_cvppp_arrays(
                cfg.data.data_folder, valid_set=cfg.data.valid_set,
                padding=cfg.data.padding)
            batch0 = {"image": np.zeros(
                          (cfg.train.batch_size, cfg.data.size,
                           cfg.data.size, 3), np.float32),
                      "seg": np.zeros(
                          (cfg.train.batch_size, cfg.data.size,
                           cfg.data.size), np.int32)}
        elif cfg.data.dataset == "bbbc039v1":
            from ..data.device_data import load_bbbc_arrays

            dr_images, dr_labels = load_bbbc_arrays(
                cfg.data.data_folder, padding=cfg.data.bbbc_padding)
            batch0 = {"image": np.zeros(
                          (cfg.train.batch_size, cfg.data.size,
                           cfg.data.size, 3), np.float32),
                      "seg": np.zeros(
                          (cfg.train.batch_size, cfg.data.size,
                           cfg.data.size), np.int32)}
        else:
            from ..data.device_data import load_ac3ac4_arrays

            cz, cy, cx = cfg.data.crop_size
            dr_images, dr_labels = load_ac3ac4_arrays(
                cfg.data.data_folder, dataset_name=cfg.data.dataset_name,
                train_split=cfg.data.train_split, crop_z=cz)
            batch0 = {"image": np.zeros(
                          (cfg.train.batch_size, cz, cy, cx, 1),
                          np.float32),
                      "seg": np.zeros(
                          (cfg.train.batch_size, cz, cy, cx), np.int32)}
        log.info("device-resident dataset: %s images + %s labels = %.1f MB",
                 dr_images.shape, dr_labels.dtype,
                 (dr_images.nbytes + dr_labels.nbytes) / 1e6)
        provider = None
    else:
        provider = Provider(train_ds, batch_size=cfg.train.batch_size,
                            num_workers=cfg.train.num_workers,
                            seed=cfg.train.random_seed)

    # 'cosine' in the reference as-shipped runs at constant base_lr (the
    # cosine branch is commented out, scripts_cvppp/main.py:247-257)
    if cfg.train.lr_mode in ("fixed", "cosine"):
        schedule = None
    else:
        schedule = make_schedule(
            cfg.train.lr_mode,
            cfg.train.base_lr, cfg.train.end_lr, cfg.train.total_iters,
            cfg.train.warmup_iters, cfg.train.decay_iters, cfg.train.power)
    tx = make_optimizer(cfg.train.base_lr, eps=0.01,
                        weight_decay=cfg.train.weight_decay or 0.0,
                        amsgrad=True, opt_type=cfg.train.opt_type,
                        schedule=schedule)

    if not use_dr:
        batch0 = provider.next()
    state = init_state(cfg, model, tx, batch0)

    save_path = os.path.join(cfg.save_path, cfg.name)
    if cfg.train.resume:
        ck = latest_checkpoint(save_path)
        if ck:
            import flax.serialization as ser

            restored = load_checkpoint(ck)
            opt_state = state.opt_state
            if "opt_state" in restored:
                # exact resume: rebuild the optax pytree (Adam moments,
                # schedule count) from the checkpointed state dict
                try:
                    opt_state = ser.from_state_dict(state.opt_state,
                                                    restored["opt_state"])
                except Exception as e:  # incompatible optimizer config
                    log.warning("checkpoint opt_state incompatible (%s); "
                                "falling back to fresh optimizer state", e)
            state = TrainState(restored["params"], restored["batch_stats"],
                               opt_state, restored["step"])
            log.info("resumed from %s", ck)

    criterion = L.CRITERIA[cfg.train.loss_func]
    offsets = multi_offset(list(cfg.data.shifts), neighbor=cfg.data.neighbor)
    is_3d = cfg.model.arch in ("unet_pni_deep", "unet3d_mala")
    if is_3d:
        step_fn = make_train_step_3d(
            model, tx, criterion=criterion,
            affs0_weight=cfg.train.affs0_weight,
            embedding_mode=cfg.train.embedding_mode,
            use_pallas=cfg.train.use_pallas, interpret=interpret,
            device_gt=cfg.data.device_gt, device_ema=cfg.data.device_ema,
            ema_seed=cfg.train.random_seed,
            ema_intensity=cfg.data.if_ema_intensity,
            ema_mask=cfg.data.if_ema_mask, ema_flip=cfg.data.if_ema_flip)
    else:
        step_fn = make_train_step_2d(
            model, tx, offsets, neighbor=cfg.data.neighbor,
            criterion=criterion, affs0_weight=cfg.train.affs0_weight,
            deep_weight=cfg.train.deep_weight, self_emb=cfg.train.self_emb,
            cross_emb=cfg.train.cross_emb, mask_weight=cfg.train.mask_weight,
            ct_weight=cfg.train.ct_weight, use_pallas=cfg.train.use_pallas,
            interpret=interpret, device_gt=cfg.data.device_gt,
            loss_mode=cfg.train.loss_mode, disc_weight=cfg.train.disc_weight,
            device_ema=cfg.data.device_ema, ema_seed=cfg.train.random_seed,
            ema_noise=cfg.data.if_ema_noise, ema_blur=cfg.data.if_ema_blur,
            ema_intensity=cfg.data.if_ema_intensity,
            ema_mask=cfg.data.if_ema_mask, ema_flip=cfg.data.if_ema_flip,
            imagenet_norm=(cfg.data.dataset == "cvppp"),
            fuse_loss=cfg.train.fuse_loss)

    if jax.process_count() > 1:
        # multi-host: the replicated state must become global arrays before
        # the first jit call (plain numpy can't target non-addressable
        # devices); every process holds identical values by construction
        from ..parallel.multihost import to_global

        state = jax.tree_util.tree_map(
            lambda x: to_global(np.asarray(x), rsh), state)

    batch_shardings = {k: bsh for k in batch0}
    jit_step = jax.jit(step_fn,
                       in_shardings=(rsh, batch_shardings),
                       donate_argnums=(0,))

    # multi-step dispatch: S chained steps per jit call (fixed per-dispatch
    # link latency amortizes S-fold; the scan body is the same step_fn)
    S = max(1, int(getattr(cfg.train, "steps_per_call", 1)))
    jit_multi = None
    if S > 1 and not use_dr:
        from jax.sharding import NamedSharding, PartitionSpec as P

        stacked_sh = NamedSharding(mesh, P(None, "data"))

        def multi_fn(state, batches):
            def body(s, b):
                s2, _, m = step_fn(s, b)
                return s2, m["loss"]
            return jax.lax.scan(body, state, batches)

        jit_multi = jax.jit(
            multi_fn,
            in_shardings=(rsh, {k: stacked_sh for k in batch0}),
            donate_argnums=(0,))

    jit_dr = jit_dr1 = None
    dr_images_d = dr_labels_d = None
    if use_dr:
        import jax.numpy as jnp

        from ..data.device_data import (sample_ac3ac4_batch,
                                        sample_cvppp_batch)

        dr_images_d = jax.device_put(jnp.asarray(dr_images), rsh)
        dr_labels_d = jax.device_put(jnp.asarray(dr_labels), rsh)
        # distinct stream from the in-jit EMA key (both fold the step)
        dr_key = jax.random.fold_in(
            jax.random.PRNGKey(cfg.train.random_seed), 55991)
        B_, out_ = cfg.train.batch_size, cfg.data.size

        if cfg.data.dataset == "cvppp":
            def dr_sample(images, labels, key):
                return sample_cvppp_batch(images, labels, key, B_, out=out_)
        elif cfg.data.dataset == "bbbc039v1":
            from ..data.device_data import sample_bbbc_batch

            bpad_ = cfg.data.bbbc_padding

            def dr_sample(images, labels, key):
                return sample_bbbc_batch(images, labels, key, B_,
                                         size=out_, padding=bpad_)
        else:
            crop_, pad_ = tuple(cfg.data.crop_size), cfg.data.padding_3d

            def dr_sample(images, labels, key):
                return sample_ac3ac4_batch(images, labels, key, B_,
                                           crop_size=crop_, padding=pad_)

        def make_dr(length):
            def fn(st, images, labels):
                def body(s, _):
                    key = jax.random.fold_in(dr_key, s.step)
                    b = dr_sample(images, labels, key)
                    b = {k: jax.lax.with_sharding_constraint(v, bsh)
                         for k, v in b.items()}
                    s2, _, m = step_fn(s, b)
                    return s2, m["loss"]
                return jax.lax.scan(body, st, None, length=length)
            return jax.jit(fn, in_shardings=(rsh, rsh, rsh),
                           donate_argnums=(0,))

        jit_dr = make_dr(S)
        jit_dr1 = make_dr(1) if S > 1 else jit_dr
    eval_step = None
    if not is_3d:
        eval_step = jax.jit(make_eval_step_2d(
            model, offsets, criterion=criterion,
            use_pallas=cfg.train.use_pallas, interpret=interpret))

    logger = ScalarLogger(log_dir or os.path.join(save_path, "log"))
    from ..utils.guards import LossWatchdog
    from ..data.provider import device_prefetch

    watchdog = LossWatchdog(save_dir=save_path)
    history = []
    sum_loss = 0.0
    t_start = time.time()
    it = int(state.step)

    # double-buffered host->device prefetch: the next batch's transfer
    # overlaps the current step's compute (the reference's async
    # DataLoader+.cuda() equivalent, scripts_cvppp/main.py:227-238)
    def _batches():
        yield batch0
        while True:
            yield provider.next()

    # round event freqs up to multiples of S so events land on call
    # boundaries (locals — never mutate the caller's cfg)
    def _round_up(v):
        return ((v + S - 1) // S) * S if S > 1 else v

    display_freq = _round_up(cfg.train.display_freq)
    valid_freq = _round_up(cfg.train.valid_freq)
    save_freq = _round_up(cfg.train.save_freq)

    batch_iter = None
    if not use_dr:
        if S > 1:
            # stack S batches per dispatch
            def _stacked():
                first = [batch0] + [provider.next() for _ in range(S - 1)]
                yield {k: np.stack([b[k] for b in first]) for k in batch0}
                while True:
                    chunk = [provider.next() for _ in range(S)]
                    yield {k: np.stack([b[k] for b in chunk]) for k in batch0}

            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_iter = device_prefetch(
                _stacked(), sharding=NamedSharding(mesh, P(None, "data")))
        else:
            batch_iter = device_prefetch(_batches(), sharding=bsh)

    # losses are fetched lazily (at display/valid points) so the host never
    # blocks on the device per step; `pending` holds tiny device scalars
    pending: list = []
    tail_chunk, tail_idx = None, 0

    def _drain():
        nonlocal sum_loss
        if not pending:
            return
        # entries are scalars (single-step) or (S,) vectors (multi-step)
        vals = []
        for v in jax.device_get(pending):
            vals.extend(np.atleast_1d(np.asarray(v)).tolist())
        first_step = it - len(vals) + 1
        for j, lv in enumerate(vals):
            watchdog.check(float(lv), state=None, step=first_step + j)
            sum_loss += float(lv)
        pending.clear()

    while it < total_iters:
        if use_dr:
            n = S if total_iters - it >= S else 1
            state, losses = (jit_dr if n == S else jit_dr1)(
                state, dr_images_d, dr_labels_d)
            it += n
            pending.append(losses)  # (n,) device vector, fetched at drain
        elif S > 1 and total_iters - it >= S:
            batch = next(batch_iter)
            state, losses = jit_multi(state, batch)
            it += S
            pending.append(losses)  # (S,) device vector, fetched at drain
        else:
            if S > 1:
                # tail (< S steps left): one stacked chunk serves ALL tail
                # steps, one element per step — no discarded batches
                if tail_chunk is None:
                    tail_chunk, tail_idx = next(batch_iter), 0
                batch = {k: v[tail_idx] for k, v in tail_chunk.items()}
                tail_idx += 1
            else:
                batch = next(batch_iter)
            state, pred, metrics = jit_step(state, batch)
            it += 1
            pending.append(metrics["loss"])

        def _hit(freq):  # robust to S-strided iteration counts
            return it % freq < (S if S > 1 else 1)

        if _hit(display_freq) or it <= S:
            _drain()
            dt = time.time() - t_start
            avg = sum_loss / (display_freq if it > S
                              else max(it, 1))
            log.info("step %d, loss=%.6f (%.2f s)", it, avg, dt)
            logger.add(it, loss=avg, sec_per_iter=dt / max(it, 1))
            sum_loss = 0.0
        if cfg.train.if_valid and valid_ds is not None \
                and _hit(valid_freq) and it > S:
            _drain()
            if is_3d:
                cz, cy, cx = cfg.data.crop_size
                # reference geometry: stride = (cz-8, cy/2, cx/2),
                # pad = (4, 48, 48) at (18, 160, 160); scale for small crops
                m = validate_3d(cfg, model, state, valid_ds, iters=it,
                                decoders=tuple(cfg.train.valid_decoders),
                                crop_size=(cz, cy, cx),
                                stride=(max(cz - 8, 1), cy // 2, cx // 2),
                                padding=(min(4, cz // 4), min(48, cy // 4),
                                         min(48, cx // 4)))
            elif eval_step is not None and len(valid_ds) > 0:
                m = validate_2d(cfg, eval_step, state, valid_ds, offsets,
                                iters=it,
                                show_dir=os.path.join(save_path, "valid"))
            else:
                m = None
            if m:
                log.info("valid @%d: %s", it, m)
                logger.add(it, **m)
                history.append({"step": it, **m})
        if (_hit(save_freq) and it > S) or it >= total_iters:
            _drain()
            if jax.process_index() == 0:  # single writer under multi-host
                save_checkpoint(save_path, state, it)
    _drain()
    if provider is not None:
        provider.close()
    return state, history
