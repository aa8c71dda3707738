"""Jit-compiled training steps (2D and 3D pipelines).

One fused program per step: student forward + EMA-view forward (shared
weights, reference sharing_weights=True), per-sample EMA un-flip, deep
supervision at 4 scales, full-scale self loss + cross-view loss + optional
mask-head / consistency terms, grads, optimizer update.

Parallelism: the caller jits this with batch inputs sharded over the 'data'
mesh axis and params replicated; XLA inserts the grad all-reduce (DP). See
parallel/mesh.py.

Loss wiring parity: scripts_cvppp/main.py:266-310 (2D) and
scripts_ac3ac4/main.py:209-231 (3D).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..data.consistency import convert_consistency_flip_jax
from ..data.ac3ac4 import convert_consistency_flip_jax_3d_rule4


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def deep_weight_factors(deep_weight) -> list[float]:
    if deep_weight == 1:
        return [1.0, 1.0, 1.0, 1.0, 1.0]
    if deep_weight == 2:
        return [0.01, 0.03, 0.1, 0.3, 1.0]
    return [float(deep_weight), 1.0, 1.0, 1.0, 1.0]


def make_train_step_2d(model, tx, offsets, *, neighbor=4,
                       criterion=L.weighted_mse, affs0_weight=1.0,
                       deep_weight=1, self_emb=1.0, cross_emb=1.0,
                       mask_weight=0.0, ct_weight=0.0,
                       use_pallas=True, interpret=False, remat=False,
                       device_gt=False, loss_mode="affinity",
                       disc_weight=1.0, device_ema=False, ema_seed=0,
                       ema_noise=False, ema_blur=False,
                       ema_intensity=True, ema_mask=True, ema_flip=True,
                       imagenet_norm=True, fuse_loss=False):
    """``device_gt``: the batch carries only image/ema_image/seg/rules; GT
    affinities, weight maps, masks and pyramid targets are generated on
    device inside this jit (ops/affinity_jax.py) — ~12x less host->device
    traffic than shipping precomputed float targets.

    ``device_ema``: the batch carries no ema_image/rules either — the EMA
    view (intensity + mask patches + flips, data/device_aug.py) is generated
    in-jit from the clean image and a key folded with the step counter.
    ``imagenet_norm`` wraps the perturbations in denorm/renorm (the CVPPP
    provider normalizes; BBBC ships raw [0,1]).

    ``loss_mode='discriminative'``: adds ``disc_weight`` x the pull/push/reg
    discriminative loss on the final embedding (the paper's ResNet-50/101
    recipe; scripts_cvppp/loss/loss_discriminative.py:7-63)."""
    offsets = tuple(map(tuple, offsets))
    nb_half = neighbor // 2
    dwf = deep_weight_factors(deep_weight)

    def apply_model(params, batch_stats, image):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           image, train=True, mutable=["batch_stats"])

    apply_fn = jax.checkpoint(apply_model) if remat else apply_model

    def loss_fn(params, batch_stats, batch):
        if device_gt:
            from ..ops.affinity_jax import build_targets_2d_jax

            affs_t, wmap_t, mask_t, downs_t = build_targets_2d_jax(
                batch["seg"], offsets, neighbor=neighbor)
            batch = dict(batch, affs=affs_t, wmap=wmap_t, mask=mask_t,
                         **{f"down{k+1}": d for k, d in enumerate(downs_t)})
        (e1, e2, e3, e4, embedding, pred_mask), mut = apply_fn(
            params, batch_stats, batch["image"])
        (_, _, _, _, ema_embedding, _), mut = apply_fn(
            params, mut["batch_stats"], batch["ema_image"])

        # the reference detaches the un-flipped EMA view (gt.detach().clone()
        # in scripts_cvppp/data/data_consistency.py:36), so the cross loss
        # and the ct term only backprop through the student branch
        ema_embedding = jax.lax.stop_gradient(
            convert_consistency_flip_jax(ema_embedding, batch["rules"]))

        # deep supervision: model outputs e1(1/16)..e4(1/2) pair with
        # down4..down1 (reference emd1<->down1 at 1/2 scale)
        embeddings = [e4, e3, e2, e1]  # scales 1/2, 1/4, 1/8, 1/16
        downs = [batch["down1"], batch["down2"], batch["down3"],
                 batch["down4"]]
        deep_losses = []
        for k, (emb, down) in enumerate(zip(embeddings, downs)):
            n_off = nb_half * (4 - k)
            l, _ = L.embedding_loss_2d(
                emb, down[:, :n_off], down[:, n_off:2 * n_off],
                down[:, 2 * n_off:3 * n_off], offsets[:n_off],
                criterion=criterion, use_pallas=use_pallas,
                interpret=interpret, fuse_loss=fuse_loss)
            deep_losses.append(l)

        loss_embedding, pred = L.embedding_loss_2d(
            embedding, batch["affs"], batch["wmap"], batch["mask"], offsets,
            criterion=criterion, use_pallas=use_pallas, interpret=interpret,
            fuse_loss=fuse_loss)
        loss_cross, _ = L.ema_embedding_loss_2d(
            embedding, ema_embedding, batch["affs"], batch["wmap"],
            batch["mask"], offsets, criterion=criterion,
            affs0_weight=affs0_weight, use_pallas=use_pallas,
            interpret=interpret, fuse_loss=fuse_loss)

        loss_self = (loss_embedding * dwf[0]
                     + deep_losses[0] * dwf[1] + deep_losses[1] * dwf[2]
                     + deep_losses[2] * dwf[3] + deep_losses[3] * dwf[4])
        loss_cross_total = loss_cross * dwf[0] * cross_emb
        loss = loss_self * self_emb + loss_cross_total

        aux_losses = {}
        if loss_mode == "discriminative":
            from ..ops.losses_extra import discriminative_loss

            ld = discriminative_loss(embedding, batch["seg"])
            loss = loss + disc_weight * ld
            aux_losses["loss_disc"] = ld
        if mask_weight:
            lm = L.mask_head_loss(pred_mask, (batch["seg"] > 0))
            loss = loss + mask_weight * lm
            aux_losses["loss_mask"] = lm
        if ct_weight:
            lc = jnp.mean((embedding - ema_embedding) ** 2)
            loss = loss + ct_weight * lc
            aux_losses["loss_ct"] = lc

        metrics = {"loss": loss, "loss_embedding": loss_self * self_emb,
                   "loss_cross": loss_cross_total, **aux_losses}
        return loss, (mut["batch_stats"], jax.nn.relu(pred), metrics)

    def train_step(state: TrainState, batch):
        if device_ema:
            from ..data.device_aug import ema_view_2d
            from ..data.consistency import IMAGENET_MEAN, IMAGENET_STD

            key = jax.random.fold_in(jax.random.PRNGKey(ema_seed),
                                     state.step)
            img = batch["image"]
            if imagenet_norm:
                mean = jnp.asarray(IMAGENET_MEAN)
                std = jnp.asarray(IMAGENET_STD)
                img = img * std + mean
            ema, rules = ema_view_2d(img, (batch["seg"] > 0), key,
                                     noise=ema_noise, blur=ema_blur,
                                     intensity=ema_intensity,
                                     mask=ema_mask, flip=ema_flip)
            if imagenet_norm:
                ema = (ema - mean) / std
            batch = dict(batch, ema_image=ema, rules=rules)
        grads, (new_stats, pred, metrics) = jax.grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt,
                          state.step + 1), pred, metrics

    return train_step


def make_eval_step_2d(model, offsets, *, criterion=L.weighted_mse,
                      use_pallas=True, interpret=False):
    offsets = tuple(map(tuple, offsets))

    def eval_step(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        _, _, _, _, embedding, pred_mask = model.apply(
            variables, batch["image"], train=False)
        loss, pred = L.embedding_loss_2d(
            embedding, batch["affs"], batch["wmap"], batch["mask"], offsets,
            criterion=criterion, use_pallas=use_pallas, interpret=interpret)
        return loss, jax.nn.relu(pred), embedding, pred_mask

    return eval_step


def make_train_step_3d(model, tx, *, criterion=L.weighted_mse,
                       affs0_weight=1.0, embedding_mode=5,
                       shifts=(1, 1, 1, 2, 3, 3, 3, 9, 9, 4, 27, 27),
                       use_pallas=True, interpret=False, remat=False,
                       device_gt=False, device_ema=False, ema_seed=0,
                       ema_intensity=True, ema_mask=True, ema_flip=True):
    """3D step (scripts_ac3ac4/main.py:209-231): norm5 full-scale self +
    cross loss, norm1 deep supervision on 4 pyramid scales (emd1<->down4).

    ``device_gt``: the batch carries only image(+ema_image)/seg(/rules);
    the 12-channel affinities, per-channel weights and pyramid targets are
    built in-jit from the int labels (ops/affinity_jax.build_targets_3d_jax)
    — the single biggest host-CPU cost in the reference provider
    (data_provider_labeled_deep.py:224-263) moves onto the chip.
    ``device_ema``: the EMA view (intensity/cutout/flips) is generated
    in-jit too (data/device_aug.ema_view_3d); the host ships ONE image.

    Memory: the dual-view backward holds ~22 GB of activations for the
    default PNI config — beyond one v5e's HBM. The PNI model is therefore
    built with block-granular rematerialization (UNetPNIEmbeddingDeep
    remat=True); ``remat`` here additionally checkpoints the whole forward
    (rarely needed)."""

    def apply_model(params, batch_stats, image):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           image, train=True, mutable=["batch_stats"])

    apply_fn = jax.checkpoint(apply_model) if remat else apply_model

    def loss_fn(params, batch_stats, batch):
        if device_gt:
            from ..ops.affinity_jax import build_targets_3d_jax

            affs_t, wmap_t, downs_t = build_targets_3d_jax(batch["seg"])
            batch = dict(batch, affs=affs_t, wmap=wmap_t,
                         **{f"down{k+1}": d for k, d in enumerate(downs_t)})
        (e1, e2, e3, e4, embedding), mut = apply_fn(
            params, batch_stats, batch["image"])
        (_, _, _, _, ema_embedding), mut = apply_fn(
            params, mut["batch_stats"], batch["ema_image"])

        # detached teacher view, matching the reference's gt.detach().clone()
        # (scripts_ac3ac4/utils/consistency_aug.py:219)
        ema_embedding = jax.lax.stop_gradient(
            convert_consistency_flip_jax_3d_rule4(
                ema_embedding, batch["rules"]))

        if embedding_mode == 5:
            loss_emb, pred = L.embedding_loss_norm5(
                embedding, batch["affs"], batch["wmap"], criterion=criterion,
                affs0_weight=affs0_weight, shifts=shifts,
                use_pallas=use_pallas, interpret=interpret)
            loss_cross, _ = L.embedding_loss_norm5(
                embedding, batch["affs"], batch["wmap"], criterion=criterion,
                affs0_weight=affs0_weight, shifts=shifts,
                ema_embedding_bdhwc=ema_embedding, use_pallas=use_pallas,
                interpret=interpret)
        else:
            loss_emb, pred = L.embedding_loss_norm1(
                embedding, batch["affs"], batch["wmap"], criterion=criterion,
                affs0_weight=affs0_weight)
            loss_cross, _ = L.embedding_loss_norm1(
                embedding, batch["affs"], batch["wmap"], criterion=criterion,
                affs0_weight=affs0_weight,
                ema_embedding_bdhwc=ema_embedding)

        deep = 0.0
        # emd1 (1/16) <-> down4 ... emd4 (1/2) <-> down1
        for emb, key in zip([e1, e2, e3, e4],
                            ["down4", "down3", "down2", "down1"]):
            d = batch[key]
            l, _ = L.embedding_loss_norm1(emb, d[:, :3], d[:, 3:6],
                                          criterion=criterion,
                                          affs0_weight=affs0_weight)
            deep = deep + l

        loss = loss_emb + loss_cross + deep
        # boundary fill (main.py:233-236) then relu for the visual pred
        s = 1
        pred = pred.at[:, 1, :, :s, :].set(pred[:, 1, :, s:2 * s, :])
        pred = pred.at[:, 2, :, :, :s].set(pred[:, 2, :, :, s:2 * s])
        pred = pred.at[:, 0, :s, :, :].set(pred[:, 0, s:2 * s, :, :])
        metrics = {"loss": loss, "loss_embedding": loss_emb,
                   "loss_cross": loss_cross, "loss_deep": deep}
        return loss, (mut["batch_stats"], jax.nn.relu(pred), metrics)

    def train_step(state: TrainState, batch):
        if device_ema:
            from ..data.device_aug import ema_view_3d

            key = jax.random.fold_in(jax.random.PRNGKey(ema_seed),
                                     state.step)
            ema, rules = ema_view_3d(batch["image"], key,
                                     intensity=ema_intensity,
                                     mask=ema_mask, flip=ema_flip)
            batch = dict(batch, ema_image=ema, rules=rules)
        grads, (new_stats, pred, metrics) = jax.grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt,
                          state.step + 1), pred, metrics

    return train_step
