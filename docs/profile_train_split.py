"""Split-profile of the shipped 2D train step (VERDICT r3 #4).

Decomposes the dual-view s2d train step (B=2, 544^2, device GT — the
bench configuration) and bounds the candidate optimization "fuse the
WeightedMSE reductions into the Pallas affinity kernel forward+backward"
by A/B-ing the step against variants with the loss consumption removed:

  full        : shipped step (emb2aff kernels + per-offset WeightedMSE on
                affs/target/wmap/mask, deep supervision, EMA cross)
  sum_affs    : every criterion replaced by sum(raw affs) — the
                target/wmap/mask reads and the MSE math disappear (DCE),
                but the affinity tensors still materialize through the
                Pallas kernels fwd+bwd. full - sum_affs = the ENTIRE
                loss-consumption cost. A loss-fused kernel keeps the
                irreducible t/w/m reads, so its possible win is STRICTLY
                LESS than this delta.
  sum_emb     : affinity kernels removed too — loss = sum over raw head
                outputs. sum_affs - sum_emb = the affinity kernel
                subsystem (fwd+bwd, all 5 scales x 2 views).

All variants run fwd+bwd+optimizer on the same state (scan-in-jit, min of
reps — the only honest timing on the tunneled chip; see bench.py).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pixel_embedded_affinity_tpu.config import load_config
from pixel_embedded_affinity_tpu.data.consistency import (
    convert_consistency_flip_jax)
from pixel_embedded_affinity_tpu.ops import losses as L
from pixel_embedded_affinity_tpu.ops import multi_offset
from pixel_embedded_affinity_tpu.ops.affinity_jax import build_targets_2d_jax
from pixel_embedded_affinity_tpu.train.loop import build_model, init_state
from pixel_embedded_affinity_tpu.train.optim import make_optimizer
from pixel_embedded_affinity_tpu.train.train_step import (
    TrainState, make_train_step_2d)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    cfg = load_config("cvppp")
    on_tpu = jax.devices()[0].platform == "tpu"
    B, H, W = 2, 544, 544
    rng = np.random.default_rng(0)
    seg = np.zeros((B, H, W), np.int32)
    for bb in range(B):
        for i in range(12):
            cy, cx = rng.integers(40, H - 40), rng.integers(40, W - 40)
            yy, xx = np.mgrid[0:H, 0:W]
            seg[bb][(yy - cy) ** 2 + (xx - cx) ** 2 < 900] = i + 1
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "ema_image": jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32)),
        "seg": jnp.asarray(seg),
        "rules": jnp.asarray(rng.integers(0, 2, (B, 3)).astype(np.float32)),
    }
    offsets = tuple(map(tuple, multi_offset([1, 3, 5, 9, 27], neighbor=4)))

    model = build_model(cfg)  # s2d twin, as shipped
    tx = make_optimizer(1e-4)
    state0 = init_state(cfg, model, tx, {k: np.asarray(v)
                                         for k, v in batch.items()})

    def timed(step, K: int = 10, reps: int = 3):
        @jax.jit
        def multi(state, b):
            def body(s, _):
                s2, _, m = step(s, b)
                return s2, m["loss"]
            s_final, losses = jax.lax.scan(body, state, None, length=K)
            return s_final, losses[-1]

        st, last = multi(state0, batch)
        float(last)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            st, last = multi(st, batch)
            float(last)
            best = min(best, (time.perf_counter() - t0) / K)
        return best * 1e3

    def make_variant_step(variant: str):
        """Same graph as make_train_step_2d(device_gt=True) but with the
        loss consumption ablated (see module docstring)."""
        from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import (
            fused_affinity_2d, fused_cross_affinity_2d)
        from pixel_embedded_affinity_tpu.ops.emb2aff import (
            embedding_to_affinity_2d, cross_affinity_2d)

        def affs_of(emb, offs):
            if on_tpu:
                return fused_affinity_2d(emb, offs, 32, False)
            return embedding_to_affinity_2d(emb, offs, padding="valid")

        def cross_of(a, b, offs):
            if on_tpu:
                return fused_cross_affinity_2d(a, b, offs, 32, False)
            return cross_affinity_2d(a, b, offs)

        def loss_fn(params, batch_stats, b):
            affs_t, wmap_t, mask_t, downs_t = build_targets_2d_jax(
                b["seg"], offsets, neighbor=4)
            out, mut = model.apply({"params": params,
                                    "batch_stats": batch_stats},
                                   b["image"], train=True,
                                   mutable=["batch_stats"])
            e1, e2, e3, e4, embedding, pred_mask = out
            out2, mut = model.apply({"params": params,
                                     "batch_stats": mut["batch_stats"]},
                                    b["ema_image"], train=True,
                                    mutable=["batch_stats"])
            ema_embedding = jax.lax.stop_gradient(
                convert_consistency_flip_jax(out2[4], b["rules"]))
            if variant == "sum_emb":
                loss = sum(e.astype(jnp.float32).sum()
                           for e in (e1, e2, e3, e4, embedding))
                loss = loss + (embedding * ema_embedding).astype(
                    jnp.float32).sum()
                return loss, mut["batch_stats"]
            # sum_affs: all the affinity kernels, no criterion consumption
            loss = 0.0
            for k, emb in enumerate([e4, e3, e2, e1]):
                n_off = 2 * (4 - k)
                loss = loss + affs_of(emb, offsets[:n_off]).astype(
                    jnp.float32).sum()
            loss = loss + affs_of(embedding, offsets).astype(
                jnp.float32).sum()
            loss = loss + cross_of(embedding, ema_embedding, offsets).astype(
                jnp.float32).sum()
            return loss, mut["batch_stats"]

        def step(state, b):
            grads, new_stats = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, b)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            ns = TrainState(new_params, new_stats, new_opt, state.step + 1)
            return ns, None, {"loss": jnp.float32(0)}

        return step

    full_step = make_train_step_2d(model, tx, offsets, use_pallas=on_tpu,
                                   device_gt=True)
    full = timed(full_step)
    print(f"full step:      {full:.1f} ms")
    fused_step = make_train_step_2d(model, tx, offsets, use_pallas=on_tpu,
                                    device_gt=True, fuse_loss=True)
    fused = timed(fused_step)
    print(f"loss-FUSED step: {fused:.1f} ms  (delta {full - fused:+.1f} ms, "
          f"{100 * (full - fused) / full:.1f}%)")
    s_affs = timed(make_variant_step("sum_affs"))
    print(f"sum(affs) step: {s_affs:.1f} ms  (loss consumption = "
          f"{full - s_affs:.1f} ms)")
    s_emb = timed(make_variant_step("sum_emb"))
    print(f"sum(emb) step:  {s_emb:.1f} ms  (affinity kernels = "
          f"{s_affs - s_emb:.1f} ms)")
    print(f"-> loss-fusion ceiling: < {full - s_affs:.1f} ms of {full:.1f} "
          f"({100 * (full - s_affs) / full:.1f}%)")


if __name__ == "__main__":
    main()
