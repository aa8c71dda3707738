"""Measure the jitted 2D train step on chip (device-GT path, scan-in-jit)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp

from pixel_embedded_affinity_tpu.config import load_config
from pixel_embedded_affinity_tpu.train.loop import build_model
from pixel_embedded_affinity_tpu.train.optim import make_optimizer
from pixel_embedded_affinity_tpu.train.train_step import (
    TrainState, make_train_step_2d)
from pixel_embedded_affinity_tpu.ops import multi_offset


def main():
    cfg = load_config("cvppp")
    model = build_model(cfg)
    tx = make_optimizer(base_lr=cfg.train.base_lr)
    offsets = multi_offset(list(cfg.data.shifts), neighbor=cfg.data.neighbor)
    B, H, W = cfg.train.batch_size, 544, 544
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    variables = jax.jit(functools.partial(model.init, train=True))(
        jax.random.PRNGKey(0), x[:1])
    params = variables["params"]
    state = TrainState(params=params, batch_stats=variables["batch_stats"],
                       opt_state=tx.init(params), step=jnp.int32(0))

    use_pallas = jax.devices()[0].platform == "tpu"
    step_fn = make_train_step_2d(
        model, tx, offsets, neighbor=cfg.data.neighbor,
        mask_weight=cfg.train.mask_weight, deep_weight=cfg.train.deep_weight,
        use_pallas=use_pallas, device_gt=True)

    batch = {"image": x,
             "ema_image": x,
             "rules": jnp.zeros((B, 3), jnp.int32),
             "seg": jnp.asarray(rng.integers(0, 8, (B, H, W)).astype(np.int32))}

    N = 10

    @jax.jit
    def run(state, eps):
        def body(st, e):
            b2 = dict(batch)
            b2["image"] = batch["image"] + e
            st, _, metrics = step_fn(st, b2)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, eps)
        return losses[-1]

    eps = jnp.zeros((N,), jnp.float32)
    print("compiling...", flush=True)
    float(run(state, eps))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(state, eps))
        best = min(best, (time.perf_counter() - t0) / N)
    mp = B * H * W / 1e6
    print(f"2D train step (B={B}, 544^2, dual-view, device-GT): "
          f"{best*1e3:.1f} ms/step = {mp/best:.1f} MP/s", flush=True)


if __name__ == "__main__":
    main()


def breakdown():
    cfg = load_config("cvppp")
    model = build_model(cfg)
    B, H, W = cfg.train.batch_size, 544, 544
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    variables = jax.jit(functools.partial(model.init, train=True))(
        jax.random.PRNGKey(0), x[:1])
    N = 10

    def bench(fn):
        @jax.jit
        def run(eps):
            def body(c, e):
                return c + fn(x + e), None
            s, _ = jax.lax.scan(body, jnp.float32(0), eps)
            return s
        eps = jnp.zeros((N,), jnp.float32)
        float(run(eps))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(eps))
            best = min(best, (time.perf_counter() - t0) / N)
        return best * 1e3

    def fwd_only(img):
        out, _ = model.apply(variables, img, train=True,
                             mutable=["batch_stats"])
        return out[4].astype(jnp.float32).sum()

    def fwd_bwd(img):
        def lf(p):
            out, _ = model.apply({"params": p,
                                  "batch_stats": variables["batch_stats"]},
                                 img, train=True, mutable=["batch_stats"])
            return sum(o.astype(jnp.float32).sum() for o in out)
        g = jax.grad(lf)(variables["params"])
        return sum(l.sum() for l in jax.tree_util.tree_leaves(g))

    print(f"fwd only (train mode, f32): {bench(fwd_only):.1f} ms")
    print(f"fwd+bwd  (train mode, f32): {bench(fwd_bwd):.1f} ms")

    from pixel_embedded_affinity_tpu.ops.affinity_jax import build_targets_2d_jax
    seg = jnp.asarray(rng.integers(0, 8, (B, H, W)).astype(np.int32))
    offsets = tuple(map(tuple, multi_offset(list(cfg.data.shifts),
                                            neighbor=cfg.data.neighbor)))
    def gt_only(img):
        affs, wmap, mask, downs = build_targets_2d_jax(seg, offsets, neighbor=4)
        return affs.sum() + wmap.sum() + img.sum()
    print(f"device-GT build:            {bench(gt_only):.1f} ms")


if False:
    breakdown()
