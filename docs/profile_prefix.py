"""Prefix profiling of the fast forward (in-context marginal costs).

Builds truncated variants of models/fast_forward.py's forward by stopping
at successive stages; marginal deltas locate in-context hotspots (isolated
per-op timings mislead — see docs/PERF.md methodology notes).
"""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn

from pixel_embedded_affinity_tpu.models import ResidualUNet2DDeep
from pixel_embedded_affinity_tpu.models import fast_forward as ff
from pixel_embedded_affinity_tpu.ops.s2d import space_to_depth, depth_to_space
from pixel_embedded_affinity_tpu.models.common import (
    upsample_align_corners, replication_pad_to)
from pixel_embedded_affinity_tpu.ops import multi_offset
from pixel_embedded_affinity_tpu.ops.emb2aff_pallas import fused_affinity_2d

N = 20


def bench(fn, *args, reps=3):
    @jax.jit
    def run(eps, *a):
        def body(c, e):
            out = fn(*(x + e if i == 0 else x for i, x in enumerate(a)))
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(l.astype(jnp.float32).sum() for l in leaves
                    if l is not None)
            return c + s, None
        s, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return s
    eps = jnp.zeros((N,), args[0].dtype)
    float(run(eps, *args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(eps, *args))
        best = min(best, (time.perf_counter() - t0) / N)
    return best


def main():
    B, H, W = 8, 544, 544
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, H, W, 3)).astype(np.float32))
    model = ResidualUNet2DDeep(out_channels=2,
                               nfeatures=(16, 32, 64, 128, 256),
                               emd=16, dtype=dt)
    variables = jax.jit(functools.partial(model.init, train=False))(rng,
                                                                    x[:1])
    offsets = tuple(map(tuple, multi_offset([1, 3, 5, 9, 27], neighbor=4)))

    params = variables["params"]
    stats = variables["batch_stats"]

    def blk(scope, s2d, split_at=None):
        return ff._BlockW(params[scope]["block"] if "block" in params[scope]
                          else params[scope],
                          stats[scope]["block"] if "block" in stats[scope]
                          else stats[scope], dt, s2d, split_at=split_at)

    b_in = blk("inconv", s2d="dense")
    b_d1 = blk("down1", s2d="dense")
    b_d2 = blk("down2", s2d="2x2")
    b_d3 = blk("down3", s2d=False)
    b_d4 = blk("down4", s2d=False)
    b_u1 = blk("up1", s2d=False)
    b_u2 = blk("up2", s2d=False, split_at=256)
    b_u3 = blk("up3", s2d="2x2", split_at=128)
    b_u4 = blk("up4", s2d="dense", split_at=64)

    fwd_full = ff.build_fast_resunet_forward(variables, dtype=dt,
                                             input_format="s2d")
    from pixel_embedded_affinity_tpu.models.fast_forward import pack_image_s2d
    xp = jnp.asarray(pack_image_s2d(np.asarray(x))).astype(dt)

    def forward(packed, stop):
        xs = packed
        x1s = b_in(xs)
        if stop == "inconv":
            return x1s
        d1 = b_d1(x1s)
        if stop == "down1":
            return d1
        x2 = ff._pool_s2d_to_direct(d1)
        x2s = space_to_depth(x2)
        d2 = b_d2(x2s)
        if stop == "down2":
            return d2
        x3 = ff._pool_s2d_to_direct(d2)
        x4 = nn.max_pool(b_d3(x3), (2, 2), strides=(2, 2))
        if stop == "down3":
            return x4
        x5 = nn.max_pool(b_d4(x4), (2, 2), strides=(2, 2))
        y = upsample_align_corners(x5, axes=(1, 2), factors=(2, 2))
        y = b_u1(y)
        if stop == "up1":
            return y
        y = replication_pad_to(y, x4.shape[1], x4.shape[2])
        y = b_u2((upsample_align_corners(y, axes=(1, 2), factors=(2, 2)),
                  upsample_align_corners(x4, axes=(1, 2), factors=(2, 2))))
        if stop == "up2":
            return y
        y = replication_pad_to(y, x3.shape[1], x3.shape[2])
        u3a = ff._upsample2x_to_s2d(y, dt)
        u3b = ff._upsample2x_to_s2d(x3, dt)
        if stop == "up3pre":
            return (u3a, u3b)
        ys = b_u3((u3a, u3b))
        if stop == "up3":
            return ys
        y_d = depth_to_space(ys)
        y_d = replication_pad_to(y_d, x2.shape[1], x2.shape[2])
        u4a = ff._upsample2x_to_s2d(y_d, dt)
        u4b = ff._upsample2x_to_s2d(x2, dt)
        if stop == "up4pre":
            return (u4a, u4b)
        return b_u4((u4a, u4b))

    prev = 0.0
    for stop in ["inconv", "down1", "down2", "down3", "up1", "up2",
                 "up3pre", "up3", "up4pre", "up4"]:
        t = bench(lambda a, s=stop: forward(a, s), xp)
        print(f"prefix->{stop:8s} {t*1e3:8.3f} ms   (+{(t-prev)*1e3:7.3f})",
              flush=True)
        prev = t

    t_model = bench(lambda a: fwd_full(a), xp)
    print(f"full fwd (emb+mask)  {t_model*1e3:8.3f} ms"
          f" (+{(t_model-prev)*1e3:6.3f})")
    t_all = bench(lambda a: jax.nn.relu(
        fused_affinity_2d(fwd_full(a)[0], offsets, 32, False)), xp)
    print(f"full + affinity      {t_all*1e3:8.3f} ms"
          f" (+{(t_all-t_model)*1e3:6.3f})")


if __name__ == "__main__":
    main()
