"""Worker body for the 2-process multi-host smoke test.

Run as: python multihost_worker.py <coordinator> <num_procs> <proc_id>
with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=2 so each
process contributes 2 CPU devices to a 4-device global 'data' mesh. Executes
one full DP-sharded 2D train step (student+EMA forwards, device-side GT,
grads, optimizer) and prints the loss; the parent asserts both processes
print identical finite values.
"""

import os
import sys


def main():
    coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 2 * num_procs, len(jax.devices())

    import numpy as np

    from pixel_embedded_affinity_tpu.config import load_config
    from pixel_embedded_affinity_tpu.ops import multi_offset
    from pixel_embedded_affinity_tpu.parallel import (
        get_mesh, batch_sharding, replicated_sharding)
    from pixel_embedded_affinity_tpu.parallel.multihost import (
        to_global, global_batch)
    from pixel_embedded_affinity_tpu.train.loop import build_model, init_state
    from pixel_embedded_affinity_tpu.train.optim import make_optimizer
    from pixel_embedded_affinity_tpu.train.train_step import make_train_step_2d

    mesh = get_mesh()  # all 4 global devices
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)

    cfg = load_config("cvppp")
    cfg.model.filters = (4, 6, 8, 12, 16)
    cfg.model.s2d_train = False
    size, b = 32, 4  # one sample per global device
    rng = np.random.default_rng(0)  # identical batch on every process
    seg = (rng.random((b, size, size)) * 4).astype(np.int32)
    batch = {
        "image": rng.normal(size=(b, size, size, 3)).astype(np.float32),
        "ema_image": rng.normal(size=(b, size, size, 3)).astype(np.float32),
        "seg": seg,
        "rules": rng.integers(0, 2, (b, 3)).astype(np.float32),
    }
    shifts = [1, 2, 3, 5]  # nb_half*4 offsets for the deep-supervision heads
    offsets = multi_offset(shifts, neighbor=4)

    model = build_model(cfg)
    tx = make_optimizer(1e-4)
    state = init_state(cfg, model, tx, batch)
    state = jax.tree_util.tree_map(
        lambda x: to_global(np.asarray(x), rsh), state)
    gbatch = global_batch(batch, bsh)

    step = make_train_step_2d(model, tx, offsets, neighbor=4,
                              use_pallas=False, device_gt=True)
    jit_step = jax.jit(step, in_shardings=(rsh, {k: bsh for k in batch}),
                       donate_argnums=(0,))
    with mesh:
        state, _, metrics = jit_step(state, gbatch)
        # second step through the prefetcher path (global_batch again)
        state, _, metrics = jit_step(state, global_batch(batch, bsh))
        loss = float(metrics["loss"])
    print(f"MULTIHOST_LOSS {loss:.9f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
