"""Characterize the host<->device link: transfer bandwidth + dispatch latency.

The training wall-clock model on a remote-attached chip is
    wall/iter = step + bytes/iter / BW + L / S (+ non-overlapped host)
where L is the fixed per-dispatch latency and S = train.steps_per_call.
This probe measures BW (device_put, several sizes, uint8 vs f32) and L
(marginal cost of chained tiny jit calls), so PERF.md can state which term
dominates each preset instead of guessing.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    dev = jax.devices()[0]
    print(f"device: {dev.platform}", flush=True)

    @jax.jit
    def probe(x):  # scalar fetch = round-trip completion marker
        return jnp.sum(x, dtype=jnp.float32)

    # --- upload bandwidth (device_put + scalar fetch) ---
    for mb in (1, 8, 64):
        for dt in (np.uint8, np.float32):
            x = np.ones((mb << 20) // np.dtype(dt).itemsize, dt)
            float(probe(jax.device_put(x)))  # compile + warm
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                float(probe(jax.device_put(x)))
            dtm = (time.perf_counter() - t0) / reps
            print(f"upload {mb:3d} MB {np.dtype(dt).name:8s}: "
                  f"{dtm*1e3:8.1f} ms  ({mb/dtm:7.1f} MB/s incl. rt)",
                  flush=True)

    # --- dispatch latency: K chained tiny donated-carry jit calls ---
    @jax.jit
    def tiny(c):
        return c * 1.000001 + 1.0

    c = jax.device_put(jnp.zeros((8, 128), jnp.float32))
    float(jnp.sum(tiny(c)))  # compile
    for K in (1, 8, 32):
        t0 = time.perf_counter()
        cc = c
        for _ in range(K):
            cc = tiny(cc)
        float(jnp.sum(cc))
        dtm = time.perf_counter() - t0
        print(f"chained tiny dispatches K={K:3d}: {dtm*1e3:8.1f} ms "
              f"({dtm/K*1e3:6.1f} ms/call)", flush=True)

    # same, but synchronizing every call (the donated-carry serial pattern)
    for K in (1, 8):
        t0 = time.perf_counter()
        for _ in range(K):
            float(jnp.sum(tiny(c)))
        dtm = time.perf_counter() - t0
        print(f"sync-every-call K={K:3d}: {dtm*1e3:8.1f} ms "
              f"({dtm/K*1e3:6.1f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
