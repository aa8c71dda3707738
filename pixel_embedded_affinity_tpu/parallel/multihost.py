"""Multi-host (multi-process) helpers for the DP training path.

The reference has no multi-node support at all (SURVEY §2.5: DataParallel
only). This module is the TPU-native extension: `train.py --distributed`
calls `jax.distributed.initialize()`, the 'data' mesh then spans all hosts'
devices (DP over ICI within a host, DCN across hosts), and the helpers here
assemble global arrays from per-process host data — the piece plain
`device_put` cannot do once a sharding includes non-addressable devices.

Validated by tests/test_multihost.py: a 2-process CPU smoke test
(jax.distributed.initialize with a local coordinator) running one full
DP-sharded train step and asserting identical finite losses on both
processes.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding


def to_global(x, sharding: NamedSharding):
    """Host array (with the FULL global shape, identical on every process)
    -> global jax.Array laid out by ``sharding``.

    Each process materializes only its addressable shards; replicated
    shardings receive full copies. For batch shardings this assumes every
    process can produce the full batch (same PRNG seed) — the sampler-side
    equivalent of the reference's single-host DataLoader semantics.
    """
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def global_batch(batch: dict, sharding: NamedSharding) -> dict:
    """Apply ``to_global`` over a batch dict."""
    return {k: to_global(v, sharding) for k, v in batch.items()}


def is_multiprocess() -> bool:
    return jax.process_count() > 1
