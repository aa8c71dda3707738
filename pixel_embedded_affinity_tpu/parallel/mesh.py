"""Device meshes and shardings.

The reference's only parallelism is single-node DataParallel
(scripts_cvppp/main.py:117-123). TPU-native replacement: a 1-D 'data' mesh;
the train step is jit-compiled with batch inputs sharded over 'data' and
parameters replicated — XLA inserts the gradient all-reduce over ICI.
BatchNorm reductions under GSPMD become cross-replica (sync BN), a strict
upgrade over the reference's unsynced BN.

The tiled-inference engine shards the tile grid over the same axis
(embarrassingly parallel, one all-gather at the end).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
