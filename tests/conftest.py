"""Test config: force an 8-device virtual CPU platform before jax import.

Multi-chip sharding tests run on this virtual mesh; real-TPU behavior is
exercised by bench.py / the driver's dryrun.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
