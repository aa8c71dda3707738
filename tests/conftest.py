"""Test config: force an 8-device virtual CPU platform.

Some installed pytest plugins import jax before this conftest runs, so env
vars alone are too late; jax.config.update works as long as no backend has
been initialized yet (first jax.devices() call happens inside tests).
"""

import os
import sys

# PEA_TPU_TESTS=1 keeps the real TPU backend (for the `-m tpu` tier, which
# exercises Mosaic-compiled kernels instead of the interpreter)
_TPU_TIER = os.environ.get("PEA_TPU_TESTS") == "1"

if not _TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
# exact f32 convs/matmuls for reference-parity tests (the framework default
# stays fast bf16-class MXU passes in production)
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: XLA CPU conv compiles are minutes-slow on this
# 1-core host; reruns of the suite hit the cache instead
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
