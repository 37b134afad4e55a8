import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware.  Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the compile-heavy slow tier (full-model
# jits, trainer loops) is dominated by single-core XLA-CPU compiles;
# caching makes re-runs cheap.  GLASS_TPU_NO_XLA_CACHE=1 opts out (e.g.
# to measure cold-compile time).
if os.environ.get("GLASS_TPU_NO_XLA_CACHE", "") != "1":
    from glass_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
