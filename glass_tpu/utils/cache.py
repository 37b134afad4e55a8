"""Persistent XLA compilation cache setup.

Remote/tunneled TPU backends recompile per process; a persistent cache
keyed on HLO makes warm starts cheap.  Call early (before first jit).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "glass_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("GLASS_TPU_XLA_CACHE", DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        logger.info("XLA compilation cache at %s", cache_dir)
    except Exception as e:  # pragma: no cover
        logger.warning("could not enable compilation cache: %s", e)
