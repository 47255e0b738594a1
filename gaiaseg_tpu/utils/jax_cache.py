"""Persistent XLA compilation cache: repeated tool/bench invocations reuse
compiled executables instead of paying multi-minute supernet compiles."""
from __future__ import annotations

import logging
import os

logger = logging.getLogger("gaiaseg_tpu")


def enable_compilation_cache(path: str = None) -> None:
    import jax
    path = path or os.environ.get(
        "GAIASEG_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "gaiaseg_jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # cache is best-effort
        logger.debug("compilation cache unavailable: %s", e)
