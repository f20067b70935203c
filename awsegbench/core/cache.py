"""Persistent XLA compilation cache setup.

Remote-tunnel TPU backends can take minutes per compile; caching compiled
executables across processes makes every CLI/bench/test invocation after
the first start hot. Call early, before the first jit trace.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.environ.get('AWSEG_COMPILE_CACHE',
                                   '/root/.jax_compile_cache')


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    import jax
    path = cache_dir or DEFAULT_CACHE_DIR
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
        logger.debug(f"XLA compilation cache at {path}")
    except Exception as e:  # pragma: no cover
        logger.warning(f"Could not enable compilation cache: {e}")
