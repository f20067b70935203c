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
    if os.environ.get('AWSEG_DISABLE_COMPILE_CACHE', '').lower() not in (
            '', '0', 'false'):
        # Hermetic mode: cached XLA:CPU AOT executables compiled on a host
        # with different machine features can abort at load time
        # (cpu_aot_loader machine-feature mismatch); callers that need
        # deterministic behavior (driver dry runs) opt out of the cache.
        logger.debug('Compilation cache disabled via '
                     'AWSEG_DISABLE_COMPILE_CACHE')
        return
    path = cache_dir or DEFAULT_CACHE_DIR
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
        logger.debug(f"XLA compilation cache at {path}")
    except Exception as e:  # pragma: no cover
        logger.warning(f"Could not enable compilation cache: {e}")
