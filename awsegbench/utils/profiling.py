"""Tracing / profiling / observability utilities.

The reference has NO profiling beyond wall-clock epoch timing
(trainer.py:527,545 — SURVEY.md §5). This module adds the TPU-native
subsystems the rebuild requires: an optional ``jax.profiler`` trace scope,
per-phase wall timers, an images/sec throughput meter (the benchmark's
north-star metric), and a NaN-check switch.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger(__name__)

# jax is imported lazily inside each function so this module (re-exported by
# awsegbench.utils) stays importable without an accelerator runtime — the
# package facade's graceful-degradation contract (reference __init__.py:11-46).


def enable_nan_checks(enabled: bool = True) -> None:
    """Turn on jax NaN debugging (config flag ``debug.nan_checks``)."""
    import jax
    jax.config.update('jax_debug_nans', enabled)


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``profile_dir`` when set."""
    if not profile_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"Profiler trace written to {profile_dir}")


class PhaseTimers:
    """Accumulating named wall-clock timers (data/compute/metrics phases)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {name: {'total_s': self.totals[name],
                       'count': self.counts[name],
                       'mean_s': self.totals[name] / max(self.counts[name], 1)}
                for name in self.totals}

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


class ThroughputMeter:
    """images/sec meter with device-sync-aware timing."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._n = 0
        self._t0: Optional[float] = None
        self._elapsed = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def update(self, n_images: int) -> None:
        if self._t0 is None:
            self.start()
        self._n += n_images

    def stop(self, sync_on=None) -> None:
        """Stop timing; pass a device array to block on for honest timing."""
        if sync_on is not None:
            import jax
            jax.block_until_ready(sync_on)
        if self._t0 is not None:
            self._elapsed += time.perf_counter() - self._t0
            self._t0 = None

    @property
    def images_per_sec(self) -> float:
        return self._n / self._elapsed if self._elapsed > 0 else 0.0

    @property
    def total_images(self) -> int:
        return self._n
