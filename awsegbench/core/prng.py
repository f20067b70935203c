"""PRNG stream helpers.

The reference seeds python/numpy/torch RNGs once (scripts/train.py:39-59) and
draws per-sample randomness inside DataLoader workers (loader.py:265,
preprocessing throughout). TPU-native design: one root ``jax.random`` key,
split into named deterministic streams; per-sample corruption keys are folded
from (stream key, global sample counter) so a batch of corruptions is fully
vectorizable and reproducible regardless of batch size or device count.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


class RngStreams:
    """Named deterministic PRNG streams derived from one root seed."""

    STREAMS = ('params', 'dropout', 'weather', 'data', 'loss')

    def __init__(self, seed: int) -> None:
        self.seed = int(seed)
        root = jax.random.PRNGKey(self.seed)
        keys = jax.random.split(root, len(self.STREAMS))
        self._streams: Dict[str, jax.Array] = dict(zip(self.STREAMS, keys))

    def key(self, name: str) -> jax.Array:
        return self._streams[name]

    def fold(self, name: str, step: int) -> jax.Array:
        """Stable per-step key: fold_in(stream, step)."""
        return jax.random.fold_in(self._streams[name], step)


def per_sample_keys(key: jax.Array, sample_ids: jax.Array) -> jax.Array:
    """Vectorized fold-in: one key per sample id. Works under jit/vmap."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(sample_ids.astype(jnp.uint32))
