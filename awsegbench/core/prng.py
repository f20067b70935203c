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


def dropout_key(key: jax.Array, impl: str = 'rbg') -> jax.Array:
    """Derive a dropout key on the chosen PRNG implementation.

    Default 'rbg' maps dropout-mask generation onto the TPU hardware RNG:
    threefry2x32 over the heads' ~10⁹ full-res activations costs ~70 ms of
    the train step (mask bits are regenerated in the backward), rbg is
    near-free. Seeded deterministically from the threefry stream key, so
    runs stay reproducible; the mask BITSTREAM differs from threefry —
    an explicitly-documented deviation (the reference's torch RNG stream
    is different from either). Set tpu.dropout_rng='threefry' to keep the
    default jax stream.
    """
    if impl in (None, 'threefry'):
        return key
    data = jax.random.key_data(key).astype(jnp.uint32)   # [2] uint32
    seed = jnp.concatenate([data, data]).reshape(4)      # rbg wants 4 words
    return jax.random.wrap_key_data(seed, impl=impl)
