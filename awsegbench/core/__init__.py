"""Core TPU runtime utilities: mesh/sharding, PRNG streams, precision policy."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    init_distributed,
    pad_batch_to_multiple,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .cache import setup_compilation_cache
from .precision import Policy, get_policy
from .prng import RngStreams, per_sample_keys

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "create_mesh", "batch_sharding",
    "replicated_sharding", "shard_batch", "replicate", "pad_batch_to_multiple",
    "init_distributed",
    "Policy", "get_policy", "RngStreams", "per_sample_keys",
    "setup_compilation_cache",
]
