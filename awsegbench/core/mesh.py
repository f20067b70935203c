"""Device mesh and sharding utilities.

The reference is single-process/single-device (trainer.py:121,
utils/config.py:354-375); data parallelism here is a first-class TPU-native
layer: a 1-D ``jax.sharding.Mesh`` over all local (or all global) devices,
batch dims sharded over the ``data`` axis, parameters replicated, gradients
and metric accumulators reduced by XLA collectives inserted automatically
under ``jit`` with NamedSharding constraints.
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = 'data'
MODEL_AXIS = 'model'

_DISTRIBUTED_INITIALIZED = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host initialization (`jax.distributed.initialize`).

    In-slice chips communicate over ICI under a single process; across
    hosts JAX coordinates over DCN. Call once before device queries when
    running multi-host (args usually come from the TPU environment and can
    be omitted). Returns True when distributed mode is active. Safe no-op
    on single-host setups.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    env_ok = coordinator_address or 'COORDINATOR_ADDRESS' in \
        __import__('os').environ
    if not env_ok and num_processes in (None, 1):
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _DISTRIBUTED_INITIALIZED = True
        logger.info(f"jax.distributed initialized: process "
                    f"{jax.process_index()}/{jax.process_count()}")
        return True
    except Exception as e:  # pragma: no cover
        logger.warning(f"jax.distributed.initialize failed: {e}")
        return False


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    mesh_shape: Any = 'auto',
) -> Mesh:
    """Create the device mesh.

    Args:
        devices: devices to use (default: all ``jax.devices()``).
        mesh_shape: 'auto' → 1-D ``('data',)`` mesh over every device;
            or a dict like ``{'data': 4, 'model': 2}`` for a 2-D mesh.

    Returns:
        ``jax.sharding.Mesh``
    """
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape in (None, 'auto'):
        dev_array = np.asarray(devices)
        return Mesh(dev_array, axis_names=(DATA_AXIS,))
    if isinstance(mesh_shape, dict):
        axis_names = tuple(mesh_shape.keys())
        sizes = tuple(int(v) for v in mesh_shape.values())
        total = int(np.prod(sizes))
        if total != len(devices):
            raise ValueError(
                f"mesh_shape {mesh_shape} needs {total} devices, have {len(devices)}"
            )
        dev_array = np.asarray(devices).reshape(sizes)
        return Mesh(dev_array, axis_names=axis_names)
    raise ValueError(f"Unsupported mesh_shape: {mesh_shape!r}")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the batch: shard over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, scalars, metric accumulators)."""
    return NamedSharding(mesh, P())


def has_model_axis(mesh: Mesh) -> bool:
    return MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1


def tp_param_shardings(params: Any, mesh: Mesh,
                       min_features: int = 64) -> Any:
    """Tensor-parallel NamedShardings for a parameter tree.

    The model axis's consumer (SURVEY.md §2.2 TP hook): every Dense/Conv
    ``kernel`` whose output-feature (last) axis is divisible by the model
    axis size and ≥ ``min_features`` is sharded ``P(..., 'model')``; its
    ``bias`` follows on its feature axis. Everything else (norm scales,
    tiny heads, scalars) stays replicated. Activations pick up the channel
    sharding through GSPMD propagation and XLA inserts the collectives —
    the idiomatic jax TP: annotate weights, let the partitioner do the
    rest. Memory per device for the sharded kernels drops by the model
    size; numerics are unchanged (same program, partitioned).

    Returns a PyTree of NamedShardings matching ``params``.
    """
    m = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())

    def rule(path, leaf):
        names = [getattr(k, 'key', getattr(k, 'name', '')) for k in path]
        last = names[-1] if names else ''
        shape = getattr(leaf, 'shape', ())
        if not shape:
            return rep
        out_f = shape[-1]
        shardable = out_f % m == 0 and out_f >= min_features
        if last == 'kernel' and len(shape) >= 2 and shardable:
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1) + [MODEL_AXIS])))
        if last in ('bias', 'scale') and len(shape) == 1 and shardable:
            # follow the producing kernel's output sharding
            return NamedSharding(mesh, P(MODEL_AXIS))
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def _key_str(k) -> str:
    return str(getattr(k, 'key', getattr(k, 'name', getattr(k, 'idx', k))))


def opt_state_shardings(opt_state: Any, params: Any, param_sh: Any,
                        mesh: Mesh) -> Any:
    """Shardings for an optax state tree: leaves that mirror a parameter
    (Adam mu/nu etc. — identified by path suffix + shape) take that
    parameter's sharding; counts/hyperparams stay replicated. Needed
    because plain jit propagation is free to replicate an unconstrained
    zeros_like output."""
    rep = replicated_sharding(mesh)
    pmap = {}
    pleaves = jax.tree_util.tree_flatten_with_path(params)[0]
    sleaves = jax.tree_util.tree_flatten_with_path(param_sh)[0]
    for (path, leaf), (_, sh) in zip(pleaves, sleaves):
        pmap[tuple(_key_str(k) for k in path)] = (
            getattr(leaf, 'shape', None), sh)

    def rule(path, leaf):
        keys = tuple(_key_str(k) for k in path)
        shape = getattr(leaf, 'shape', None)
        for start in range(len(keys)):
            hit = pmap.get(keys[start:])
            if hit is not None and hit[0] == shape:
                return hit[1]
        return rep

    return jax.tree_util.tree_map_with_path(rule, opt_state)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Replicated shardings for a 1-D mesh; TP shardings when the mesh has
    a >1-sized model axis."""
    if has_model_axis(mesh):
        return tp_param_shardings(params, mesh)
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda _: rep, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host-side batch PyTree onto the mesh, sharded on the batch axis.

    Every leaf is assumed to have the (global) batch as its leading axis.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a PyTree (e.g. params / train state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_multiple(batch: Any, multiple: int) -> tuple[Any, int]:
    """Pad the leading axis of every leaf up to a multiple of ``multiple``.

    Returns (padded_batch, original_batch_size). Needed so a global batch
    divides evenly over the data axis; callers mask out padded rows in
    metric accumulation.
    """
    leaves = jax.tree_util.tree_leaves(batch)
    if not leaves:
        return batch, 0
    n = leaves[0].shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = multiple - rem

    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths, mode='edge')

    return jax.tree_util.tree_map(_pad, batch), n
