"""Collective helpers + spatial sharding for full-resolution evaluation.

The reference has no distributed layer at all (SURVEY.md §2.2); this module
is the TPU-native communication layer:

* ``psum_tree`` / ``all_gather_batch`` — thin shard_map-level wrappers over
  XLA collectives for metric PyTrees and result gathering.
* ``spatial_tiles`` / ``stitch_tiles`` — the image-domain analog of context
  parallelism (SURVEY.md §5): a full-res image is split into overlapping
  tiles with a halo margin, tiles are batched over the mesh's data axis,
  and per-tile logits are cropped + stitched. With a halo ≥ the network's
  effective receptive-field radius the stitched result matches the
  monolithic forward for conv paths; globally-coupled ops (SegFormer's SR
  attention, ASPP image pooling) make tiling approximate near boundaries —
  use the monolithic path when exact parity is required (it fits one chip
  at 2048×1024 bf16).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp

from ..core.mesh import DATA_AXIS


def psum_tree(tree: Any, axis_name: str = DATA_AXIS) -> Any:
    """Sum a PyTree of per-device partial metrics across the mesh axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.psum(x, axis_name), tree)


def pmean_tree(tree: Any, axis_name: str = DATA_AXIS) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis_name), tree)


def all_gather_batch(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    """Gather per-device batch shards into the full batch on every device."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


# ---------------------------------------------------------------------------
# spatial tiling (context-parallel analog for the spatial axis)
# ---------------------------------------------------------------------------

def tile_grid(height: int, width: int, tile_h: int, tile_w: int,
              halo: int) -> List[Tuple[int, int]]:
    """Top-left coordinates of the interior (non-halo) tile grid."""
    ys = list(range(0, height, tile_h))
    xs = list(range(0, width, tile_w))
    return [(y, x) for y in ys for x in xs]


def spatial_tiles(image: jax.Array, tile_h: int, tile_w: int,
                  halo: int) -> jax.Array:
    """Split [H, W, C] into [N, tile_h + 2·halo, tile_w + 2·halo, C] tiles.

    Edge tiles are edge-padded. H and W must divide by tile_h/tile_w.
    """
    h, w, c = image.shape
    assert h % tile_h == 0 and w % tile_w == 0, "tile size must divide image"
    padded = jnp.pad(image, ((halo, halo), (halo, halo), (0, 0)), mode='edge')
    tiles = []
    for y, x in tile_grid(h, w, tile_h, tile_w, halo):
        tiles.append(jax.lax.dynamic_slice(
            padded, (y, x, 0), (tile_h + 2 * halo, tile_w + 2 * halo, c)))
    return jnp.stack(tiles)


def stitch_tiles(tiles: jax.Array, height: int, width: int, tile_h: int,
                 tile_w: int, halo: int) -> jax.Array:
    """Inverse of spatial_tiles for per-tile outputs: crop halos + place."""
    n, th, tw, c = tiles.shape
    out = jnp.zeros((height, width, c), tiles.dtype)
    for i, (y, x) in enumerate(tile_grid(height, width, tile_h, tile_w, halo)):
        core = tiles[i, halo:halo + tile_h, halo:halo + tile_w, :]
        out = jax.lax.dynamic_update_slice(out, core, (y, x, 0))
    return out


def tiled_forward(apply_fn, variables, image: jax.Array, tile_h: int,
                  tile_w: int, halo: int, out_channels: int) -> jax.Array:
    """Run ``apply_fn`` over spatial tiles of one [H, W, 3] image and
    stitch [H, W, out_channels] logits. The tile batch axis shards over the
    data mesh axis under jit, so one full-res image spreads across chips.
    """
    h, w, _ = image.shape
    tiles = spatial_tiles(image, tile_h, tile_w, halo)
    out = apply_fn(variables, tiles)
    if isinstance(out, dict):
        out = out['segmentation']
    return stitch_tiles(out, h, w, tile_h, tile_w, halo)
