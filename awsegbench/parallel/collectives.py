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


def _tile_origin(y: int, x: int, height: int, width: int, th: int,
                 tw: int, halo: int) -> Tuple[int, int]:
    """Top-left of the (uniform-shape) tile slice, CLAMPED inside the image.

    Clamping — rather than padding beyond the image — is what makes tiling
    exact for stacked zero-padding (SAME) convolutions: each layer's zero
    padding then occurs only at TRUE image borders, exactly as in the
    monolithic forward. (A padded halo is wrong for conv stacks: layer 1
    produces nonzero activations inside the halo where the monolithic
    layer 2 would see exact zeros from its own SAME padding.)
    """
    sy = min(max(y - halo, 0), height - th)
    sx = min(max(x - halo, 0), width - tw)
    return sy, sx


def spatial_tiles(image: jax.Array, tile_h: int, tile_w: int,
                  halo: int) -> jax.Array:
    """Split [H, W, C] into [N, tile_h + 2·halo, tile_w + 2·halo, C] tiles.

    Every tile lies fully inside the image (edge tiles shift their halo
    inward, see :func:`_tile_origin`), so a halo ≥ the network's effective
    receptive-field radius gives EXACT parity with the monolithic forward
    for conv paths. Requires tile + 2·halo ≤ image in both dims and
    tile_h/tile_w dividing H/W.
    """
    h, w, c = image.shape
    assert h % tile_h == 0 and w % tile_w == 0, "tile size must divide image"
    th, tw = tile_h + 2 * halo, tile_w + 2 * halo
    assert th <= h and tw <= w, (
        f"halo {halo} too large: tile+halo {th}x{tw} exceeds image {h}x{w}")
    tiles = []
    for y, x in tile_grid(h, w, tile_h, tile_w, halo):
        sy, sx = _tile_origin(y, x, h, w, th, tw, halo)
        tiles.append(jax.lax.dynamic_slice(image, (sy, sx, 0), (th, tw, c)))
    return jnp.stack(tiles)


def stitch_tiles(tiles: jax.Array, height: int, width: int, tile_h: int,
                 tile_w: int, halo: int) -> jax.Array:
    """Inverse of spatial_tiles for per-tile outputs: crop each tile's core
    (at its clamp-dependent offset) and place it."""
    n, th, tw, c = tiles.shape
    out = jnp.zeros((height, width, c), tiles.dtype)
    for i, (y, x) in enumerate(tile_grid(height, width, tile_h, tile_w, halo)):
        sy, sx = _tile_origin(y, x, height, width, th, tw, halo)
        oy, ox = y - sy, x - sx
        core = tiles[i, oy:oy + tile_h, ox:ox + tile_w, :]
        out = jax.lax.dynamic_update_slice(out, core, (y, x, 0))
    return out


def tiled_forward(apply_fn, variables, image: jax.Array, tile_h: int,
                  tile_w: int, halo: int, out_channels: int = 0,
                  mesh=None) -> Any:
    """Run ``apply_fn`` over spatial tiles of one [H, W, 3] image and
    stitch full-res outputs back together.

    The tile axis becomes the batch axis; when ``mesh`` is given it is
    constrained to shard over the data axis, so ONE full-res image spreads
    across chips (choose the tile grid so the tile count is a multiple of
    the mesh size). ``apply_fn(variables, tiles)`` may return an array or a
    dict of [N, th, tw, C] arrays (e.g. the ensemble's
    segmentation/member/depth outputs) — every entry is stitched.
    """
    h, w, _ = image.shape
    tiles = spatial_tiles(image, tile_h, tile_w, halo)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        tiles = jax.lax.with_sharding_constraint(
            tiles, NamedSharding(mesh, P(DATA_AXIS)))
    out = apply_fn(variables, tiles)
    if isinstance(out, dict):
        return {k: stitch_tiles(v, h, w, tile_h, tile_w, halo)
                for k, v in out.items()}
    return stitch_tiles(out, h, w, tile_h, tile_w, halo)


def choose_tile_grid(height: int, width: int, n_tiles: int
                     ) -> Tuple[int, int]:
    """Pick (tile_h, tile_w) splitting H×W into exactly ``n_tiles``
    near-square tiles with exact divisibility. Raises if no factorization
    of ``n_tiles`` divides both dims."""
    best = None
    for gh in range(1, n_tiles + 1):
        if n_tiles % gh:
            continue
        gw = n_tiles // gh
        if height % gh or width % gw:
            continue
        th, tw = height // gh, width // gw
        score = abs(th - tw)
        if best is None or score < best[0]:
            best = (score, th, tw)
    if best is None:
        raise ValueError(f'cannot split {height}x{width} into {n_tiles} tiles')
    return best[1], best[2]
