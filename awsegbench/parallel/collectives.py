"""Collective helpers + spatial sharding for full-resolution evaluation.

The reference has no distributed layer at all (SURVEY.md §2.2); this module
is the TPU-native communication layer:

* ``psum_tree`` / ``all_gather_batch`` — thin shard_map-level wrappers over
  XLA collectives for metric PyTrees and result gathering.
* ``spatial_tiles`` / ``stitch_tiles`` / ``TileInfo`` — the image-domain
  analog of context parallelism (SURVEY.md §5): a full-res image is split
  into overlapping tiles with a halo margin, tiles are batched over the
  mesh's data axis, and per-tile logits are cropped + stitched. Tiling is
  EXACT (to f32 rounding) vs the monolithic forward: conv segments consume
  halo between per-stage ``TileInfo.resync`` halo exchanges, SR attention
  gathers K/V from the assembled full-image map, and ASPP runs on the
  assembled os16 map (its rate-36 atrous reach exceeds any feasible halo).
  Required: halo ≥ the largest per-segment local receptive radius
  (~96 input px for B0/R50 with per-stage resyncs; default halo 128).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.mesh import DATA_AXIS


@dataclasses.dataclass(frozen=True)
class TileInfo:
    """Static tile-grid geometry threaded through model forwards so
    globally-coupled ops (SR attention K/V, ASPP image pooling) can
    reconstruct the FULL-image field from per-tile features — making tiled
    inference bit-exact vs the monolithic forward (round-2 left these ops
    approximate near seams).

    All coordinates are at input resolution; ``scaled(k)`` divides the
    geometry by a feature stride ``k``. ``origins`` holds, per tile,
    ``(y, x, sy, sx)``: the interior core's top-left (y, x) and the
    clamped slice origin (sy, sx) of the halo'd tile.
    """

    image_hw: Tuple[int, int]
    tile_hw: Tuple[int, int]
    halo: Tuple[int, int]
    origins: Tuple[Tuple[int, int, int, int], ...]

    @classmethod
    def build(cls, image_hw, tile_hw, halo) -> 'TileInfo':
        h, w = image_hw
        hy, hx = _halo_hw(halo)
        th_full = tile_hw[0] + 2 * hy
        tw_full = tile_hw[1] + 2 * hx
        origins = []
        for y, x in tile_grid(h, w, tile_hw[0], tile_hw[1], (hy, hx)):
            sy, sx = _tile_origin(y, x, h, w, th_full, tw_full, (hy, hx))
            origins.append((y, x, sy, sx))
        return cls((h, w), tuple(tile_hw), (hy, hx), tuple(origins))

    def scaled(self, k: int) -> 'TileInfo':
        vals = [*self.image_hw, *self.tile_hw, *self.halo]
        vals += [v for o in self.origins for v in o]
        if any(v % k for v in vals):
            raise ValueError(
                f'tile geometry {self} not divisible by feature stride {k} '
                '— choose tile/halo sizes divisible by the deepest stride '
                '(32 for SegFormer-B0, 16 for DeepLabV3+)')
        return TileInfo(
            (self.image_hw[0] // k, self.image_hw[1] // k),
            (self.tile_hw[0] // k, self.tile_hw[1] // k),
            (self.halo[0] // k, self.halo[1] // k),
            tuple((y // k, x // k, sy // k, sx // k)
                  for (y, x, sy, sx) in self.origins))

    def scale_for(self, tile_shape_hw: Tuple[int, int]) -> int:
        """Feature stride implied by a halo'd tile's current spatial shape."""
        full = self.tile_hw[0] + 2 * self.halo[0]
        k, rem = divmod(full, tile_shape_hw[0])
        if rem or (self.tile_hw[1] + 2 * self.halo[1]) // k != tile_shape_hw[1]:
            raise ValueError(
                f'tile shape {tile_shape_hw} does not evenly divide the '
                f'input tile {(full, self.tile_hw[1] + 2 * self.halo[1])}')
        return k

    def resync(self, tiles: jax.Array) -> jax.Array:
        """Halo exchange: refill every tile's halo region with the
        monolithic-exact values (other tiles' cores).

        Local ops between two resyncs consume halo; a resync resets the
        consumption to zero, so tiling is bit-exact when every segment's
        local receptive radius ≤ halo. This is the image-domain analog of
        context-parallel halo exchange (SURVEY.md §5) expressed as
        assemble+extract — XLA lowers the data movement to collectives when
        the tile axis is mesh-sharded.
        """
        return self.extract_tiles(self.assemble_full(tiles))

    def extract_tiles(self, full: jax.Array) -> jax.Array:
        """Inverse of :meth:`assemble_full`: slice each tile's halo'd window
        back out of a [1, H, W, C] full map at the same feature scale."""
        _, hh, ww, c = full.shape
        k, rem = divmod(self.image_hw[0], hh)
        info = self.scaled(k) if k > 1 else self
        th = info.tile_hw[0] + 2 * info.halo[0]
        tw = info.tile_hw[1] + 2 * info.halo[1]
        tiles = [full[0, sy:sy + th, sx:sx + tw, :]
                 for (_, _, sy, sx) in info.origins]
        return jnp.stack(tiles)

    def assemble_full(self, tiles: jax.Array) -> jax.Array:
        """[N, th, tw, C] halo'd tile features → [1, H, W, C] full map.

        Crops each tile's interior core (whose union partitions the image
        exactly) and places it — the inverse of ``spatial_tiles`` at this
        feature scale. Bit-exact: core features equal the monolithic
        forward's wherever the halo covers the receptive field.
        """
        n, th, tw, c = tiles.shape
        k = self.scale_for((th, tw))
        info = self.scaled(k) if k > 1 else self
        hh, ww = info.image_hw
        cth, ctw = info.tile_hw
        out = jnp.zeros((1, hh, ww, c), tiles.dtype)
        for i, (y, x, sy, sx) in enumerate(info.origins):
            oy, ox = y - sy, x - sx
            core = tiles[i:i + 1, oy:oy + cth, ox:ox + ctw, :]
            out = jax.lax.dynamic_update_slice(out, core, (0, y, x, 0))
        return out


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

def _halo_hw(halo) -> Tuple[int, int]:
    """Halo may be a scalar or a per-axis (halo_y, halo_x) pair — full-width
    band tiling uses (halo_y, 0)."""
    if isinstance(halo, (tuple, list)):
        return int(halo[0]), int(halo[1])
    return int(halo), int(halo)


def tile_grid(height: int, width: int, tile_h: int, tile_w: int,
              halo) -> List[Tuple[int, int]]:
    """Top-left coordinates of the interior (non-halo) tile grid."""
    ys = list(range(0, height, tile_h))
    xs = list(range(0, width, tile_w))
    return [(y, x) for y in ys for x in xs]


def _tile_origin(y: int, x: int, height: int, width: int, th: int,
                 tw: int, halo) -> Tuple[int, int]:
    """Top-left of the (uniform-shape) tile slice, CLAMPED inside the image.

    Clamping — rather than padding beyond the image — is what makes tiling
    exact for stacked zero-padding (SAME) convolutions: each layer's zero
    padding then occurs only at TRUE image borders, exactly as in the
    monolithic forward. (A padded halo is wrong for conv stacks: layer 1
    produces nonzero activations inside the halo where the monolithic
    layer 2 would see exact zeros from its own SAME padding.)
    """
    hy, hx = _halo_hw(halo)
    sy = min(max(y - hy, 0), height - th)
    sx = min(max(x - hx, 0), width - tw)
    return sy, sx


def spatial_tiles(image: jax.Array, tile_h: int, tile_w: int,
                  halo) -> jax.Array:
    """Split [H, W, C] into [N, tile_h + 2·halo_y, tile_w + 2·halo_x, C]
    tiles (``halo`` scalar or per-axis pair).

    Every tile lies fully inside the image (edge tiles shift their halo
    inward, see :func:`_tile_origin`), so a halo ≥ the network's effective
    receptive-field radius gives EXACT parity with the monolithic forward
    for conv paths. Requires tile + 2·halo ≤ image in both dims and
    tile_h/tile_w dividing H/W.
    """
    h, w, c = image.shape
    hy, hx = _halo_hw(halo)
    assert h % tile_h == 0 and w % tile_w == 0, "tile size must divide image"
    th, tw = tile_h + 2 * hy, tile_w + 2 * hx
    assert th <= h and tw <= w, (
        f"halo {halo} too large: tile+halo {th}x{tw} exceeds image {h}x{w}")
    tiles = []
    for y, x in tile_grid(h, w, tile_h, tile_w, halo):
        sy, sx = _tile_origin(y, x, h, w, th, tw, halo)
        tiles.append(jax.lax.dynamic_slice(image, (sy, sx, 0), (th, tw, c)))
    return jnp.stack(tiles)


def stitch_tiles(tiles: jax.Array, height: int, width: int, tile_h: int,
                 tile_w: int, halo) -> jax.Array:
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
                  mesh=None, with_tile_info: bool = False) -> Any:
    """Run ``apply_fn`` over spatial tiles of one [H, W, 3] image and
    stitch full-res outputs back together.

    The tile axis becomes the batch axis; when ``mesh`` is given it is
    constrained to shard over the data axis, so ONE full-res image spreads
    across chips (choose the tile grid so the tile count is a multiple of
    the mesh size). ``apply_fn(variables, tiles)`` may return an array or a
    dict of [N, th, tw, C] arrays (e.g. the ensemble's
    segmentation/member/depth outputs) — every entry is stitched.

    ``with_tile_info=True`` additionally passes a :class:`TileInfo` as
    ``apply_fn(variables, tiles, tile_info)`` so globally-coupled ops
    (SR attention, ASPP image pooling) reconstruct the full-image field —
    with a halo covering the local receptive fields this makes the tiled
    result bit-exact vs the monolithic forward.
    """
    h, w, _ = image.shape
    tiles = spatial_tiles(image, tile_h, tile_w, halo)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        tiles = jax.lax.with_sharding_constraint(
            tiles, NamedSharding(mesh, P(DATA_AXIS)))
    if with_tile_info:
        info = TileInfo.build((h, w), (tile_h, tile_w), halo)
        out = apply_fn(variables, tiles, info)
    else:
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
