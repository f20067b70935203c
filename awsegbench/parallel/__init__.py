"""Distributed communication layer: collectives + spatial sharding."""

from .collectives import (
    all_gather_batch,
    pmean_tree,
    psum_tree,
    spatial_tiles,
    stitch_tiles,
    tiled_forward,
)

__all__ = ["psum_tree", "pmean_tree", "all_gather_batch",
           "spatial_tiles", "stitch_tiles", "tiled_forward"]
