"""Pallas TPU kernel: capsule/circle splat rasterization.

The hot op of the weather engine: rendering up to 500 rain streaks (capsule
segments) or 200 snow flakes (circles) per image as a union coverage mask.
The reference draws these sequentially with ``cv2.line``/``cv2.circle`` on
CPU (preprocessing.py:142-163, :187-194); the pure-XLA path
(`weather.corruption._segment_coverage`) materializes chunked [chunk, H, W]
masks in HBM. This kernel keeps the whole mask tile in VMEM, loops drops
with a per-tile bounding-box cull (most drops touch one tile only), and
writes the mask once — no intermediate HBM traffic.

Falls back to interpret mode off-TPU (tests run the XLA path instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile sizes aligned to the VPU (8, 128) lanes
TILE_H = 256
TILE_W = 512

# v2 windowed kernel: per-drop write window (rows × cols), aligned to the
# (8, 128) tile grid. Contract: drop bounding boxes (|b−a| + 2·r) must fit
# WIN_H − 8 rows / WIN_W − 128 cols after alignment loss. Production drops
# are ≤ 24 px (rain: length < 20 + 2r ≤ 3; snow: 2r ≤ 16).
WIN_H = 40
WIN_W = 256
# largest image the single-cell v2 kernel holds in VMEM (f32 mask + slack)
_V2_MAX_PIXELS = 1024 * 1024


def _splat_kernel_windowed(params_ref, mask_ref):
    """Full-image mask in VMEM; every drop touches only its aligned
    (WIN_H, WIN_W) window — ~16× less VPU work than full-tile rasterization
    when drops are small (they are: ≤24 px bounding boxes).

    No ``pl.program_id`` use: safe under vmap's automatic grid batching.
    """
    h, w = mask_ref.shape
    mask_ref[:] = jnp.zeros((h, w), jnp.float32)
    n = params_ref.shape[0]

    wy = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, WIN_W), 0)
    wx = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, WIN_W), 1)

    def body(k, _):
        ax = params_ref[k, 0]
        ay = params_ref[k, 1]
        bx = params_ref[k, 2]
        by = params_ref[k, 3]
        r = params_ref[k, 4]
        valid = params_ref[k, 5]

        lo_x = jnp.minimum(ax, bx) - r
        lo_y = jnp.minimum(ay, by) - r
        # window start aligned down to the (8, 128) grid, clamped in range
        y0 = jnp.clip((lo_y.astype(jnp.int32) // 8) * 8, 0, h - WIN_H)
        x0 = jnp.clip((lo_x.astype(jnp.int32) // 128) * 128, 0, w - WIN_W)
        y0 = pl.multiple_of(y0, 8)
        x0 = pl.multiple_of(x0, 128)

        py = (wy + y0).astype(jnp.float32)
        px = (wx + x0).astype(jnp.float32)

        dx = bx - ax
        dy = by - ay
        len2 = dx * dx + dy * dy
        t = jnp.where(len2 > 0,
                      ((px - ax) * dx + (py - ay) * dy)
                      / jnp.maximum(len2, 1e-8), 0.0)
        t = jnp.clip(t, 0.0, 1.0)
        cx = ax + t * dx
        cy = ay + t * dy
        d2 = (px - cx) ** 2 + (py - cy) ** 2
        hit = jnp.logical_and(d2 <= r * r, valid > 0).astype(jnp.float32)

        window = mask_ref[pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)]
        mask_ref[pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)] = jnp.maximum(window, hit)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _splat_kernel(params_ref, mask_ref):
    """One (TILE_H, TILE_W) tile of the coverage mask.

    params_ref: [N, 8] float32 in SMEM — columns: ax, ay, bx, by, radius,
        valid, 0, 0 (pixel coordinates).
    mask_ref: [TILE_H, TILE_W] float32 output tile (1.0 = covered).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = (i * TILE_H).astype(jnp.float32)
    col0 = (j * TILE_W).astype(jnp.float32)

    py = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0
                                  ).astype(jnp.float32) + row0
    px = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1
                                  ).astype(jnp.float32) + col0

    n = params_ref.shape[0]

    def body(k, acc):
        ax = params_ref[k, 0]
        ay = params_ref[k, 1]
        bx = params_ref[k, 2]
        by = params_ref[k, 3]
        r = params_ref[k, 4]
        valid = params_ref[k, 5]

        # tile bounding-box cull: the capsule's AABB inflated by r
        lo_x = jnp.minimum(ax, bx) - r
        hi_x = jnp.maximum(ax, bx) + r
        lo_y = jnp.minimum(ay, by) - r
        hi_y = jnp.maximum(ay, by) + r
        intersects = jnp.logical_and(
            jnp.logical_and(hi_x >= col0, lo_x < col0 + TILE_W),
            jnp.logical_and(hi_y >= row0, lo_y < row0 + TILE_H))
        hit_tile = jnp.logical_and(intersects, valid > 0)

        def rasterize(acc):
            dx = bx - ax
            dy = by - ay
            len2 = dx * dx + dy * dy
            t = jnp.where(len2 > 0,
                          ((px - ax) * dx + (py - ay) * dy)
                          / jnp.maximum(len2, 1e-8), 0.0)
            t = jnp.clip(t, 0.0, 1.0)
            cx = ax + t * dx
            cy = ay + t * dy
            d2 = (px - cx) ** 2 + (py - cy) ** 2
            return jnp.maximum(acc, (d2 <= r * r).astype(jnp.float32))

        return jax.lax.cond(hit_tile, rasterize, lambda a: a, acc)

    acc = jax.lax.fori_loop(0, n, body, jnp.zeros((TILE_H, TILE_W),
                                                  jnp.float32))
    mask_ref[:] = acc


@functools.partial(jax.jit, static_argnames=('height', 'width', 'interpret'))
def splat_coverage_pallas(params: jax.Array, height: int, width: int,
                          interpret: bool = False) -> jax.Array:
    """Union coverage mask [height, width] (float 0/1) of N capsules.

    Args:
        params: [N, 8] float32: ax, ay, bx, by, radius, valid, _, _.
        height/width: image size; padded internally to tile multiples.

    Dispatch: the windowed single-cell kernel when the full mask fits VMEM
    (all benchmark resolutions), else the tiled AABB-cull kernel.
    """
    ph = (-height) % WIN_H
    pw = (-width) % WIN_W
    h, w = height + ph, width + pw

    if h * w <= _V2_MAX_PIXELS:
        mask = pl.pallas_call(
            _splat_kernel_windowed,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(params)
        return mask[:height, :width]

    ph = (-height) % TILE_H
    pw = (-width) % TILE_W
    h, w = height + ph, width + pw
    mask = pl.pallas_call(
        _splat_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid=(h // TILE_H, w // TILE_W),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((TILE_H, TILE_W),
                               lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params)
    return mask[:height, :width]


def pack_params(ax, ay, bx, by, radius, valid) -> jax.Array:
    """Stack per-drop scalars into the kernel's [N, 8] layout."""
    n = ax.shape[0]
    zeros = jnp.zeros((n,), jnp.float32)
    return jnp.stack([ax, ay, bx, by, radius,
                      valid.astype(jnp.float32), zeros, zeros],
                     axis=1).astype(jnp.float32)
