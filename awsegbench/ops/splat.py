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


# ---------------------------------------------------------------------------
# v3: batched-grid kernel — one program per image, chunk-vectorized math
# ---------------------------------------------------------------------------
#
# The v2 windowed kernel costs ~4.4 µs/drop: the [WIN_H, WIN_W] distance
# math, the SMEM scalar reads and the dynamic-window read-modify-write all
# sit inside one fori_loop iteration, serializing VPU work with scalar
# address computation. v3 splits them: the distance-field math for CHUNK
# drops runs as ONE vectorized [CHUNK, WIN_H, WIN_W] op sequence (leading
# dim unrolled by Mosaic without loop-carried dependencies), and only the
# per-drop window max-RMW remains serial. Drops are compacted (valid first)
# and y-sorted on the XLA side so the dynamic chunk loop runs
# ceil(n_valid/CHUNK) iterations, not N/CHUNK.

_CHUNK = 32
_SLOTS = 512          # MAX_RAIN_DROPS=500 padded to a _CHUNK multiple


def _splat_kernel_batched(nvalid_ref, params_ref, winpos_ref, mask_ref):
    """One image's coverage mask (blocked refs carry a leading size-1 dim).

    nvalid_ref: [B] int32 scalar-prefetch — number of valid
        (compacted-front) drops per image.
    params_ref: [1, SLOTS, 8] f32 VMEM — ax, ay, bx, by, r, valid, y0f, x0f.
    winpos_ref: [1, SLOTS, 2] int32 SMEM — aligned window origin per drop
        (precomputed on the XLA side so scalar RMW addressing and vector
        math use identical values).
    mask_ref: [1, H, W] f32 VMEM output.
    """
    _, h, w = mask_ref.shape
    mask_ref[0] = jnp.zeros((h, w), jnp.float32)

    wy = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, WIN_H, WIN_W), 1)
    wx = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, WIN_H, WIN_W), 2)

    n_valid = nvalid_ref[pl.program_id(0)]
    n_chunks = pl.cdiv(n_valid, _CHUNK)

    def chunk_body(ci, _):
        base = pl.multiple_of(ci * _CHUNK, _CHUNK)
        p = params_ref[0, pl.ds(base, _CHUNK), :]       # [CHUNK, 8]
        ax = p[:, 0:1][:, :, None]
        ay = p[:, 1:2][:, :, None]
        bx = p[:, 2:3][:, :, None]
        by = p[:, 3:4][:, :, None]
        r = p[:, 4:5][:, :, None]
        valid = p[:, 5:6][:, :, None]
        y0f = p[:, 6:7][:, :, None]
        x0f = p[:, 7:8][:, :, None]

        py = wy.astype(jnp.float32) + y0f
        px = wx.astype(jnp.float32) + x0f

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

        for c in range(_CHUNK):                          # static unroll
            @pl.when(base + c < n_valid)
            def _():
                y0 = winpos_ref[0, base + c, 0]
                x0 = winpos_ref[0, base + c, 1]
                y0 = pl.multiple_of(y0, 8)
                x0 = pl.multiple_of(x0, 128)
                win = mask_ref[0, pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)]
                mask_ref[0, pl.ds(y0, WIN_H), pl.ds(x0, WIN_W)] = (
                    jnp.maximum(win, hit[c]))
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def prepare_splat_batch(ax, ay, bx, by, radius, valid, height: int,
                        width: int):
    """XLA-side prep for the batched kernel (per image; vmap over batch).

    Compacts valid drops to the front (stable sort on the aligned window
    row, invalid slots pushed to the end), precomputes aligned window
    origins, and pads the slot axis to a _CHUNK multiple.

    Returns (n_valid [int32], params [SLOTS, 8] f32, winpos [SLOTS, 2] i32).
    """
    n = ax.shape[0]
    lo_x = jnp.minimum(ax, bx) - radius
    lo_y = jnp.minimum(ay, by) - radius
    y0 = jnp.clip((lo_y.astype(jnp.int32) // 8) * 8, 0, height - WIN_H)
    x0 = jnp.clip((lo_x.astype(jnp.int32) // 128) * 128, 0, width - WIN_W)

    key = jnp.where(valid, y0, jnp.int32(1 << 30))
    order = jnp.argsort(key, stable=True)

    def take(v):
        return v[order]

    ax, ay, bx, by = take(ax), take(ay), take(bx), take(by)
    radius, valid = take(radius), take(valid)
    y0, x0 = take(y0), take(x0)

    params = jnp.stack([ax, ay, bx, by, radius, valid.astype(jnp.float32),
                        y0.astype(jnp.float32), x0.astype(jnp.float32)],
                       axis=1)
    winpos = jnp.stack([y0, x0], axis=1)

    pad = _SLOTS - n
    if pad < 0:
        raise ValueError(f"drop count {n} exceeds {_SLOTS} slots")
    if pad:
        params = jnp.pad(params, ((0, pad), (0, 0)))
        winpos = jnp.pad(winpos, ((0, pad), (0, 0)))
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return n_valid, params.astype(jnp.float32), winpos.astype(jnp.int32)


def splat_coverage_batched(n_valid: jax.Array, params: jax.Array,
                           winpos: jax.Array, height: int, width: int,
                           interpret: bool = False) -> jax.Array:
    """Union coverage masks for a batch of images.

    Args:
        n_valid: [B] int32; params: [B, SLOTS, 8] f32; winpos: [B, SLOTS, 2]
        int32 — from ``vmap(prepare_splat_batch)``.
    Returns [B, height, width] float 0/1. Requires height % 8 == 0,
    width % 128 == 0, height ≥ WIN_H, width ≥ WIN_W and the mask to fit
    VMEM (callers fall back to the XLA scan path otherwise).
    """
    b = params.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # n_valid [B] — whole array to every program
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, _SLOTS, 8), lambda i, nv: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SLOTS, 2), lambda i, nv: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, height, width), lambda i, nv: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        _splat_kernel_batched,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, height, width), jnp.float32),
        interpret=interpret,
    )(n_valid.astype(jnp.int32), params, winpos)


def batched_splat_supported(height: int, width: int) -> bool:
    return (height % 8 == 0 and width % 128 == 0
            and height >= WIN_H and width >= WIN_W
            and height * width <= _V2_MAX_PIXELS)
