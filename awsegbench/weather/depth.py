"""Heuristic monocular depth estimation (on-device).

JAX port of the reference ``DepthEstimationPreprocessor``
(preprocessing.py:291-410): vertical perspective gradient + sky/road masks +
Laplacian texture cue + Gaussian smoothing; depth→disparity; resize/normalize
for training. Runs batched inside the jitted data path instead of per-sample
in DataLoader workers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.filters import gaussian_filter_scipy, laplacian, rgb_to_gray_cv_u8
from ..ops.resize import resize_bilinear


def estimate_depth(image_u8: jax.Array) -> jax.Array:
    """Geometric depth estimate for one [H, W, 3] uint8 RGB image.

    Mirrors preprocessing.py:323-367:
      base = y/h·0.8 + 0.2; sky (top third) → 1.0; road (bottom half) → ×0.5;
      depth −= 0.3·|Laplacian(gray)|/max; clip [0,1]; gaussian_filter σ=2.
    Returns [H, W] float32 in [0, 1].
    """
    h, w = image_u8.shape[:2]
    gray = rgb_to_gray_cv_u8(image_u8[None]).astype(jnp.float32)  # [1, H, W, 1]

    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    base = jnp.broadcast_to(rows / h * 0.8 + 0.2, (h, w))

    sky = rows < (h // 3)          # [:h//3] rows
    road = rows >= (h // 2)        # [h//2:] rows
    depth = jnp.where(jnp.broadcast_to(sky, (h, w)), 1.0, base)
    depth = jnp.where(jnp.broadcast_to(road, (h, w)), depth * 0.5, depth)

    texture = laplacian(gray)[0, :, :, 0]
    texture_strength = jnp.abs(texture) / (jnp.max(jnp.abs(texture)) + 1e-8)
    depth = jnp.clip(depth - 0.3 * texture_strength, 0.0, 1.0)

    depth = gaussian_filter_scipy(depth[None, :, :, None], sigma=2.0)[0, :, :, 0]
    # The Gaussian is a convex combination of in-[0,1] values, so this clip
    # is a mathematical no-op — it only strips the ≤1-ulp excursions FMA
    # contraction in the shifted-add filter can introduce (keeps the
    # documented [0,1] output contract exact).
    return jnp.clip(depth, 0.0, 1.0)


def estimate_depth_batch(images_u8: jax.Array) -> jax.Array:
    """Batched depth estimate: [B, H, W, 3] uint8 → [B, H, W] float32."""
    return jax.vmap(estimate_depth)(images_u8)


def depth_to_disparity(depth: jax.Array, baseline: float = 0.54) -> jax.Array:
    """disparity = baseline / max(depth, 1e-6) (preprocessing.py:369-384)."""
    return baseline / jnp.maximum(depth, 1e-6)


def preprocess_depth_for_training(depth: jax.Array,
                                  target_size: tuple[int, int]) -> jax.Array:
    """Resize + min-max normalize a depth map (preprocessing.py:386-410)."""
    if depth.shape != tuple(target_size):
        depth = resize_bilinear(depth, target_size)
    dmin, dmax = jnp.min(depth), jnp.max(depth)
    return (depth - dmin) / (dmax - dmin + 1e-8)
