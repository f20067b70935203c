"""Resize ops (cv2.resize / F.interpolate equivalents).

cv2.resize bilinear, torch F.interpolate(align_corners=False) and
``jax.image.resize(method='linear')`` all use half-pixel-center sampling, so
``jax.image.resize`` is the drop-in. Nearest matches cv2.INTER_NEAREST
within half-pixel rounding.
"""

from __future__ import annotations

import jax


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC (or HWC/HW) arrays to (H, W) = out_hw."""
    h, w = out_hw
    shape = list(x.shape)
    if x.ndim == 4:
        shape[1], shape[2] = h, w
    elif x.ndim == 3:
        shape[0], shape[1] = h, w
    elif x.ndim == 2:
        shape = [h, w]
    else:
        raise ValueError(f"resize_bilinear: unsupported ndim {x.ndim}")
    return jax.image.resize(x, shape, method='linear')


def resize_nearest(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize (labels) of NHWC/NHW/HW arrays."""
    h, w = out_hw
    shape = list(x.shape)
    if x.ndim == 4:
        shape[1], shape[2] = h, w
    elif x.ndim == 3:
        shape[0], shape[1] = h, w
    elif x.ndim == 2:
        shape = [h, w]
    else:
        raise ValueError(f"resize_nearest: unsupported ndim {x.ndim}")
    return jax.image.resize(x, shape, method='nearest')


def upsample_like(x: jax.Array, ref_hw: tuple[int, int]) -> jax.Array:
    """F.interpolate(..., size=ref_hw, mode='bilinear', align_corners=False)."""
    return resize_bilinear(x, ref_hw)
