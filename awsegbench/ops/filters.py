"""Image filtering primitives in pure JAX (XLA-fused).

These replace the reference's OpenCV/scipy CPU calls
(preprocessing.py:166,200,243,276-277,357: ``cv2.GaussianBlur``,
``scipy.ndimage.gaussian_filter``, ``cv2.filter2D`` box filter,
``cv2.Laplacian``) with batched on-device convolutions. All filters operate
on NHWC float arrays; boundary handling matches the originals:

* OpenCV default border = BORDER_REFLECT_101 → ``jnp.pad(mode='reflect')``
* scipy.ndimage default mode='reflect' (edge included) → ``mode='symmetric'``
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

BoundaryMode = Literal['reflect', 'symmetric', 'edge']


def gaussian_kernel1d_scipy(sigma: float, radius: int | None = None) -> np.ndarray:
    """Gaussian taps identical to scipy.ndimage._gaussian_kernel1d (truncate=4)."""
    if radius is None:
        radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x ** 2)
    return (phi / phi.sum()).astype(np.float32)


def gaussian_kernel1d_cv(ksize: int, sigma: float) -> np.ndarray:
    """Gaussian taps identical to cv2.getGaussianKernel(ksize, sigma)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    phi = np.exp(-(x ** 2) / (2.0 * sigma * sigma))
    return (phi / phi.sum()).astype(np.float32)


def _depthwise_conv_axis(x: jax.Array, taps: jax.Array, axis: int,
                         mode: BoundaryMode) -> jax.Array:
    """Depthwise 1-D correlation along H (axis=1) or W (axis=2) of NHWC x.

    Implemented as k shifted multiply-adds (XLA fuses them into one VPU
    pass) rather than ``lax.conv feature_group_count=C``: image tensors
    here have C ∈ {1, 3}, and TPU grouped convs pad each group to the full
    128-lane tile — a ~40× compute/memory blow-up that made these blurs the
    hottest ops in the corruption engine (measured 18 ms for three 3-channel
    blurs at [8,512,1024] vs ~2 ms as shifted adds).
    """
    k = taps.shape[0]
    pad = k // 2
    pad_widths = [(0, 0)] * 4
    pad_widths[axis] = (pad, pad)
    xp = jnp.pad(x, pad_widths, mode=mode)
    n = x.shape[axis]
    taps = taps.astype(x.dtype)
    out = None
    for i in range(k):
        sl = [slice(None)] * 4
        sl[axis] = slice(i, i + n)
        term = xp[tuple(sl)] * taps[i]
        out = term if out is None else out + term
    return out


def separable_filter(x: jax.Array, taps_h: jax.Array, taps_w: jax.Array,
                     mode: BoundaryMode = 'reflect') -> jax.Array:
    """Apply a separable filter (rows then cols) to NHWC ``x``."""
    y = _depthwise_conv_axis(x, jnp.asarray(taps_h), axis=1, mode=mode)
    y = _depthwise_conv_axis(y, jnp.asarray(taps_w), axis=2, mode=mode)
    return y


def gaussian_blur_cv(x: jax.Array, ksize: int, sigma: float) -> jax.Array:
    """cv2.GaussianBlur(img, (ksize, ksize), sigma) on NHWC batches."""
    taps = jnp.asarray(gaussian_kernel1d_cv(ksize, sigma))
    return separable_filter(x, taps, taps, mode='reflect')


def gaussian_filter_scipy(x: jax.Array, sigma: float) -> jax.Array:
    """scipy.ndimage.gaussian_filter(img, sigma) on NHWC batches."""
    taps = jnp.asarray(gaussian_kernel1d_scipy(sigma))
    return separable_filter(x, taps, taps, mode='symmetric')


def box_filter(x: jax.Array, ksize: int = 5) -> jax.Array:
    """cv2.filter2D with a normalized ksize×ksize ones kernel (local mean).

    Direct (non-separable) 2-D conv: matches cv2's direct filtering to fp32
    epsilon, where a separable two-pass 1/k·1/k would double-round.
    """
    pad = ksize // 2
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode='reflect')
    h, w = x.shape[1], x.shape[2]
    inv = jnp.asarray(1.0 / (ksize * ksize), x.dtype)
    out = None
    # direct 2-D sum as fused shifted adds (see _depthwise_conv_axis note)
    for dy in range(ksize):
        for dx in range(ksize):
            term = xp[:, dy:dy + h, dx:dx + w, :]
            out = term if out is None else out + term
    return out * inv


_LAPLACIAN_K1 = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float32)


def laplacian(x: jax.Array) -> jax.Array:
    """cv2.Laplacian(gray, ksize=1) on NHWC (usually C=1) batches."""
    pad_widths = [(0, 0), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad_widths, mode='reflect')
    h, w = x.shape[1], x.shape[2]
    # ∇² = up + down + left + right − 4·center, fused shifted adds
    return (xp[:, 0:h, 1:w + 1, :] + xp[:, 2:h + 2, 1:w + 1, :]
            + xp[:, 1:h + 1, 0:w, :] + xp[:, 1:h + 1, 2:w + 2, :]
            - 4.0 * xp[:, 1:h + 1, 1:w + 1, :])


def rgb_to_gray_cv(x: jax.Array) -> jax.Array:
    """cv2.cvtColor(RGB2GRAY) weights: 0.299 R + 0.587 G + 0.114 B.

    Input NHWC RGB, output NHW1. (preprocessing.py:271,336)
    """
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def rgb_to_gray_cv_u8(x_u8: jax.Array) -> jax.Array:
    """Bit-exact cv2.cvtColor(RGB2GRAY) on uint8: fixed-point
    (R·4899 + G·9617 + B·1868 + 2^13) >> 14. Input NHWC uint8, output NHW1 uint8.
    """
    xi = x_u8.astype(jnp.int32)
    g = (xi[..., 0] * 4899 + xi[..., 1] * 9617 + xi[..., 2] * 1868 + (1 << 13)) >> 14
    return g.astype(jnp.uint8)[..., None]


def local_contrast(gray: jax.Array, ksize: int = 5) -> jax.Array:
    """Local contrast = sqrt(boxmean((g - boxmean(g))^2)).

    Mirrors reference preprocessing.py:274-278 (5×5 box filter variance).
    Input/output NHW1.
    """
    mean = box_filter(gray, ksize)
    var = box_filter((gray - mean) ** 2, ksize)
    return jnp.sqrt(var)


@functools.partial(jax.jit, static_argnames=('q',))
def percentile(x: jax.Array, q: float) -> jax.Array:
    """np.percentile with linear interpolation over the flattened array."""
    return jnp.percentile(x.reshape(-1), q)


def depthwise_conv3x3(x: jax.Array, kernel: jax.Array,
                      dilation: int = 1) -> jax.Array:
    """Depthwise 3×3 SAME conv as 9 shifted multiply-adds.

    Numerically matches ``nn.Conv(C, (3,3), feature_group_count=C)`` with
    kernel layout [3, 3, 1, C] (correlation, zero padding, f32
    accumulation). Use ONLY for small channel counts: it wins when the
    grouped conv's lane padding dominates (C ∈ {1,3} image filters) and
    LOSES for lane-aligned C ≥ 128 (measured: MiT encoder 7.3 → 9.3 ms,
    DeepLabV3+ 16.3 → 17.7 ms when swapped in — XLA's native depthwise is
    already fine there).
    """
    d = dilation
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x.astype(dt), [(0, 0), (d, d), (d, d), (0, 0)])
    k = kernel.astype(dt)
    out = None
    for ty in range(3):
        for tx in range(3):
            sl = xp[:, ty * d:ty * d + h, tx * d:tx * d + w, :]
            term = sl.astype(jnp.float32) * k[ty, tx, 0].astype(jnp.float32)
            out = term if out is None else out + term
    return out.astype(dt)
