"""Fused bilinear-upsample + 3×3 conv (the faithful-head hot op).

The reference's SegFormer head path bilinearly upsamples stage-4 features
(×32) to full input resolution and then runs a 3×3 conv over them
(reference model.py:209-214). Computed literally, that conv does
``9·C_in`` MACs per output element on a tensor that is itself a *linear*
function of the coarse features — at 512×1024/B8 it is the single most
expensive op in the faithful eval step (~60 ms measured, ~5 TFLOP).

Because both ops are linear, ``conv3x3(upsample_r(f))`` collapses: every
fine pixel of the upsampled field depends on ≤2 coarse pixels per axis, so
the composition is, per phase ``p ∈ [0,r)²``, a tiny (≤3×3-tap) conv over
the *coarse* grid. This module evaluates it in three cheap stages:

1. ``P[ky,kx] = f · W[ky,kx]`` — 9 channel-mixing matmuls on the COARSE
   grid (MXU, ~0.1% of the naive FLOPs).
2. A phase-weighted pass along y: ``S = Σ_{ky,dy} A[p,ky,dy]·P`` — 9 MACs
   per (coarse-x, fine-y) element.
3. The same pass along x → fine output. Total fine-grid work is 9 MACs
   per output element instead of ``9·C_in`` — the op becomes HBM-bound
   (one full-res write) instead of MXU-bound.

Numerics: identical up to float reassociation (the sum over
``(dy,dx,ky,kx,c)`` is regrouped); parity with the literal composition is
pinned by tests/test_upconv.py at f32 (≤1e-5) and bf16 tolerances.

Edge handling is exact:
* ``jax.image.resize(method='linear')`` clamps out-of-range source taps to
  the edge (its renormalized kernel is algebraically identical to
  clamp-to-edge for the 2-tap case) — reproduced by clamped gathers.
* The conv's SAME zero padding affects only the outermost fine row/column
  on each side; those four strips are recomputed exactly from 1-D
  upsamples of the border rows/cols and pasted over the main field.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _phase_table(r: int) -> np.ndarray:
    """A[p, k, d]: weight of coarse offset d-1 ∈ {-1,0,1} for conv tap
    k ∈ {0,1,2} at fine phase p ∈ [0, r).

    Derived from half-pixel bilinear sampling: the conv tap at fine index
    ``r·i + p + (k-1)`` reads the upsampled field at source coordinate
    ``s = (p + k - 1 + 0.5)/r - 0.5`` relative to coarse cell i, i.e.
    coarse taps ``floor(s)`` and ``floor(s)+1`` with weights
    ``(1-frac, frac)`` — both always within offset {-1, 0, +1}.
    """
    A = np.zeros((r, 3, 3), np.float64)
    for p in range(r):
        for k in range(3):
            s = (p + k - 1 + 0.5) / r - 0.5
            i0 = int(np.floor(s))
            frac = s - i0
            A[p, k, i0 + 1] += 1.0 - frac
            A[p, k, i0 + 2] += frac
    return A


@functools.lru_cache(maxsize=None)
def _up1d_table(r: int) -> np.ndarray:
    """U[p, d]: 1-D bilinear upsample weight of coarse offset d-1 for
    fine phase p (interior formula; callers clamp the gather indices)."""
    U = np.zeros((r, 3), np.float64)
    for p in range(r):
        s = (p + 0.5) / r - 0.5
        i0 = int(np.floor(s))
        frac = s - i0
        U[p, i0 + 1] += 1.0 - frac
        U[p, i0 + 2] += frac
    return U


def _shift_gather(x: jax.Array, axis: int) -> jax.Array:
    """Stack x shifted by {-1, 0, +1} along ``axis`` (clamped at the ends)
    as a new trailing-of-axis dimension: shape[axis] → (shape[axis], 3).

    Built from slices + concat, NOT ``jnp.take``: a constant-index gather
    lowers ~20× off the copy floor on TPU (measured 4.9 ms for the
    [B,16,32,81,1024] pp build vs ~1 ms as copies), and — worse — its
    VJP is a scatter-add, which serialized the train-head backward's
    dpp→df reduction. Slice/concat VJPs are dense pads and adds."""
    n = x.shape[axis]

    def sl(lo, hi):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, hi)
        return x[tuple(idx)]

    left = jnp.concatenate([sl(0, 1), sl(0, n - 1)], axis)    # i-1, clamped
    right = jnp.concatenate([sl(1, n), sl(n - 1, n)], axis)   # i+1, clamped
    return jnp.stack([left, x, right], axis=axis + 1)


def _upsample1d(row: jax.Array, r: int, axis: int) -> jax.Array:
    """Exact 1-D bilinear ×r upsample (half-pixel, clamped) along ``axis``."""
    U = jnp.asarray(_up1d_table(r), row.dtype)
    g = _shift_gather(row, axis)  # [..., n, 3, ...]
    g = jnp.moveaxis(g, axis + 1, -1)  # taps last
    # f32 rows must not ride the MXU's single-pass bf16 mode (border-strip
    # parity); bf16 production rows keep the plain pass.
    prec = (jax.lax.Precision.HIGHEST if row.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out = jnp.einsum('...d,pd->...p', g, U,
                     precision=prec)  # [..., n, (trail), p]
    # interleave phase into the spatial axis
    out = jnp.moveaxis(out, -1, axis + 1)  # [..., n, p, ...]
    shape = list(out.shape)
    shape[axis:axis + 2] = [shape[axis] * r]
    return out.reshape(shape)


def upsample_conv3x3(f: jax.Array, kernel: jax.Array, bias=None,
                     scale: int = 32,
                     precision=None) -> jax.Array:
    """conv3x3_SAME(bilinear_upsample_×scale(f)) without materializing the
    upsampled field's conv input twice or running the conv at full res.

    Args:
        f: coarse features [B, h, w, C_in].
        kernel: conv kernel [3, 3, C_in, C_out] (flax nn.Conv layout).
        bias: optional [C_out].
        scale: integer upsample factor ≥ 4 per axis.

    Returns:
        [B, h·scale, w·scale, C_out], numerically equal (mod float
        reassociation) to
        ``conv3x3(jax.image.resize(f, (H, W), 'linear'))``.
    """
    if scale < 4:
        raise ValueError(f"upsample_conv3x3 requires scale >= 4, got {scale}")
    b, h, w, cin = f.shape
    if kernel.shape[:2] != (3, 3):
        raise ValueError(f"kernel must be 3x3, got {kernel.shape}")
    cout = kernel.shape[-1]
    r = scale
    dtype = f.dtype
    A = jnp.asarray(_phase_table(r), dtype)

    # 1. coarse partial products: P[b,h,w,ky,kx,O]
    P = jnp.einsum('bhwc,yxcO->bhwyxO', f, kernel.astype(dtype),
                   precision=precision,
                   preferred_element_type=jnp.float32).astype(dtype)

    # 2. y-pass: S[b, h, p, w, kx, O] = Σ_{ky,dy} A[p,ky,dy]·P[b,h+dy,w,ky,kx,O]
    Ph = _shift_gather(P, 1)  # [b,h,3(dy),w,ky,kx,O]
    S = jnp.einsum('pkd,bhdwkxO->bhpwxO', A, Ph, precision=precision,
                   preferred_element_type=jnp.float32).astype(dtype)
    S = S.reshape(b, h * r, w, 3, cout)  # fine y

    # 3. x-pass: out[b, Y, w, q, O] = Σ_{kx,dx} A[q,kx,dx]·S[b,Y,w+dx,kx,O]
    Sx = _shift_gather(S, 2)  # [b,Y,w,3(dx),3(kx),O]
    out = jnp.einsum('qkd,bywdkO->bywqO', A, Sx, precision=precision,
                     preferred_element_type=jnp.float32).astype(dtype)
    out = out.reshape(b, h * r, w * r, cout)

    # 4. exact zero-padded borders. For r ≥ 4 the first two / last two fine
    # rows of the upsampled field equal the 1-D x-upsample of the first /
    # last coarse row (both bilinear taps clamp), so the border conv
    # collapses to a 1-D conv of a 1-D upsample.
    k = kernel.astype(dtype)
    W2 = {
        'top': k[1] + k[2],      # ky ∈ {1,2}; ky=0 tap is the zero pad
        'bot': k[0] + k[1],
        'left': k[:, 1] + k[:, 2],
        'right': k[:, 0] + k[:, 1],
    }

    def border1d(line: jax.Array, w2: jax.Array) -> jax.Array:
        """1-D zero-padded 3-tap conv of a fine line [b, N, cin] with
        w2 [3, cin, O]."""
        pad = jnp.pad(line, ((0, 0), (1, 1), (0, 0)))
        g = jnp.stack([pad[:, :-2], pad[:, 1:-1], pad[:, 2:]], axis=2)
        return jnp.einsum('bntc,tcO->bnO', g, w2, precision=precision,
                          preferred_element_type=jnp.float32).astype(dtype)

    top = border1d(_upsample1d(f[:, 0], r, 1), W2['top'])        # [b, W, O]
    bot = border1d(_upsample1d(f[:, -1], r, 1), W2['bot'])
    left = border1d(_upsample1d(f[:, :, 0], r, 1), W2['left'])   # [b, H, O]
    right = border1d(_upsample1d(f[:, :, -1], r, 1), W2['right'])

    out = out.at[:, 0].set(top)
    out = out.at[:, -1].set(bot)
    out = out.at[:, :, 0].set(left)
    out = out.at[:, :, -1].set(right)

    if bias is not None:
        out = out + bias.astype(dtype)
    return out
