"""Pallas TPU kernels fusing the faithful head pipelines end-to-end.

The faithful SegFormer head path (reference model.py:209-221) is, per head:

    upsample×32 → conv3×3 → BN → ReLU → [dropout] → conv1×1        (seg)
    upsample×32 → conv3×3 → BN → ReLU → conv3×3 → BN → ReLU → conv1×1
                                                          → sigmoid (depth)

``ops/upconv.py`` collapses upsample∘conv3×3 algebraically (phase
decomposition); these kernels additionally fuse the *whole* head per
output tile so the full-resolution 256/128-channel hidden activations live
only in VMEM — HBM sees one coarse partial-product read and one
``num_classes``/1-channel write. At [8,512,1024] that replaces ~4 GB of
intermediate traffic per head with ~0.5 GB.

Per program (a row-chunk of ``chunk`` coarse cells → an [r, chunk·r]
output tile; chunking amortizes the ~1 µs/program grid overhead):
1. load the 3×3-neighborhood stack of coarse partial products
   ``P[ky,kx] = f·W1[ky,kx]`` (built once in XLA, ~0.1% of naive FLOPs),
2. y-phase pass as ONE [r,9]×[9,chunk·9C] matmul, x-phase pass as a
   batched dot_general → fine conv1 output in [(p,cell), C, q] layout,
3. folded BN affine + ReLU (eval-mode running stats),
4. (depth) 3×3 conv2 as 9 shifted dot_generals over per-cell
   1-pixel-haloed [r+2, r+2] extents, BN2 + ReLU,
5. 1×1 projection matmul (+ sigmoid for depth), store the tile.

Border exactness WITHOUT in-kernel masking: coarse-edge clamping is baked
into the neighbor gather, and the 3×3 convs' SAME zero padding only
affects the outermost fine lines of the *output* (seg: 1 px; depth: 2 px
via conv2's halo). Those strips are recomputed exactly in XLA from 1-D
upsamples / 2-coarse-line ``upsample_conv3x3`` slices and pasted over the
kernel output. Output equals the unfused composition to
accumulation-order tolerance (tests/test_headkernels.py, interpreter mode
on CPU).

Eval-mode only (BN running stats; dropout is identity) — training keeps
the XLA path, which shares the same parameters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .upconv import _shift_gather, _upsample1d, upsample_conv3x3


# ---------------------------------------------------------------------------
# phase tables
# ---------------------------------------------------------------------------

def _u(p: float, r: int) -> list[tuple[int, float]]:
    """Bilinear taps (coarse offset d ∈ {-1,0,1}, weight) for fine phase p
    (p may be −1..r relative to a coarse cell; half-pixel centers)."""
    s = (p + 0.5) / r - 0.5
    i0 = int(np.floor(s))
    frac = s - i0
    return [(i0, 1.0 - frac), (i0 + 1, frac)]


@functools.lru_cache(maxsize=None)
def _a2(r: int, lo: int, hi: int) -> np.ndarray:
    """A[p − lo, 3k + d]: weight of coarse offset d−1 for conv tap k at
    fine phase p ∈ [lo, hi) — tap-major (the y-pass / pp 9-group order)."""
    A = np.zeros((hi - lo, 9), np.float32)
    for p in range(lo, hi):
        for k in range(3):
            for d, wgt in _u(p + k - 1, r):
                A[p - lo, 3 * k + (d + 1)] += wgt
    return A


@functools.lru_cache(maxsize=None)
def _a2_dmajor(r: int, lo: int, hi: int) -> np.ndarray:
    """A[p − lo, 3d + k]: offset-major variant (the x-pass 9-group is
    (dx·3 + kx), see ``_neighbor_pp``)."""
    A = np.zeros((hi - lo, 9), np.float32)
    for p in range(lo, hi):
        for k in range(3):
            for d, wgt in _u(p + k - 1, r):
                A[p - lo, 3 * (d + 1) + k] += wgt
    return A


# ---------------------------------------------------------------------------
# XLA-side prep
# ---------------------------------------------------------------------------

def _pick_chunk(w: int, c1: int) -> int:
    """Cells per program: enough to amortize grid overhead, small enough
    for VMEM (the fine tile is r·chunk·r·c1 in f32)."""
    for c in (4, 2, 1):
        if w % c == 0:
            return c
    return 1


def _neighbor_pp(f: jax.Array, kernel: jax.Array, chunk: int) -> jax.Array:
    """Coarse partial products with 3×3-neighborhood stacking, chunked.

    f [B,h,w,Cin], kernel [3,3,Cin,C] →
    [B, h, w/chunk, 81 ((3ky+dy)·9 + 3dx+kx), chunk·C] in f.dtype —
    the RHS of the joint-phase matmul (kron(Ay, Ax) is the LHS).
    """
    dtype = f.dtype
    # f32 inputs must not ride XLA's truncated default dot path (CPU ~1e-3);
    # bf16 production inputs keep the plain MXU pass.
    prec = (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)
    P = jnp.einsum('bhwc,yxcO->bhwyxO', f, kernel.astype(dtype),
                   precision=prec,
                   preferred_element_type=jnp.float32).astype(dtype)
    P = _shift_gather(P, 1)   # [b,h,3dy,w,ky,kx,C]
    P = _shift_gather(P, 3)   # [b,h,3dy,w,3dx,ky,kx,C]
    b, h, _, w, _, _, _, c = P.shape
    # → [b, h, w, ky, dy, dx, kx, C]
    P = P.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    # chunk cells: [b, h, wc, chunk, 81, C] → [b, h, wc, 81, chunk, C]
    P = P.reshape(b, h, w // chunk, chunk, 81, c)
    P = P.transpose(0, 1, 2, 4, 3, 5)
    return P.reshape(b, h, w // chunk, 81, chunk * c)


@functools.lru_cache(maxsize=None)
def _ayx(r: int, ext: bool) -> np.ndarray:
    """Joint-phase table: kron(Ay, Ax) [rp·rq, 81] with rows (p·rq + q) and
    columns ((3ky+dy)·9 + 3dx+kx) — matches ``_neighbor_pp``'s 81-group.
    ``ext`` extends both phase ranges by the 1-px halo (depth conv2)."""
    lo, hi = (-1, r + 1) if ext else (0, r)
    Ay = _a2(r, lo, hi)          # columns (3ky + dy) → kron major group
    Ax = _a2_dmajor(r, lo, hi)   # columns (3dx + kx) → kron minor group
    return np.kron(Ay, Ax).astype(np.float32)


def _bn_fold(bias, scale, offset, mean, var, eps):
    """Fold conv bias + eval-mode BN into one affine (a, c): y = x·a + c."""
    a = scale / jnp.sqrt(var + eps)
    c = offset - mean * a + (0.0 if bias is None else bias) * a
    return a, c


def _rep2(v):
    return v.astype(jnp.float32)[None]


# ---------------------------------------------------------------------------
# segmentation head
# ---------------------------------------------------------------------------

def _seg_kernel(ayx_ref, pp_ref, a1_ref, c1_ref, wp_ref, bp_ref,
                out_ref, *, r: int, c1: int, nc: int, chunk: int):
    f32 = jnp.float32
    mm_dtype = out_ref.dtype if out_ref.dtype == jnp.bfloat16 else f32

    w3 = pp_ref[0, 0, 0]                                  # [81, chunk·C]
    # both phase passes at once: fine[(p,q), (cell,C)]
    fine = jnp.dot(ayx_ref[:].astype(mm_dtype), w3.astype(mm_dtype),
                   preferred_element_type=f32)            # [r·r, chunk·C]
    hidden = jnp.maximum(fine * a1_ref[0][None, :]
                         + c1_ref[0][None, :], 0.0).astype(mm_dtype)
    for cell in range(chunk):
        hcell = hidden[:, cell * c1:(cell + 1) * c1]      # [r·r, C]
        logits = jnp.dot(hcell, wp_ref[:].astype(mm_dtype),
                         preferred_element_type=f32)      # [r·r, nc]
        logits = logits + bp_ref[0][None, :]
        out_ref[0, :, cell * r:(cell + 1) * r, :] = (
            logits.reshape(r, r, nc).astype(out_ref.dtype))


def seg_head_fused(f: jax.Array, conv1_kernel: jax.Array,
                   conv1_bias: jax.Array,
                   bn_scale, bn_bias, bn_mean, bn_var, bn_eps: float,
                   proj_kernel: jax.Array, proj_bias: jax.Array,
                   scale: int = 32, interpret: bool = False) -> jax.Array:
    """Fused faithful seg head: conv3×3(upsample×scale(f)) → BN → ReLU →
    conv1×1. Eval mode. Returns [B, h·scale, w·scale, nc] in f.dtype."""
    b, h, w, cin = f.shape
    c1 = conv1_kernel.shape[-1]
    nc = proj_kernel.shape[-1]
    r = scale
    chunk = _pick_chunk(w, c1)

    pp = _neighbor_pp(f, conv1_kernel, chunk)
    a1, c1b = _bn_fold(conv1_bias, bn_scale, bn_bias, bn_mean, bn_var, bn_eps)
    wp = proj_kernel.reshape(c1, nc)
    ayx = jnp.asarray(_ayx(r, False))
    a1t = jnp.tile(a1.astype(jnp.float32), chunk)[None]
    c1t = jnp.tile(c1b.astype(jnp.float32), chunk)[None]

    kernel = functools.partial(_seg_kernel, r=r, c1=c1, nc=nc, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, w // chunk),
        in_specs=[
            pl.BlockSpec((r * r, 81), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 81, chunk * c1),
                         lambda bb, i, j: (bb, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk * c1), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk * c1), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, nc), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, chunk * r, nc),
                               lambda bb, i, j: (bb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * r, w * r, nc), f.dtype),
        interpret=interpret,
    )(ayx, pp, a1t, c1t, wp, _rep2(proj_bias))

    return _paste_seg_borders(out, f, conv1_kernel, a1, c1b, wp,
                              proj_bias, r)


def _conv1_border_lines(f, kernel, r):
    """Exact pre-BN, bias-free conv1 values on the four 1-px fine border
    lines: the outer fine lines of the upsampled field equal the 1-D
    upsample of the outer coarse line (both bilinear taps clamp), so the
    border conv collapses to a 1-D conv with k-summed taps (the out-of-
    image tap row/col is the conv's zero padding). Returns [B, N, c1]
    strips, zero-padded in N."""
    dtype = f.dtype
    k = kernel.astype(dtype)
    W2 = {
        'top': k[1] + k[2],
        'bot': k[0] + k[1],
        'left': k[:, 1] + k[:, 2],
        'right': k[:, 0] + k[:, 1],
    }

    # f32 operands must request HIGHEST or XLA routes this einsum through
    # the MXU's single-pass bf16 mode (~1e-3 max error on the strips — the
    # r4 on-chip depth forward-parity failure lived HERE, not in the
    # Pallas core); bf16 production inputs keep the plain MXU pass.
    prec = (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)

    def border1d(line, w2):
        pad = jnp.pad(line, ((0, 0), (1, 1), (0, 0)))
        g = jnp.stack([pad[:, :-2], pad[:, 1:-1], pad[:, 2:]], axis=2)
        return jnp.einsum('bntc,tcO->bnO', g, w2, precision=prec,
                          preferred_element_type=jnp.float32).astype(dtype)

    return {
        'top': border1d(_upsample1d(f[:, 0], r, 1), W2['top']),
        'bot': border1d(_upsample1d(f[:, -1], r, 1), W2['bot']),
        'left': border1d(_upsample1d(f[:, :, 0], r, 1), W2['left']),
        'right': border1d(_upsample1d(f[:, :, -1], r, 1), W2['right']),
    }


def _paste_seg_borders(out, f, conv1_kernel, a1, c1b, wp, bp, r):
    """Overwrite the four 1-px border lines with exact zero-padded values."""
    dtype = out.dtype
    lines = _conv1_border_lines(f, conv1_kernel, r)

    prec = (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)

    def head_tail(pre):  # [B, N, c1] pre-BN conv1 (bias folded into c1b)
        hdn = jnp.maximum(pre.astype(jnp.float32) * a1[None, None, :]
                          + c1b[None, None, :], 0.0)
        return (jnp.einsum('bnc,cO->bnO', hdn.astype(dtype),
                           wp.astype(dtype), precision=prec,
                           preferred_element_type=jnp.float32)
                + bp).astype(dtype)

    out = out.at[:, 0].set(head_tail(lines['top']))
    out = out.at[:, -1].set(head_tail(lines['bot']))
    out = out.at[:, :, 0].set(head_tail(lines['left']))
    out = out.at[:, :, -1].set(head_tail(lines['right']))
    return out


def pallas_heads_available() -> bool:
    """Fused head kernels run on real TPU backends only."""
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:  # pragma: no cover
        return False
