"""Train-mode fused depth-head stage 1: Pallas forward + backward.

The faithful depth head (reference model.py:16-78, invoked at full
resolution by model.py:209-214) is

    conv3x3(upsample x32(f)) -> BN -> ReLU -> Dropout
        -> conv3x3 -> BN -> ReLU -> conv1x1 -> sigmoid

In training the dominant cost is stage 1 (everything up to and including
the second conv): the 128-channel full-res hidden is materialized, batch-
normalized with full-res f32 statistics, dropout-masked, and convolved —
and the backward re-reads all of it. This module fuses the
conv1/BN1/ReLU/dropout block into one Pallas kernel pair:

* **BN1 batch statistics in the coarse domain** — reuses
  ``headkernels_train.seg_batch_stats`` (phase-table contractions of the
  coarse partial products; border-exact). No full-res f32 stats passes.
* **Counter-based dropout** — the keep mask is a pure hash of the global
  (b, y, x, c) pixel index (`dropout_keep_mask`), so Pallas programs, the
  XLA border strips, the backward recompute, and CPU tests all draw THE
  SAME mask with no stored state and no stream to synchronize. The
  bitstream differs from ``nn.Dropout`` (stream identity is not part of
  the parity contract — the reference's torch stream differs from either;
  keep-rate and determinism are pinned by tests).
* **One materialized tensor** — the kernel writes the post-dropout hidden
  ``d1`` (bf16) once; conv2 then runs as a plain XLA convolution on it
  (pure MXU work, exact SAME zero-padding — no halo machinery needed).
  An earlier fully-fused conv2-in-kernel variant (9 `pltpu.roll`
  tap shifts per pass on the (r+2)^2 extended phase field) LOST ~40 ms
  at [8,512,1024]: in-VMEM shifted access costs cross-lane shuffles that
  XLA's own conv lowering avoids. Materializing d1 keeps every matmul
  shuffle-free.
* **Custom-VJP backward kernel** — recomputes z1 and the mask per tile
  from the coarse partial products (conv1 is ~1% of conv2's FLOPs), maps
  d(d1) -> d(pp) via the phase-table transpose, and accumulates the
  (1, C) BN1-affine gradients. conv2's backward (dgrad/wgrad) stays in
  XLA. The batch-stat coupling of BN1 differentiates through the XLA
  stats einsums; BN2's through the flax module in the head.
* **Image borders exact** — d1's outermost fine lines (conv1's zero-
  padded border) are recomputed in XLA from 1-D border strips
  (``headkernels._conv1_border_lines``) with the same affine + hash mask
  and pasted before conv2 — so h2, its gradients, AND BN2's batch
  statistics are exact everywhere.

Replaces the train-path capability of reference model.py:16-78 inside the
trainer hot loop (reference training/trainer.py:280-375).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .headkernels import _ayx, _conv1_border_lines, _neighbor_pp, _pick_chunk
from .headkernels_train import (_SEQ3, _core_params, _line_mask, _mm_prec,
                                _tile_keep, dropout_keep_mask, hash_keep,
                                image_seed, pixel_index, seg_batch_stats)

__all__ = ['depth_stage1_fused_train', 'dropout_keep_mask', 'hash_keep',
           'image_seed', 'pixel_index']


# ---------------------------------------------------------------------------
# kernels — seg-kernel tile structure ([r^2, chunk*C] flat phase layout)
# ---------------------------------------------------------------------------

def _z1_tile(ayx_ref, pp_ref, a1_ref, c1_ref, mm_dtype):
    f32 = jnp.float32
    w3 = pp_ref[0, 0, 0]                                  # [81, chunk*C]
    fine = jnp.dot(ayx_ref[:].astype(mm_dtype), w3.astype(mm_dtype),
                   precision=_mm_prec(mm_dtype),
                   preferred_element_type=f32)            # [r^2, chunk*C]
    return fine, fine * a1_ref[0][None, :] + c1_ref[0][None, :]


def _d1_fwd_kernel(seed_ref, ayx_ref, pp_ref, a1_ref, c1_ref, out_ref,
                   *, r, c1, chunk, H, W, rate, inv_keep):
    f32 = jnp.float32
    mm_dtype = out_ref.dtype if out_ref.dtype == jnp.bfloat16 else f32
    _, z1 = _z1_tile(ayx_ref, pp_ref, a1_ref, c1_ref, mm_dtype)
    u1 = jnp.maximum(z1, 0.0)
    if rate > 0.0:
        keep = _tile_keep(seed_ref[0], r, c1, chunk, H, W, rate)
        u1 = jnp.where(keep, u1 * inv_keep, 0.0)
    for cell in range(chunk):
        out_ref[0, :, cell * r:(cell + 1) * r, :] = (
            u1[:, cell * c1:(cell + 1) * c1].reshape(r, r, c1)
            .astype(out_ref.dtype))


def _d1_bwd_kernel(seed_ref, ayx_ref, pp_ref, a1_ref, c1_ref, dy_ref,
                   dpp_ref, da1_ref, dc1_ref,
                   *, r, c1, chunk, H, W, rate, inv_keep):
    f32 = jnp.float32
    mm_dtype = pp_ref.dtype if pp_ref.dtype == jnp.bfloat16 else f32

    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))

    @pl.when(first)
    def _():
        da1_ref[...] = jnp.zeros_like(da1_ref)
        dc1_ref[...] = jnp.zeros_like(dc1_ref)

    fine, z1 = _z1_tile(ayx_ref, pp_ref, a1_ref, c1_ref, mm_dtype)
    parts = [dy_ref[0, :, cell * r:(cell + 1) * r, :].reshape(r * r, c1)
             for cell in range(chunk)]
    dd1 = jnp.concatenate(parts, axis=1).astype(f32)      # [r^2, chunk*C]
    if rate > 0.0:
        keep = _tile_keep(seed_ref[0], r, c1, chunk, H, W, rate)
        dd1 = jnp.where(keep, dd1 * inv_keep, 0.0)
    dz1 = jnp.where(z1 > 0, dd1, 0.0)
    da1_ref[...] += jnp.sum(dz1 * fine, axis=0, keepdims=True)
    dc1_ref[...] += jnp.sum(dz1, axis=0, keepdims=True)

    dfine = (dz1 * a1_ref[0][None, :]).astype(mm_dtype)
    dpp = lax.dot_general(ayx_ref[:].astype(mm_dtype), dfine,
                          (((0,), (0,)), ((), ())),
                          precision=_mm_prec(mm_dtype),
                          preferred_element_type=f32)     # [81, chunk*C]
    dpp_ref[0, 0, 0] = dpp.astype(dpp_ref.dtype)


# ---------------------------------------------------------------------------
# custom-VJP core: pp -> d1 (post-dropout hidden1, interior-exact)
# ---------------------------------------------------------------------------

def _core_specs(r, c1, chunk):
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
        pl.BlockSpec((r * r, 81), lambda bb, i, j: (0, 0),
                     memory_space=pltpu.VMEM),            # ayx
        pl.BlockSpec((1, 1, 1, 81, chunk * c1),
                     lambda bb, i, j: (bb, i, j, 0, 0),
                     memory_space=pltpu.VMEM),            # pp
        pl.BlockSpec((1, chunk * c1), lambda bb, i, j: (0, 0),
                     memory_space=pltpu.VMEM),            # a1
        pl.BlockSpec((1, chunk * c1), lambda bb, i, j: (0, 0),
                     memory_space=pltpu.VMEM),            # c1
    ]
    out_spec = pl.BlockSpec((1, r, chunk * r, c1),
                            lambda bb, i, j: (bb, i, j, 0),
                            memory_space=pltpu.VMEM)
    return in_specs, out_spec


def _core_fwd_impl(pp, a1t, c1t, seed, rate, r, H, W, interpret, c1, chunk):
    b, h, wc, _, _ = pp.shape
    inv_keep = _core_params(rate)[1]
    in_specs, out_spec = _core_specs(r, c1, chunk)
    kernel = functools.partial(
        _d1_fwd_kernel, r=r, c1=c1, chunk=chunk, H=H, W=W, rate=rate,
        inv_keep=inv_keep)
    return pl.pallas_call(
        kernel,
        grid=(b, h, wc),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h * r, wc * chunk * r, c1),
                                       pp.dtype),
        compiler_params=_SEQ3,
        interpret=interpret,
    )(seed, jnp.asarray(_ayx(r, False)), pp, a1t, c1t)


def _core_bwd_impl(pp, a1t, c1t, seed, rate, r, H, W, interpret, c1, chunk,
                   dy):
    b, h, wc, _, _ = pp.shape
    inv_keep = _core_params(rate)[1]
    in_specs, out_spec = _core_specs(r, c1, chunk)
    kernel = functools.partial(
        _d1_bwd_kernel, r=r, c1=c1, chunk=chunk, H=H, W=W, rate=rate,
        inv_keep=inv_keep)
    return pl.pallas_call(
        kernel,
        grid=(b, h, wc),
        in_specs=in_specs + [out_spec],
        out_specs=[
            pl.BlockSpec((1, 1, 1, 81, chunk * c1),
                         lambda bb, i, j: (bb, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk * c1), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk * c1), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(pp.shape, pp.dtype),
            jax.ShapeDtypeStruct((1, chunk * c1), jnp.float32),
            jax.ShapeDtypeStruct((1, chunk * c1), jnp.float32),
        ],
        compiler_params=_SEQ3,
        interpret=interpret,
    )(seed, jnp.asarray(_ayx(r, False)), pp, a1t, c1t, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _d1_core2(pp, a1t, c1t, seed, rate, r, H, W, interpret, c1, chunk):
    return _core_fwd_impl(pp, a1t, c1t, seed, rate, r, H, W, interpret,
                          c1, chunk)


def _d1_core2_fwd(pp, a1t, c1t, seed, rate, r, H, W, interpret, c1, chunk):
    out = _core_fwd_impl(pp, a1t, c1t, seed, rate, r, H, W, interpret,
                         c1, chunk)
    return out, (pp, a1t, c1t, seed)


def _d1_core2_bwd(rate, r, H, W, interpret, c1, chunk, res, dy):
    pp, a1t, c1t, seed = res
    dpp, da1, dc1 = _core_bwd_impl(pp, a1t, c1t, seed, rate, r, H, W,
                                   interpret, c1, chunk, dy)
    return (dpp, da1.astype(a1t.dtype), dc1.astype(c1t.dtype),
            np.zeros((1,), jax.dtypes.float0))


_d1_core2.defvjp(_d1_core2_fwd, _d1_core2_bwd)


# ---------------------------------------------------------------------------
# exact image-border lines (XLA)
# ---------------------------------------------------------------------------

def _paste_d1_borders(d1, lines, a1, c1b, r, seed, rate):
    """Overwrite d1's four 1-px border lines with exact zero-padded conv1
    values (BN1 batch affine + hash dropout applied)."""
    dtype = d1.dtype
    B = d1.shape[0]
    H, W = d1.shape[1], d1.shape[2]
    c1 = a1.shape[-1]
    keep_rate = 1.0 - rate

    def dropped(side, pre):                               # [B, N, c1]
        u = jnp.maximum(pre.astype(jnp.float32) * a1[None, None, :]
                        + c1b[None, None, :], 0.0)
        if rate > 0.0:
            m = _line_mask(side, B, H, W, c1, seed, rate)
            u = jnp.where(m, u / keep_rate, 0.0)
        return u.astype(dtype)

    d1 = d1.at[:, 0].set(dropped('top', lines['top']))
    d1 = d1.at[:, -1].set(dropped('bot', lines['bot']))
    d1 = d1.at[:, :, 0].set(dropped('left', lines['left']))
    d1 = d1.at[:, :, -1].set(dropped('right', lines['right']))
    return d1


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def depth_stage1_fused_train(f: jax.Array, conv1_kernel: jax.Array,
                             conv1_bias: jax.Array,
                             bn_scale: jax.Array, bn_bias: jax.Array,
                             bn_eps: float,
                             conv2_kernel: jax.Array,
                             *, rate: float = 0.0, rng_key=None,
                             seed=None, scale: int = 32,
                             interpret: bool = False):
    """Train-mode fused depth-head stage 1.

    ``conv2_nobias(dropout(relu(BN_batch(conv3x3(upsample x scale(f))))))``
    — the conv1/BN1/ReLU/dropout block runs as one Pallas kernel (batch
    statistics from the coarse domain, counter-hash dropout, custom-VJP
    backward); conv2 is a plain XLA convolution on the materialized
    post-dropout hidden. Returns
    ``(h2 [B, H, W, c2], batch_mean [c1], batch_var [c1])``:

    * ``h2`` — BIAS-FREE conv2 output, exact including image borders.
      The caller adds conv2's bias and runs BN2 (flax train semantics) +
      ReLU + the 1x1 projection + sigmoid in XLA.
    * ``batch_mean``/``batch_var`` — hidden1's f32 batch statistics
      (fast-variance convention) for the BN1 running-stat update.

    Dropout draws the counter-hash mask (`dropout_keep_mask`) from
    ``seed`` (int32 scalar) or ``rng_key``; identical across forward,
    backward, border strips, and CPU tests.
    """
    b, h, w, _ = f.shape
    c1 = conv1_kernel.shape[-1]
    r = scale
    H, W = h * r, w * r
    chunk = _pick_chunk(w, c1)

    pp = _neighbor_pp(f, conv1_kernel, chunk)
    lines = _conv1_border_lines(f, conv1_kernel, r)
    s_full, q_full = seg_batch_stats(pp, f, conv1_kernel, r, chunk,
                                     lines=lines)
    n = float(b * H * W)
    mean_nb = s_full / n
    var = q_full / n - mean_nb * mean_nb
    a1 = bn_scale.astype(jnp.float32) * lax.rsqrt(var + bn_eps)
    c1b = bn_bias.astype(jnp.float32) - mean_nb * a1

    if rate > 0.0 and rng_key is None and seed is None:
        raise ValueError('dropout needs rng_key or an explicit seed')
    if seed is None:
        if rng_key is not None:
            seed = lax.bitcast_convert_type(
                jax.random.bits(rng_key, (1,), jnp.uint32), jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(1)

    a1t = jnp.tile(a1, chunk)[None]
    c1t = jnp.tile(c1b, chunk)[None]
    d1 = _d1_core2(pp, a1t, c1t, seed, rate, r, H, W, interpret, c1, chunk)
    d1 = _paste_d1_borders(d1, lines, a1, c1b, r, seed[0], rate)

    prec = (lax.Precision.HIGHEST if d1.dtype == jnp.float32
            else lax.Precision.DEFAULT)
    h2 = lax.conv_general_dilated(
        d1, conv2_kernel.astype(d1.dtype), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'), precision=prec)
    mean = mean_nb + conv1_bias.astype(jnp.float32)
    return h2, mean, var
