"""Pallas TPU kernel: spatial-reduction attention core.

SegFormer's efficient attention (SURVEY.md §5 long-context; reference
model.py:120-146) downsamples K/V by ``sr_ratio`` so the KV length is tiny
(512 tokens at every stage for 512×1024 inputs) while Q stays at full
token count (32k at stage 1). The XLA path materializes the f32 score
tensor ``[B, heads, N, M]`` in HBM — 537 MB at stage 1, read/written ~3×
around the softmax, which makes stage 1 alone ~70% of encoder time.

This kernel computes ``softmax(q·kᵀ·scale)·v`` per (batch·head, q-tile)
program with the scores living only in VMEM: the whole KV block fits
on-chip (M ≤ 1024), so no flash-style online accumulation is needed — one
[TQ, M] score tile, row softmax, one AV matmul.

Numerics: identical op order to ``jax.nn.softmax`` (max-subtract, exp,
sum); the normalization divides the AV product instead of the
probabilities (one rescale per row instead of M) — equal to f32 rounding;
matmul operand dtype follows the input dtype (bf16 in production, f32 in
parity tests). Pinned against the einsum path by tests/test_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_TQ = 2048
_MAX_M = 4096  # KV block must fit VMEM; production M = 512


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    f32 = jnp.float32
    q = q_ref[0]                       # [TQ, D]
    k = k_ref[0]                       # [M, D]
    v = v_ref[0]                       # [M, D]
    mm_dtype = q.dtype if q.dtype == jnp.bfloat16 else f32

    s = lax.dot_general(q.astype(mm_dtype), k.astype(mm_dtype),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=f32) * scale   # [TQ, M]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p.astype(mm_dtype), v.astype(mm_dtype),
                preferred_element_type=f32)                   # [TQ, D]
    out_ref[0] = (o / l).astype(out_ref.dtype)


def _sr_attention_forward(q, k, v, scale, interpret):
    g, n, d = q.shape
    m = k.shape[1]
    if m > _MAX_M:
        raise ValueError(f"sr_attention: KV length {m} exceeds {_MAX_M}")
    # size the q tile so the f32 score tile stays well under the ~16 MB
    # scoped-VMEM limit (at 2048x1024 inputs stage 1 has M = 2048)
    budget_rows = max(256, ((6 << 20) // (4 * m)) // 256 * 256)
    tq = min(_MAX_TQ, budget_rows, n)
    if n % tq:
        # pad N up to a tile multiple; padded rows are dropped after
        pad = (-n) % tq
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        return _sr_attention_forward(q, k, v, scale, interpret)[:, :n]

    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(g, n // tq),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda gg, i: (gg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda gg, i: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda gg, i: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda gg, i: (gg, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float):
    """Flash-style backward tile: recompute the score tile in VMEM (never
    HBM), then dq for this q-tile and dk/dv partial sums accumulated across
    q-tiles into a revisited [M, D] f32 output block (the q-tile grid axis
    is the minor, sequentially-iterated one, so the accumulation is safe).
    """
    f32 = jnp.float32
    i = pl.program_id(1)
    q = q_ref[0]                       # [TQ, D]
    k = k_ref[0]                       # [M, D]
    v = v_ref[0]                       # [M, D]
    do = do_ref[0]                     # [TQ, D]
    mm_dtype = q.dtype if q.dtype == jnp.bfloat16 else f32

    # recompute normalized probabilities exactly as the forward
    s = lax.dot_general(q.astype(mm_dtype), k.astype(mm_dtype),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=f32) * scale   # [TQ, M]
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)                 # [TQ, M]

    dop = lax.dot_general(do.astype(mm_dtype), v.astype(mm_dtype),
                          (((1,), (1,)), ((), ())),
                          preferred_element_type=f32)         # [TQ, M]
    delta = jnp.sum(p * dop, axis=1, keepdims=True)           # [TQ, 1]
    ds = p * (dop - delta) * scale                            # [TQ, M]

    dq = jnp.dot(ds.astype(mm_dtype), k.astype(mm_dtype),
                 preferred_element_type=f32)                  # [TQ, D]
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dk_part = lax.dot_general(ds.astype(mm_dtype), q.astype(mm_dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)     # [M, D]
    dv_part = lax.dot_general(p.astype(mm_dtype), do.astype(mm_dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)     # [M, D]

    @pl.when(i == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])
    dk_ref[0] += dk_part
    dv_ref[0] += dv_part


def _sr_attention_backward(q, k, v, do, scale, interpret):
    g, n, d = q.shape
    m = k.shape[1]
    # two f32 [TQ, M] score tiles live at once (p and dop/ds) plus the f32
    # dk/dv accumulators — budget the q tile accordingly
    budget_rows = max(256, ((4 << 20) // (8 * m)) // 256 * 256)
    tq = min(_MAX_TQ, budget_rows, n)
    if n % tq:
        pad = (-n) % tq
        # zero-padded do rows contribute exactly zero to dk/dv (ds = 0,
        # p^T·do = 0), so padding is grad-exact; padded dq rows are dropped
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        dop = jnp.pad(do, ((0, 0), (0, pad), (0, 0)))
        dq, dk, dv = _sr_attention_backward(qp, k, v, dop, scale, interpret)
        return dq[:, :n], dk, dv

    kernel = functools.partial(_attn_bwd_kernel, scale=scale)
    dq, dk32, dv32 = pl.pallas_call(
        kernel,
        grid=(g, n // tq),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda gg, i: (gg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda gg, i: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda gg, i: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, d), lambda gg, i: (gg, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, d), lambda gg, i: (gg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda gg, i: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda gg, i: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n, d), q.dtype),
            jax.ShapeDtypeStruct((g, m, d), jnp.float32),
            jax.ShapeDtypeStruct((g, m, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk32.astype(k.dtype), dv32.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _sr_attention(q, k, v, scale, interpret):
    return _sr_attention_forward(q, k, v, scale, interpret)


def _sr_attention_fwd(q, k, v, scale, interpret):
    return _sr_attention_forward(q, k, v, scale, interpret), (q, k, v)


def _sr_attention_bwd(scale, interpret, res, g_out):
    """Flash-style backward: dq/dk/dv from a single Pallas kernel with the
    score recompute VMEM-resident (replaces the round-2 XLA-einsum VJP
    that re-materialized the full f32 score tensor in HBM)."""
    q, k, v = res
    return _sr_attention_backward(q, k, v, g_out, scale, interpret)


_sr_attention.defvjp(_sr_attention_fwd, _sr_attention_bwd)


def sr_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                 interpret: bool = False) -> jax.Array:
    """``softmax(q·kᵀ·scale)·v`` with VMEM-resident scores.

    Args:
        q: [G, N, D] queries (G = batch·heads).
        k, v: [G, M, D] spatially-reduced keys/values; M ≤ 4096.
    Returns [G, N, D] in q.dtype. Differentiable: the custom VJP runs a
    flash-style Pallas backward (score recompute + dq/dk/dv per q-tile,
    all VMEM-resident).
    """
    return _sr_attention(q, k, v, float(scale), interpret)


def sr_attention_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                           scale: float) -> jax.Array:
    """The XLA einsum path (used off-TPU and as the parity oracle)."""
    s = jnp.einsum('gnd,gmd->gnm', q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum('gnm,gmd->gnd', p, v).astype(q.dtype)


def pallas_attention_available() -> bool:
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:  # pragma: no cover
        return False
