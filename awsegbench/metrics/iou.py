"""IoU metrics — on-device confusion-matrix accumulation.

TPU-native re-design of the reference ``IoUMetrics``
(evaluation/metrics.py:15-123). The reference materializes whole-test-set
prediction tensors on CPU and builds the confusion matrix with
``index_add_``; here the [C, C] confusion matrix is a tiny on-device
accumulator updated per batch inside jit (and ``psum``-reducible across a
mesh), with IoU derived from it at sweep end — no per-batch host syncs.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# Pixels per one-hot-matmul chunk. The CM matmul's operands are bf16
# one-hots [chunk, n_rows→128 lanes]; at the default 2^20 the two operands
# cost ~512 MB HBM regardless of batch size. Round 4 shipped an unchunked
# variant whose [B,H,W,C] s32 tie-break temp alone was 8 GB at B32 (the
# BENCH_r04 OOM); this bound is the structural fix.
_CM_CHUNK = int(os.environ.get('AWSEG_CM_CHUNK_PIXELS', str(1 << 20)))


def _cm_matmul(rows: jax.Array, cols: jax.Array, valid: jax.Array,
               n_rows: int, n_cols: int) -> jax.Array:
    """One [n_rows, n_cols] count matmul: cm = onehot(rows)ᵀ @ onehot(cols).

    Scatter-adds serialize on TPU (~38 ms for 4M pixels); the one-hot
    matmul runs on the systolic array in ~1 ms. bf16 one-hots hold 0/1
    exactly and the f32 accumulation is exact for counts < 2^24.
    """
    r_ids = jnp.arange(n_rows, dtype=jnp.int32)
    c_ids = jnp.arange(n_cols, dtype=jnp.int32)
    oh_r = ((rows[:, None] == r_ids[None, :]) & valid[:, None]
            ).astype(jnp.bfloat16)
    oh_c = (cols[:, None] == c_ids[None, :]).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        oh_r, oh_c,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _cm_accumulate(rows: jax.Array, cols: jax.Array, valid: jax.Array,
                   n_rows: int, n_cols: int,
                   chunk: int | None = None) -> jax.Array:
    """Chunked count accumulation over flat int32 row/col indices.

    Splits the pixel axis into ``chunk``-sized pieces under ``lax.scan`` so
    the bf16 one-hot matmul operands never exceed ~2·chunk·128 lanes of HBM
    (invalid-padded tail rows are all-zero in the row one-hot and contribute
    nothing). Partial sums are integer-valued f32, so the chunked total is
    bit-identical to the monolithic matmul for counts < 2^24.
    """
    chunk = _CM_CHUNK if chunk is None else chunk
    n = rows.shape[0]
    if n <= chunk:
        return _cm_matmul(rows, cols, valid, n_rows, n_cols)
    pad = (-n) % chunk
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad,), rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), valid.dtype)])
    k = (n + pad) // chunk

    def body(acc, xs):
        r, c, v = xs
        return acc + _cm_matmul(r, c, v, n_rows, n_cols), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((n_rows, n_cols), jnp.float32),
        (rows.reshape(k, chunk), cols.reshape(k, chunk),
         valid.reshape(k, chunk)))
    return acc


def confusion_matrix(predictions: jax.Array, targets: jax.Array,
                     num_classes: int, ignore_index: int = 255,
                     sample_mask: jax.Array | None = None) -> jax.Array:
    """Confusion matrix [C, C] (rows = target, cols = prediction).

    Matches reference metrics.py:62-71: flattened ``targets*C + preds``
    scatter-add over non-ignored pixels. ``sample_mask`` ([B] bool) zeroes
    out padding rows added for even device sharding.
    """
    if predictions.ndim == targets.ndim + 1:
        predictions = jnp.argmax(predictions, axis=1)

    preds = predictions.reshape(-1).astype(jnp.int32)
    tgts = targets.reshape(-1).astype(jnp.int32)
    valid = tgts != ignore_index
    if sample_mask is not None:
        per_sample = int(np.prod(targets.shape[1:])) if targets.ndim > 1 else 1
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_sample)

    tgts_safe = jnp.clip(tgts, 0, num_classes - 1)
    preds_safe = jnp.clip(preds, 0, num_classes - 1)
    return _cm_accumulate(tgts_safe, preds_safe, valid,
                          num_classes, num_classes)


def argmax_onehot(logits: jax.Array, axis: int = -1,
                  dtype=jnp.bfloat16) -> jax.Array:
    """One-hot of ``jnp.argmax(logits, axis)`` — identical decisions by
    construction (first maximum wins ties; NaN rows take the first NaN,
    which XLA's argmax orders above everything).

    Round 4 computed this "fused" from the logits via a row-max compare +
    an s32 cumsum tie-break over the class axis; on TPU that materialized
    an s32 [B,H,W,C] temp lane-padded 6.7× (8 GB at B32 — the BENCH_r04
    HBM OOM). The int argmax reduce produces [B,H,W] with no class-axis
    temp, and the eq-broadcast one-hot fuses into its consumer.

    0/1 values are exact in bf16, so the downstream f32-accumulated count
    matmul stays exact."""
    idx = jnp.argmax(logits, axis=axis)
    c = logits.shape[axis]
    shape = [1] * logits.ndim
    shape[axis] = c
    classes = jnp.arange(c, dtype=idx.dtype).reshape(shape)
    return (jnp.expand_dims(idx, axis) == classes).astype(dtype)


def confusion_matrix_from_logits(logits: jax.Array, targets: jax.Array,
                                 num_classes: int, ignore_index: int = 255,
                                 sample_mask: jax.Array | None = None
                                 ) -> jax.Array:
    """[C, C] confusion matrix straight from NHWC logits; bit-identical to
    ``jnp.argmax`` + :func:`confusion_matrix` (chunked accumulation)."""
    preds = jnp.argmax(logits, axis=-1).reshape(-1).astype(jnp.int32)
    tgts = targets.reshape(-1).astype(jnp.int32)
    valid = tgts != ignore_index
    if sample_mask is not None:
        per_sample = int(np.prod(targets.shape[1:])) if targets.ndim > 1 else 1
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_sample)
    tgts_safe = jnp.clip(tgts, 0, num_classes - 1)
    return _cm_accumulate(tgts_safe, preds, valid, num_classes, num_classes)


def confusion_matrix_per_weather_from_logits(
        logits: jax.Array, targets: jax.Array, num_classes: int,
        weather_ids: jax.Array, n_weathers: int, ignore_index: int = 255,
        sample_mask: jax.Array | None = None) -> jax.Array:
    """[n_weathers, C, C] confusion matrices straight from NHWC logits:
    int argmax (no class-axis temp) feeding the same joint one-hot matmul
    as :func:`confusion_matrix_per_weather` — bit-identical counts."""
    preds = jnp.argmax(logits, axis=-1).reshape(-1).astype(jnp.int32)
    tgts = targets.reshape(-1).astype(jnp.int32)
    per_sample = int(np.prod(targets.shape[1:])) if targets.ndim > 1 else 1
    wid = jnp.repeat(weather_ids.astype(jnp.int32), per_sample)
    valid = tgts != ignore_index
    if sample_mask is not None:
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_sample)

    tgts_safe = jnp.clip(tgts, 0, num_classes - 1)
    joint = wid * num_classes + tgts_safe
    cm = _cm_accumulate(joint, preds, valid,
                        n_weathers * num_classes, num_classes)
    return cm.reshape(n_weathers, num_classes, num_classes)


def confusion_matrix_per_weather(predictions: jax.Array, targets: jax.Array,
                                 num_classes: int, weather_ids: jax.Array,
                                 n_weathers: int, ignore_index: int = 255,
                                 sample_mask: jax.Array | None = None
                                 ) -> jax.Array:
    """[n_weathers, C, C] confusion matrices in ONE joint one-hot matmul.

    The joint row index is ``weather·C + target``; the overall matrix is the
    sum over the weather axis — 5× less one-hot traffic than accumulating
    each weather separately in the eval step.
    """
    preds = predictions.reshape(-1).astype(jnp.int32)
    tgts = targets.reshape(-1).astype(jnp.int32)
    per_sample = int(np.prod(targets.shape[1:])) if targets.ndim > 1 else 1
    wid = jnp.repeat(weather_ids.astype(jnp.int32), per_sample)
    valid = tgts != ignore_index
    if sample_mask is not None:
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_sample)

    tgts_safe = jnp.clip(tgts, 0, num_classes - 1)
    preds_safe = jnp.clip(preds, 0, num_classes - 1)
    joint = wid * num_classes + tgts_safe                      # [N]
    cm = _cm_accumulate(joint, preds_safe, valid,
                        n_weathers * num_classes, num_classes)
    return cm.reshape(n_weathers, num_classes, num_classes)


def iou_from_confusion(cm: jax.Array) -> Dict[str, jax.Array]:
    """Per-class IoU + mean over classes with nonzero union (metrics.py:73-89)."""
    intersection = jnp.diag(cm)
    union = cm.sum(axis=0) + cm.sum(axis=1) - intersection
    valid_classes = union > 0
    per_class_iou = jnp.where(valid_classes, intersection / jnp.maximum(union, 1.0), 0.0)
    n_valid = jnp.sum(valid_classes)
    mean_iou = jnp.where(n_valid > 0, jnp.sum(per_class_iou) / jnp.maximum(n_valid, 1), 0.0)
    return {
        'mean_iou': mean_iou,
        'per_class_iou': per_class_iou,
        'valid_classes': valid_classes,
    }


def pixel_accuracy_from_confusion(cm: jax.Array) -> jax.Array:
    total = jnp.sum(cm)
    return jnp.where(total > 0, jnp.trace(cm) / jnp.maximum(total, 1.0), 0.0)


class IoUMetrics:
    """Reference-compatible facade (metrics.py:15-123)."""

    def __init__(self, num_classes: int, ignore_index: int = 255) -> None:
        self.num_classes = num_classes
        self.ignore_index = ignore_index

    def compute_iou(self, predictions, targets) -> Dict[str, object]:
        preds = jnp.asarray(predictions)
        tgts = jnp.asarray(targets)
        cm = confusion_matrix(preds, tgts, self.num_classes, self.ignore_index)
        out = iou_from_confusion(cm)
        return {
            'mean_iou': float(out['mean_iou']),
            'per_class_iou': np.asarray(out['per_class_iou']),
            'valid_classes': np.asarray(out['valid_classes']),
        }

    def compute_pixel_accuracy(self, predictions, targets) -> float:
        preds = jnp.asarray(predictions)
        tgts = jnp.asarray(targets)
        if preds.ndim == tgts.ndim + 1:
            preds = jnp.argmax(preds, axis=1)
        valid = tgts != self.ignore_index
        correct = jnp.sum((preds == tgts) & valid)
        total = jnp.sum(valid)
        return float(jnp.where(total > 0, correct / jnp.maximum(total, 1), 0.0))
