"""IoU metrics — on-device confusion-matrix accumulation.

TPU-native re-design of the reference ``IoUMetrics``
(evaluation/metrics.py:15-123). The reference materializes whole-test-set
prediction tensors on CPU and builds the confusion matrix with
``index_add_``; here the [C, C] confusion matrix is a tiny on-device
accumulator updated per batch inside jit (and ``psum``-reducible across a
mesh), with IoU derived from it at sweep end — no per-batch host syncs.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


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

    # MXU-friendly accumulation: cm = onehot(t)ᵀ @ onehot(p). Scatter-adds
    # serialize on TPU (~38 ms for 4M pixels); the one-hot matmul runs on
    # the systolic array in ~1 ms. bf16 one-hots hold 0/1 exactly and the
    # f32 accumulation is exact for counts < 2^24.
    tgts_safe = jnp.clip(tgts, 0, num_classes - 1)
    preds_safe = jnp.clip(preds, 0, num_classes - 1)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    onehot_t = ((tgts_safe[:, None] == classes[None, :]) & valid[:, None]
                ).astype(jnp.bfloat16)
    onehot_p = (preds_safe[:, None] == classes[None, :]).astype(jnp.bfloat16)
    cm = jax.lax.dot_general(
        onehot_t, onehot_p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return cm


def argmax_onehot(logits: jax.Array, axis: int = -1,
                  dtype=jnp.bfloat16) -> jax.Array:
    """One-hot of argmax computed directly from logits — no int argmax
    round-trip (VERDICT r3 item 3b: fuse argmax into the CM one-hot
    matmul). Tie-break matches ``jnp.argmax`` exactly (first maximum wins):
    of the positions equal to the row max, only the first is hot. NaN rows
    also match ``jnp.argmax`` (XLA orders NaN above everything, so the
    first NaN wins): without the explicit ``isnan`` term a NaN row max
    compares unequal everywhere and the pixel would silently vanish from
    the counts instead of surfacing in some class.

    0/1 values are exact in bf16, so the downstream f32-accumulated count
    matmul stays exact."""
    m = jnp.max(logits, axis=axis, keepdims=True)
    is_max = (logits == m) | jnp.isnan(logits)
    first = jnp.cumsum(is_max.astype(jnp.int32), axis=axis) == 1
    return (is_max & first).astype(dtype)


def confusion_matrix_from_logits(logits: jax.Array, targets: jax.Array,
                                 num_classes: int, ignore_index: int = 255,
                                 sample_mask: jax.Array | None = None
                                 ) -> jax.Array:
    """[C, C] confusion matrix straight from NHWC logits (see
    :func:`argmax_onehot`); bit-identical to argmax + confusion_matrix."""
    onehot_p = argmax_onehot(logits, axis=-1).reshape(-1, logits.shape[-1])
    tgts = targets.reshape(-1).astype(jnp.int32)
    valid = tgts != ignore_index
    if sample_mask is not None:
        per_sample = int(np.prod(targets.shape[1:])) if targets.ndim > 1 else 1
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_sample)
    tgts_safe = jnp.clip(tgts, 0, num_classes - 1)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    onehot_t = ((tgts_safe[:, None] == classes[None, :]) & valid[:, None]
                ).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        onehot_t, onehot_p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def confusion_matrix_per_weather_from_logits(
        logits: jax.Array, targets: jax.Array, num_classes: int,
        weather_ids: jax.Array, n_weathers: int, ignore_index: int = 255,
        sample_mask: jax.Array | None = None) -> jax.Array:
    """[n_weathers, C, C] confusion matrices straight from NHWC logits:
    the prediction one-hot comes from :func:`argmax_onehot` (no int argmax
    materialization) and feeds the same joint one-hot matmul as
    :func:`confusion_matrix_per_weather` — bit-identical counts."""
    onehot_p = argmax_onehot(logits, axis=-1).reshape(
        -1, logits.shape[-1])                                   # [N, C]
    tgts = targets.reshape(-1).astype(jnp.int32)
    per_sample = int(np.prod(targets.shape[1:])) if targets.ndim > 1 else 1
    wid = jnp.repeat(weather_ids.astype(jnp.int32), per_sample)
    valid = tgts != ignore_index
    if sample_mask is not None:
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_sample)

    tgts_safe = jnp.clip(tgts, 0, num_classes - 1)
    joint = wid * num_classes + tgts_safe
    rows = jnp.arange(n_weathers * num_classes, dtype=jnp.int32)
    onehot_joint = ((joint[:, None] == rows[None, :]) & valid[:, None]
                    ).astype(jnp.bfloat16)
    cm = jax.lax.dot_general(
        onehot_joint, onehot_p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
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
    rows = jnp.arange(n_weathers * num_classes, dtype=jnp.int32)
    onehot_joint = ((joint[:, None] == rows[None, :]) & valid[:, None]
                    ).astype(jnp.bfloat16)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    onehot_p = (preds_safe[:, None] == classes[None, :]).astype(jnp.bfloat16)
    cm = jax.lax.dot_general(
        onehot_joint, onehot_p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
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
