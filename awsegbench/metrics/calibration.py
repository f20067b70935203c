"""Confidence calibration — streaming ECE bins on device.

Re-design of the reference ``ConfidenceCalibration`` (metrics.py:126-321).
The reference retains the whole test set's logits on CPU and loops over 15
bins in Python; here per-bin (count, confidence-sum, accuracy-sum) statistics
accumulate as a tiny [num_bins, 3] on-device array per batch (psum-reducible),
and ECE = Σ_b |conf̄_b − acc̄_b|·(n_b/N) is computed from the sums — exactly
equal to the reference's two-pass formula.

Bin convention matches metrics.py:186-188: bin b covers ``(b/nb, (b+1)/nb]``
(confidence exactly 0 joins no bin).
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np


def ece_bin_update(logits: jax.Array, targets: jax.Array, num_bins: int = 15,
                   ignore_index: int = 255,
                   sample_mask: jax.Array | None = None,
                   class_axis: int | None = None) -> jax.Array:
    """Per-batch ECE bin statistics.

    Args:
        logits: [B, C, H, W] (class axis 1, reference layout) or [B, H, W, C].
        targets: [B, H, W] int labels.
        class_axis: set explicitly when the H==C heuristic could misfire.
    Returns:
        [num_bins, 3] float32: (count, sum of confidence, sum of accuracy).
    """
    if class_axis is None:
        # NCHW (reference layout) unless axis 1 matches the target's H
        class_axis = -1 if logits.shape[1] == targets.shape[1] else 1
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=class_axis)
    confidences = jnp.max(probs, axis=class_axis)
    predicted = jnp.argmax(probs, axis=class_axis)

    conf = confidences.reshape(-1)
    pred = predicted.reshape(-1)
    tgt = targets.reshape(-1)
    valid = tgt != ignore_index
    if sample_mask is not None:
        per_sample = int(np.prod(targets.shape[1:]))
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_sample)

    acc = (pred == tgt).astype(jnp.float32)

    # bin index: conf ∈ (b/nb, (b+1)/nb] → b = ceil(conf·nb) − 1
    bin_idx = jnp.ceil(conf * num_bins).astype(jnp.int32) - 1
    in_any_bin = (conf > 0) & valid
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)

    # MXU one-hot matmul instead of scatter-add (see metrics/iou.py):
    # stats = onehot(bin)ᵀ @ [1, conf, acc] with invalid rows zeroed.
    # f32 one-hot (not bf16): the confidence column must accumulate at full
    # precision for ECE parity.
    w = in_any_bin.astype(jnp.float32)
    bins = jnp.arange(num_bins, dtype=jnp.int32)
    onehot = ((bin_idx[:, None] == bins[None, :]) & in_any_bin[:, None]
              ).astype(jnp.float32)
    cols = jnp.stack([jnp.ones_like(conf), conf, acc], axis=1) * w[:, None]
    stats = jax.lax.dot_general(
        onehot, cols,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return stats


def ece_from_bins(stats: jax.Array, total_valid: jax.Array | None = None) -> jax.Array:
    """ECE from accumulated bin stats.

    ``total_valid`` is the count of valid (non-ignored) pixels, used as the
    proportion denominator like the reference's ``in_bin.float().mean()``
    (metrics.py:189). Defaults to the sum of bin counts (correct whenever no
    confidence is exactly 0 — true for softmax outputs).
    """
    counts = stats[:, 0]
    if total_valid is None:
        total_valid = jnp.sum(counts)
    conf_mean = jnp.where(counts > 0, stats[:, 1] / jnp.maximum(counts, 1.0), 0.0)
    acc_mean = jnp.where(counts > 0, stats[:, 2] / jnp.maximum(counts, 1.0), 0.0)
    prop = counts / jnp.maximum(total_valid, 1.0)
    return jnp.sum(jnp.abs(conf_mean - acc_mean) * prop)


def ece_bin_update_per_weather(logits: jax.Array, targets: jax.Array,
                               weather_ids: jax.Array, n_weathers: int,
                               num_bins: int = 15, ignore_index: int = 255,
                               sample_mask: jax.Array | None = None,
                               class_axis: int = -1) -> jax.Array:
    """[n_weathers, num_bins, 3] ECE stats in one joint one-hot matmul
    (row index ``weather·num_bins + bin``); overall = sum over weathers."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=class_axis)
    confidences = jnp.max(probs, axis=class_axis)
    predicted = jnp.argmax(probs, axis=class_axis)

    conf = confidences.reshape(-1)
    pred = predicted.reshape(-1)
    tgt = targets.reshape(-1)
    per_sample = int(np.prod(targets.shape[1:]))
    wid = jnp.repeat(weather_ids.astype(jnp.int32), per_sample)
    valid = tgt != ignore_index
    if sample_mask is not None:
        valid = valid & jnp.repeat(sample_mask.astype(bool), per_sample)

    acc = (pred == tgt).astype(jnp.float32)
    bin_idx = jnp.ceil(conf * num_bins).astype(jnp.int32) - 1
    in_any_bin = (conf > 0) & valid
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)

    joint = wid * num_bins + bin_idx
    rows = jnp.arange(n_weathers * num_bins, dtype=jnp.int32)
    w = in_any_bin.astype(jnp.float32)
    onehot = ((joint[:, None] == rows[None, :]) & in_any_bin[:, None]
              ).astype(jnp.float32)
    cols = jnp.stack([jnp.ones_like(conf), conf, acc], axis=1) * w[:, None]
    stats = jax.lax.dot_general(
        onehot, cols,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return stats.reshape(n_weathers, num_bins, 3)


class ConfidenceCalibration:
    """Reference-compatible facade (metrics.py:126-321)."""

    def __init__(self, num_bins: int = 15) -> None:
        self.num_bins = num_bins

    def compute_ece(self, predictions, targets,
                    return_details: bool = False) -> Union[float, Dict[str, Any]]:
        logits = jnp.asarray(predictions)
        tgts = jnp.asarray(targets)
        stats = ece_bin_update(logits, tgts, self.num_bins)
        stats = np.asarray(stats)
        total = stats[:, 0].sum()
        ece = float(ece_from_bins(jnp.asarray(stats)))
        if not return_details:
            return ece

        boundaries = np.linspace(0, 1, self.num_bins + 1)
        bin_details = []
        for b in range(self.num_bins):
            cnt, csum, asum = stats[b]
            if cnt > 0:
                acc_b = asum / cnt
                conf_b = csum / cnt
                prop = cnt / max(total, 1.0)
                bin_details.append({
                    'bin_lower': float(boundaries[b]),
                    'bin_upper': float(boundaries[b + 1]),
                    'accuracy': float(acc_b),
                    'confidence': float(conf_b),
                    'proportion': float(prop),
                    'error': float(abs(conf_b - acc_b)),
                })
            else:
                bin_details.append({
                    'bin_lower': float(boundaries[b]),
                    'bin_upper': float(boundaries[b + 1]),
                    'accuracy': 0.0, 'confidence': 0.0,
                    'proportion': 0.0, 'error': 0.0,
                })
        overall_acc = stats[:, 2].sum() / max(total, 1.0)
        overall_conf = stats[:, 1].sum() / max(total, 1.0)
        return {
            'ece': ece,
            'bin_details': bin_details,
            'overall_accuracy': float(overall_acc),
            'overall_confidence': float(overall_conf),
        }

    def compute_reliability_diagram_data(self, predictions, targets) -> Dict[str, np.ndarray]:
        data = self.compute_ece(predictions, targets, return_details=True)
        centers, accs, confs, props = [], [], [], []
        for b in data['bin_details']:
            if b['proportion'] > 0:
                centers.append((b['bin_lower'] + b['bin_upper']) / 2)
                accs.append(b['accuracy'])
                confs.append(b['confidence'])
                props.append(b['proportion'])
        return {
            'bin_centers': np.array(centers),
            'bin_accuracies': np.array(accs),
            'bin_confidences': np.array(confs),
            'bin_proportions': np.array(props),
        }

    @staticmethod
    def temperature_scale(logits, temperature: float):
        return jnp.asarray(logits) / temperature

    def optimize_temperature(self, logits, targets, max_iter: int = 50) -> float:
        """Grid search over 100 temps in [0.1, 10] minimizing NLL
        (metrics.py:283-321) — mapped over the temperature grid on device.

        Documented deviation: the reference flattens NCHW logits with a raw
        ``view(-1, C)`` (metrics.py:305), which interleaves spatial positions
        into the class axis — a latent bug. We flatten channel-last so each
        row is a genuine class distribution.
        """
        logits = jnp.asarray(logits, dtype=jnp.float32)
        tgts = jnp.asarray(targets)
        num_classes = logits.shape[1]
        # [N, C] flatten: move class axis last
        lf = jnp.moveaxis(logits, 1, -1).reshape(-1, num_classes)
        tf = tgts.reshape(-1)
        valid = tf != 255
        tf_safe = jnp.where(valid, tf, 0)

        def nll_at(temp):
            scaled = lf / temp
            logp = jax.nn.log_softmax(scaled, axis=-1)
            ll = jnp.take_along_axis(logp, tf_safe[:, None].astype(jnp.int32), axis=-1)[:, 0]
            return -jnp.sum(jnp.where(valid, ll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)

        temperatures = jnp.linspace(0.1, 10.0, 100)
        nlls = jax.lax.map(nll_at, temperatures)
        best = jnp.argmin(nlls)  # first minimum, matching strict '<' update
        return float(temperatures[best])
