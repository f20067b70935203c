"""Ensemble disagreement metrics — on-device, sort-based exact AUROC.

Re-design of the reference ``EnsembleDisagreementMetrics``
(metrics.py:324-467). The reference flattens whole-test-set pixels to CPU
numpy and calls ``sklearn.roc_auc_score``; here AUROC is computed on device
with the rank-statistic identity (Mann-Whitney U with midrank tie
correction — exactly what sklearn's trapezoid ROC integrates to), plus a
histogram-based streaming estimator for sets too large to sort at once.

Numeric quirks preserved from the reference (SURVEY.md §6):
* "JS divergence" uses torch ``F.kl_div(p.log(), m)`` semantics = KL(m ‖ p)
  — arguments reversed vs. the textbook (metrics.py:462-463, model.py:508).
* Disagreement map adds 1e-8 inside logs (metrics.py:360-363).
* Degenerate AUROC (single-class errors) returns 0.5 (metrics.py:430-438).
* Variance map uses unbiased variance (torch.var default, metrics.py:389).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def disagreement_map(logits_list: Sequence[jax.Array],
                     class_axis: int = 1) -> jax.Array:
    """Mutual information: H(mean p) − mean_i H(p_i). metrics.py:336-369."""
    if len(logits_list) < 2:
        raise ValueError("Need at least 2 predictions for disagreement computation")
    probs = jnp.stack([jax.nn.softmax(l.astype(jnp.float32), axis=class_axis)
                       for l in logits_list], axis=0)
    mean_probs = probs.mean(axis=0)
    mean_entropy = -jnp.sum(mean_probs * jnp.log(mean_probs + 1e-8), axis=class_axis)
    # the stack adds a leading member axis: shift non-negative class axes by 1
    stacked_axis = class_axis if class_axis < 0 else class_axis + 1
    individual_entropies = -jnp.sum(probs * jnp.log(probs + 1e-8), axis=stacked_axis)
    mean_individual_entropy = individual_entropies.mean(axis=0)
    return mean_entropy - mean_individual_entropy


def variance_map(logits_list: Sequence[jax.Array], class_axis: int = 1) -> jax.Array:
    """Unbiased variance across members of softmax probs. metrics.py:371-391."""
    probs = jnp.stack([jax.nn.softmax(l.astype(jnp.float32), axis=class_axis)
                       for l in logits_list], axis=0)
    return jnp.var(probs, axis=0, ddof=1)


def jensen_shannon_divergence(logits1: jax.Array, logits2: jax.Array,
                              class_axis: int = 1) -> jax.Array:
    """Reference 'JS' with reversed-KL quirk: ½[KL(m‖p1) + KL(m‖p2)].

    torch ``F.kl_div(input=log p, target=m)`` elementwise is
    m·(log m − log p); summed over the class axis. metrics.py:440-467.
    """
    p1 = jax.nn.softmax(logits1.astype(jnp.float32), axis=class_axis)
    p2 = jax.nn.softmax(logits2.astype(jnp.float32), axis=class_axis)
    m = (p1 + p2) / 2.0
    kl1 = jnp.sum(m * (jnp.log(m) - jnp.log(p1)), axis=class_axis)
    kl2 = jnp.sum(m * (jnp.log(m) - jnp.log(p2)), axis=class_axis)
    return (kl1 + kl2) / 2.0


# ---------------------------------------------------------------------------
# AUROC
# ---------------------------------------------------------------------------

def auroc_exact(scores: jax.Array, labels: jax.Array,
                weights: jax.Array | None = None) -> jax.Array:
    """Exact AUROC via midrank Mann-Whitney U — equals sklearn.roc_auc_score.

    Args:
        scores: [N] float scores (higher = more likely positive).
        labels: [N] {0,1} labels.
        weights: optional [N] 0/1 validity mask.
    Returns scalar AUROC; 0.5 when labels are degenerate.
    """
    scores = scores.astype(jnp.float32).reshape(-1)
    labels = labels.astype(jnp.float32).reshape(-1)
    w = jnp.ones_like(labels) if weights is None else weights.astype(jnp.float32).reshape(-1)
    labels = labels * w

    order = jnp.argsort(scores)
    s_sorted = scores[order]
    l_sorted = labels[order]
    w_sorted = w[order]

    n = scores.shape[0]
    ranks_raw = jnp.cumsum(w_sorted)  # rank among valid entries (1-based)

    # midranks for ties: group consecutive equal scores (valid entries only)
    # For each element, average rank over its tie-group. Build group ids via
    # change points, then segment min/max of ranks.
    is_new = jnp.concatenate([jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]])
    group_id = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    # per tie-group: valid count k and the rank just before the group's first
    # valid element s → every valid member gets midrank s + (k+1)/2
    num_groups = n  # upper bound
    grp_w = jnp.zeros((num_groups,), jnp.float32).at[group_id].add(w_sorted)
    grp_before = jnp.full((num_groups,), jnp.inf, jnp.float32).at[group_id].min(
        jnp.where(w_sorted > 0, ranks_raw - w_sorted, jnp.inf))
    midrank = jnp.where(grp_w > 0, grp_before + (grp_w + 1.0) / 2.0, 0.0)
    elem_midrank = midrank[group_id]

    n_pos = jnp.sum(l_sorted)
    n_valid = jnp.sum(w_sorted)
    n_neg = n_valid - n_pos
    rank_sum_pos = jnp.sum(elem_midrank * l_sorted)
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    auroc = u / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos > 0) & (n_neg > 0), auroc, 0.5)


def auroc_exact_sharded(scores: jax.Array, labels: jax.Array,
                        weights: jax.Array | None, mesh) -> jax.Array:
    """Exact distributed AUROC over a mesh-sharded score vector.

    The inputs' leading axis is sharded over the mesh's ``data`` axis; the
    global ``argsort`` inside :func:`auroc_exact` lowers to XLA's
    distributed sort (all-to-all over ICI), so Cityscapes-val-scale score
    vectors (~10⁸–10⁹ pixels) never gather onto one chip. Replaces the
    reference's host-side ``sklearn.roc_auc_score`` over flattened pixels
    (metrics.py:393-438) with identical semantics (midrank ties).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.mesh import DATA_AXIS
    data = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    if weights is None:
        weights = jnp.ones_like(labels, dtype=jnp.float32)
    fn = jax.jit(auroc_exact, in_shardings=(data, data, data),
                 out_shardings=rep)
    return fn(jax.device_put(scores, data), jax.device_put(labels, data),
              jax.device_put(weights, data))


def auroc_histogram_update(scores: jax.Array, labels: jax.Array,
                           num_bins: int, lo: float, hi: float,
                           weights: jax.Array | None = None,
                           log_scale: bool = False) -> jax.Array:
    """Streaming AUROC accumulator: per-bin (pos, neg) counts [num_bins, 2].

    psum-reducible across batches/devices; combine with
    :func:`auroc_from_histogram`. ``log_scale`` bins log(score−lo+1e-9)
    instead — AUROC is invariant under monotone transforms, and log bins
    keep relative resolution when scores cluster near the low end (e.g.
    mutual-information disagreement of nearly-agreeing members).
    """
    scores = scores.astype(jnp.float32).reshape(-1)
    labels = labels.astype(jnp.float32).reshape(-1)
    w = jnp.ones_like(labels) if weights is None else weights.astype(jnp.float32).reshape(-1)
    if log_scale:
        eps = 1e-9
        s = jnp.log(jnp.maximum(scores - lo, 0.0) + eps)
        s_lo = jnp.log(eps)
        s_hi = jnp.log(hi - lo + eps)
        t = jnp.clip((s - s_lo) / (s_hi - s_lo), 0.0, 1.0 - 1e-7)
    else:
        t = jnp.clip((scores - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0 - 1e-7)
    idx = (t * num_bins).astype(jnp.int32)
    hist = jnp.zeros((num_bins, 2), dtype=jnp.float32)
    hist = hist.at[idx, 0].add(labels * w)
    hist = hist.at[idx, 1].add((1.0 - labels) * w)
    return hist


def auroc_from_histogram(hist: jax.Array) -> jax.Array:
    """AUROC from (pos, neg) score histogram with within-bin tie correction."""
    pos, neg = hist[:, 0], hist[:, 1]
    n_pos, n_neg = jnp.sum(pos), jnp.sum(neg)
    neg_below = jnp.cumsum(neg) - neg
    u = jnp.sum(pos * (neg_below + 0.5 * neg))
    auroc = u / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos > 0) & (n_neg > 0), auroc, 0.5)


class EnsembleDisagreementMetrics:
    """Reference-compatible facade (metrics.py:324-467)."""

    def compute_disagreement_map(self, predictions_list: List) -> jax.Array:
        return disagreement_map([jnp.asarray(p) for p in predictions_list])

    def compute_variance_map(self, predictions_list: List) -> jax.Array:
        return variance_map([jnp.asarray(p) for p in predictions_list])

    def compute_disagreement_auroc(self, predictions_list: List, targets,
                                   error_threshold: float = 0.5) -> float:
        logits = [jnp.asarray(p) for p in predictions_list]
        tgts = jnp.asarray(targets)
        dis = disagreement_map(logits)
        mean_probs = jnp.stack(
            [jax.nn.softmax(l.astype(jnp.float32), axis=1) for l in logits], 0).mean(0)
        ensemble_pred = jnp.argmax(mean_probs, axis=1)
        errors = (ensemble_pred != tgts).astype(jnp.float32)
        valid = (tgts != 255).reshape(-1)
        return float(auroc_exact(dis.reshape(-1), errors.reshape(-1),
                                 weights=valid))

    def compute_jensen_shannon_divergence(self, pred1, pred2) -> jax.Array:
        return jensen_shannon_divergence(jnp.asarray(pred1), jnp.asarray(pred2))
