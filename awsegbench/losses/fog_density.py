"""Fog-density-aware loss — pure functions for the jitted train step.

Functional re-design of the reference ``FogDensityAwareLoss``
(model.py:516-676): per-pixel cross-entropy (or focal) reweighted by
``1 + fog_sensitivity · fog_density``, optional fog density derived from
predicted depth with a gradient-based edge discount, and MSE depth loss
scaled by ``depth_loss_weight``. Returns the same
{'total_loss', 'segmentation_loss', 'depth_loss'} dict.

All semantic quirks preserved (SURVEY.md §6 items 8/12):
* fog-from-depth only kicks in when no fog_density is given AND depth is
  predicted (model.py:590-597);
* depth MSE is only added when a depth target exists (model.py:599-604);
* the edge discount subtracts 0.3 where the depth-gradient magnitude
  exceeds its mean (model.py:664-675).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _per_pixel_ce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-pixel cross entropy. logits [B, H, W, C] (NHWC), targets [B, H, W].

    torch ``nn.CrossEntropyLoss(reduction='none')`` semantics; out-of-range
    targets (e.g. raw Cityscapes ids ≥ C, which crash the torch reference)
    contribute zero loss here rather than erroring.
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    in_range = (targets >= 0) & (targets < num_classes)
    t_safe = jnp.clip(targets, 0, num_classes - 1).astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, t_safe[..., None], axis=-1)[..., 0]
    return jnp.where(in_range, nll, 0.0)


def _focal_loss(logits: jax.Array, targets: jax.Array,
                alpha: float = 1.0, gamma: float = 2.0) -> jax.Array:
    """Focal loss (model.py:619-642): α·(1−e^{−CE})^γ·CE per pixel."""
    ce = _per_pixel_ce(logits, targets)
    pt = jnp.exp(-ce)
    return alpha * (1.0 - pt) ** gamma * ce


def estimate_fog_density_from_depth(depth: jax.Array) -> jax.Array:
    """Fog density heuristic from predicted depth [B, H, W] (model.py:644-676).

    Normalizes depth over the whole batch (matching torch's global
    ``depth.min()``/``depth.max()``), scales by 0.7, and subtracts a 0.3
    edge discount where the forward-difference gradient magnitude exceeds
    its mean. Gradients use replicate padding on the trailing edge.
    """
    dmin, dmax = jnp.min(depth), jnp.max(depth)
    depth_norm = (depth - dmin) / (dmax - dmin + 1e-8)
    fog_density = depth_norm * 0.7

    gx = jnp.abs(depth[:, :, 1:] - depth[:, :, :-1])
    gy = jnp.abs(depth[:, 1:, :] - depth[:, :-1, :])
    gx = jnp.pad(gx, ((0, 0), (0, 0), (0, 1)), mode='edge')
    gy = jnp.pad(gy, ((0, 0), (0, 1), (0, 0)), mode='edge')
    grad_mag = jnp.sqrt(gx ** 2 + gy ** 2 + 1e-8)

    edge_mask = (grad_mag > jnp.mean(grad_mag)).astype(depth.dtype) * 0.3
    return jnp.clip(fog_density - edge_mask, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class FogDensityAwareLoss:
    """Callable config holder — functional analog of the reference module."""

    base_loss: str = 'cross_entropy'
    depth_weight: float = 0.5
    fog_sensitivity: float = 2.0
    depth_loss_weight: float = 0.1

    def __call__(self, predictions: Dict[str, jax.Array],
                 targets: Dict[str, jax.Array],
                 fog_density: Optional[jax.Array] = None,
                 sample_mask: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        """``sample_mask`` ([B] 0/1) excludes rows padded for even device
        sharding from every mean — no reference counterpart (single-device).
        """
        seg_pred = predictions['segmentation']   # [B, H, W, C] NHWC
        seg_target = targets['label']            # [B, H, W] int

        if self.base_loss == 'focal':
            seg_loss = _focal_loss(seg_pred, seg_target)
        else:
            seg_loss = _per_pixel_ce(seg_pred, seg_target)

        if fog_density is not None:
            fog_weight = 1.0 + self.fog_sensitivity * fog_density
            seg_loss = seg_loss * fog_weight

        def _masked_mean(x: jax.Array) -> jax.Array:
            if sample_mask is None:
                return jnp.mean(x)
            w = sample_mask.astype(jnp.float32).reshape(
                (-1,) + (1,) * (x.ndim - 1))
            return jnp.sum(x * w) / jnp.maximum(
                jnp.sum(w) * (x.size / x.shape[0]), 1.0)

        depth_loss = jnp.float32(0.0)
        if 'depth' in predictions and self.depth_weight > 0:
            pred_depth = predictions['depth'][..., 0]  # drop channel dim

            if fog_density is None:
                fd = estimate_fog_density_from_depth(pred_depth.astype(jnp.float32))
                fog_weight = 1.0 + self.fog_sensitivity * fd
                seg_loss = seg_loss * fog_weight

            if 'depth' in targets:
                depth_target = targets['depth']
                depth_loss = _masked_mean(
                    (pred_depth.astype(jnp.float32) - depth_target) ** 2)

        total_seg_loss = _masked_mean(seg_loss)
        total_loss = total_seg_loss + self.depth_loss_weight * depth_loss
        return {
            'total_loss': total_loss,
            'segmentation_loss': total_seg_loss,
            'depth_loss': depth_loss,
        }


def cross_entropy_loss(predictions: Dict[str, jax.Array],
                       targets: Dict[str, jax.Array],
                       fog_density: Optional[jax.Array] = None
                       ) -> Dict[str, jax.Array]:
    """Plain mean CE fallback (trainer.py:244-248 'cross_entropy' path)."""
    seg_loss = jnp.mean(_per_pixel_ce(predictions['segmentation'],
                                      targets['label']))
    return {
        'total_loss': seg_loss,
        'segmentation_loss': seg_loss,
        'depth_loss': jnp.float32(0.0),
    }
