"""Confidence-calibrated ensemble of SegFormer + DeepLabV3+.

Flax re-implementation of the reference ``EnsembleModel``
(model.py:377-513): both members' forwards fuse into ONE jitted XLA program
(no sequential module calls across frameworks), learnable 2-vector ensemble
weights softmaxed before mixing logits, per-pixel max-confidence selection
strategy, learnable temperature dividing the mixed logits, and the
mutual-KL disagreement map with the reference's reversed-KL quirk
(model.py:508-509).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .deeplab import DeepLabV3PlusModel
from .segformer import SegFormerModel, mit_variant_config


class EnsembleModel(nn.Module):
    num_classes: int = 19
    include_depth: bool = True
    ensemble_strategy: str = 'weighted_average'
    temperature_scaling: bool = True
    head_mode: str = 'faithful'
    fused_upsample: bool = True
    remat: bool = False  # checkpoint SegFormer encoder blocks in training
    segformer_variant: str = 'b0'  # MiT family member (segformer.MIT_VARIANTS)

    def setup(self) -> None:
        hidden_sizes, depths = mit_variant_config(self.segformer_variant)
        self.segformer = SegFormerModel(num_classes=self.num_classes,
                                        include_depth=self.include_depth,
                                        head_mode=self.head_mode,
                                        fused_upsample=self.fused_upsample,
                                        remat=self.remat,
                                        hidden_sizes=hidden_sizes,
                                        depths=depths)
        self.deeplabv3plus = DeepLabV3PlusModel(num_classes=self.num_classes,
                                                include_depth=self.include_depth)
        # learnable ensemble weights, init 1/2 each (model.py:420)
        self.ensemble_weights = self.param(
            'ensemble_weights', lambda _: jnp.ones((2,), jnp.float32) / 2)
        if self.temperature_scaling:
            self.temperature = self.param(
                'temperature', lambda _: jnp.ones((1,), jnp.float32))

    def __call__(self, x: jax.Array, train: bool = False,
                 tile_info=None) -> Dict[str, jax.Array]:
        seg_out = self.segformer(x, train, tile_info)
        dlv_out = self.deeplabv3plus(x, train, tile_info)

        s1 = seg_out['segmentation']
        s2 = dlv_out['segmentation']

        if self.ensemble_strategy == 'weighted_average':
            weights = jax.nn.softmax(self.ensemble_weights.astype(s1.dtype))
            ensemble_seg = weights[0] * s1 + weights[1] * s2
        elif self.ensemble_strategy == 'max_confidence':
            # per-pixel pick of the more confident member (model.py:447-455)
            c1 = jnp.max(jax.nn.softmax(s1, axis=-1), axis=-1, keepdims=True)
            c2 = jnp.max(jax.nn.softmax(s2, axis=-1), axis=-1, keepdims=True)
            use_segformer = (c1 > c2).astype(s1.dtype)
            ensemble_seg = use_segformer * s1 + (1.0 - use_segformer) * s2
        else:  # simple average
            ensemble_seg = (s1 + s2) / 2.0

        if self.temperature_scaling:
            ensemble_seg = ensemble_seg / self.temperature.astype(ensemble_seg.dtype)

        results = {
            'segmentation': ensemble_seg,
            'segformer_seg': s1,
            'deeplabv3plus_seg': s2,
        }

        if self.include_depth:
            d1 = seg_out['depth']
            d2 = dlv_out['depth']
            if self.ensemble_strategy == 'weighted_average':
                weights = jax.nn.softmax(self.ensemble_weights.astype(d1.dtype))
                ensemble_depth = weights[0] * d1 + weights[1] * d2
            else:
                ensemble_depth = (d1 + d2) / 2.0
            results.update({
                'depth': ensemble_depth,
                'segformer_depth': d1,
                'deeplabv3plus_depth': d2,
            })
        return results

    def get_ensemble_disagreement(self, x: jax.Array) -> jax.Array:
        """Mutual reversed-KL disagreement map [B, H, W] (model.py:488-513)."""
        outputs = self(x, train=False)
        p1 = jax.nn.softmax(outputs['segformer_seg'].astype(jnp.float32), axis=-1)
        p2 = jax.nn.softmax(outputs['deeplabv3plus_seg'].astype(jnp.float32), axis=-1)
        m = (p1 + p2) / 2.0
        # torch F.kl_div(p.log(), m) == KL(m ‖ p) — quirk preserved
        kl1 = jnp.sum(m * (jnp.log(m) - jnp.log(p1)), axis=-1)
        kl2 = jnp.sum(m * (jnp.log(m) - jnp.log(p2)), axis=-1)
        return (kl1 + kl2) / 2.0
