"""Prediction heads (segmentation + depth) shared by both model families.

Architecture parity with the reference heads:
* DepthEstimationHead — 3-conv BN/ReLU/Dropout stack → 1 channel + sigmoid
  (model.py:16-78), He fan-out init.
* SegmentationHead — Conv3×3 → BN → ReLU → Dropout(0.1) → Conv1×1
  (model.py:152-158).

All modules are NHWC (TPU-native layout).

Fused-upsample path: in the reference's faithful SegFormer design the head
input is a ×32 bilinear upsample of the stage-4 features (model.py:209-214).
When ``upsample_scale`` is passed, the head takes the COARSE features and
computes its first conv via ``ops.upconv.upsample_conv3x3`` — the exact
algebraic collapse of conv3×3 ∘ upsample — instead of running a dense 3×3
conv over the materialized full-res field. Same function (mod float
reassociation; pinned by tests/test_upconv.py), ~60× fewer MXU FLOPs for
the dominant op. The first conv's parameters live in a ``Conv_0``-named
holder so the variable tree is byte-identical to the plain ``nn.Conv``
layout (checkpoints / converters / pretrained grafting unaffected).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.upconv import upsample_conv3x3

# He-normal fan_out on 'relu' — matches torch kaiming_normal_(mode='fan_out')
he_fan_out = nn.initializers.variance_scaling(2.0, 'fan_out', 'truncated_normal')
he_fan_out_normal = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


class Conv3x3Params(nn.Module):
    """Parameter holder matching ``nn.Conv``'s variable layout exactly
    (``kernel`` [3,3,Cin,Cout] + ``bias`` [Cout]) so the same parameters
    can drive either a plain conv or the fused upsample+conv path."""

    features: int
    kernel_init: nn.initializers.Initializer = he_fan_out_normal

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param('kernel', self.kernel_init,
                            (3, 3, in_features, self.features))
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


def _conv3x3(x: jax.Array, kernel: jax.Array, bias: jax.Array,
             upsample_scale: Optional[int]) -> jax.Array:
    """Apply the head's first 3×3 SAME conv: plain (numerics identical to
    ``nn.Conv``) or fused with an implicit ×scale bilinear upsample."""
    if upsample_scale is not None:
        return upsample_conv3x3(x, kernel, bias, scale=upsample_scale)
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    y = lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + bias.astype(dt)


class ConvBNReLU(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding='SAME', use_bias=False,
                    kernel_init=he_fan_out_normal)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class DepthEstimationHead(nn.Module):
    """Depth head for multi-task learning (reference model.py:16-78).

    ``upsample_scale``: when set, ``features`` is the coarse field and the
    first conv fuses the ×scale bilinear upsample (see module docstring).
    """

    hidden_channels: int = 256
    out_channels: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False,
                 upsample_scale: Optional[int] = None) -> jax.Array:
        k0, b0 = Conv3x3Params(self.hidden_channels, name='Conv_0')(
            features.shape[-1])
        x = _conv3x3(features, k0, b0, upsample_scale)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.hidden_channels // 2, (3, 3), padding='SAME',
                    kernel_init=he_fan_out_normal, name='Conv_1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1),
                    kernel_init=he_fan_out_normal, name='Conv_2')(x)
        return nn.sigmoid(x)


class SegmentationHead(nn.Module):
    """Conv3×3-BN-ReLU-Dropout-Conv1×1 head (reference model.py:152-158).

    ``upsample_scale``: when set, ``features`` is the coarse field and the
    first conv fuses the ×scale bilinear upsample (see module docstring).
    """

    num_classes: int
    hidden_channels: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False,
                 upsample_scale: Optional[int] = None) -> jax.Array:
        k0, b0 = Conv3x3Params(self.hidden_channels, name='Conv_0')(
            features.shape[-1])
        x = _conv3x3(features, k0, b0, upsample_scale)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1),
                    kernel_init=he_fan_out_normal, name='Conv_1')(x)
        return x
