"""Prediction heads (segmentation + depth) shared by both model families.

Architecture parity with the reference heads:
* DepthEstimationHead — 3-conv BN/ReLU/Dropout stack → 1 channel + sigmoid
  (model.py:16-78), He fan-out init.
* SegmentationHead — Conv3×3 → BN → ReLU → Dropout(0.1) → Conv1×1
  (model.py:152-158).

All modules are NHWC (TPU-native layout).
"""

from __future__ import annotations

import flax.linen as nn
import jax

# He-normal fan_out on 'relu' — matches torch kaiming_normal_(mode='fan_out')
he_fan_out = nn.initializers.variance_scaling(2.0, 'fan_out', 'truncated_normal')
he_fan_out_normal = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


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
    """Depth head for multi-task learning (reference model.py:16-78)."""

    hidden_channels: int = 256
    out_channels: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.hidden_channels, (3, 3), padding='SAME',
                    kernel_init=he_fan_out_normal)(features)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.hidden_channels // 2, (3, 3), padding='SAME',
                    kernel_init=he_fan_out_normal)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1),
                    kernel_init=he_fan_out_normal)(x)
        return nn.sigmoid(x)


class SegmentationHead(nn.Module):
    """Conv3×3-BN-ReLU-Dropout-Conv1×1 head (reference model.py:152-158)."""

    num_classes: int
    hidden_channels: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.hidden_channels, (3, 3), padding='SAME',
                    kernel_init=he_fan_out_normal)(features)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1),
                    kernel_init=he_fan_out_normal)(x)
        return x
