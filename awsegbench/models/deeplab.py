"""DeepLabV3+ with ResNet-50 encoder, implemented natively in Flax.

Replaces the reference's ``segmentation_models_pytorch.DeepLabV3Plus``
dependency (model.py:226-374). Architecture mirrors smp's: ResNet-50
encoder at output-stride 16 (layer4 dilated), ASPP with separable atrous
convs at rates (12, 24, 36) + image pooling, ×4 upsample, low-level (os4)
feature fusion through a 48-channel 1×1 conv, separable 3×3 decoder conv,
1×1 classifier, ×4 bilinear upsample to full resolution.

Documented deviation from the reference: the reference runs the encoder a
second time for the depth path (model.py:356-358); here encoder features
are computed once and shared — numerically identical outputs, ~40% fewer
encoder FLOPs (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import upsample_like
from .heads import ConvBNReLU, DepthEstimationHead, he_fan_out_normal


class Bottleneck(nn.Module):
    """ResNet bottleneck: 1×1 reduce → 3×3 → 1×1 expand(×4) + residual."""

    features: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        y = ConvBNReLU(self.features, kernel_size=1)(x, train)
        y = ConvBNReLU(self.features, kernel_size=3, strides=self.strides,
                       dilation=self.dilation)(y, train)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    kernel_init=he_fan_out_normal)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False,
                               kernel_init=he_fan_out_normal)(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5)(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """ResNet-50 encoder with output-stride 16 (layer4 stride→1, dilation 2).

    Returns features like smp's encoder ``out_channels``
    [identity, stem(64), layer1(256), layer2(512), layer3(1024), layer4(2048)].
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    output_stride: int = 16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 tile_info=None) -> list[jax.Array]:
        feats = [x]
        # stem: 7×7/2 conv + BN + ReLU (+maxpool 3×3/2 afterwards).
        # Kept as a direct conv: exact space-to-depth rewrites (both
        # strided-slice and reshape/transpose phase packing) were A/B'd on
        # chip and LOST (6.70 → 13.8 / 8.9 ms per-part) — with Cin=3 the
        # phase relayout costs more than the MXU padding it removes.
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=he_fan_out_normal)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(y)
        y = nn.relu(y)
        feats.append(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # stage strides/dilations for output_stride 16: layer4 dilated
        if self.output_stride == 16:
            strides = (1, 2, 2, 1)
            dilations = (1, 1, 1, 2)
        elif self.output_stride == 8:
            strides = (1, 2, 1, 1)
            dilations = (1, 1, 2, 4)
        else:  # 32: plain resnet
            strides = (1, 2, 2, 2)
            dilations = (1, 1, 1, 1)

        for stage, (n_blocks, width) in enumerate(zip(self.layers, self.widths)):
            for b in range(n_blocks):
                stride = strides[stage] if b == 0 else 1
                y = Bottleneck(width, strides=stride,
                               dilation=dilations[stage],
                               downsample=(b == 0))(y, train)
            if tile_info is not None:
                # halo resync per stage: ResNet-50's largest per-stage
                # local radius (layer3/layer4, ~96 input px) stays within
                # the halo, keeping tiled inference bit-exact
                y = tile_info.resync(y)
            feats.append(y)
        return feats


class SeparableConvBNReLU(nn.Module):
    """Depthwise 3×3 (dilated) + pointwise 1×1 + BN + ReLU (smp ASPPSeparableConv)."""

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        y = nn.Conv(c, (3, 3), padding='SAME',
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=c, use_bias=False,
                    kernel_init=he_fan_out_normal)(x)
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=he_fan_out_normal)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(y)
        return nn.relu(y)


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling with separable convs + image pooling."""

    features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 tile_info=None) -> jax.Array:
        # Under spatial tiling the WHOLE pyramid runs on the assembled
        # full-image map and tiles are re-extracted afterwards: the atrous
        # rates (12, 24, 36) at os16 reach ~576 input px — far beyond any
        # feasible halo — and the image-pooling branch is global, so
        # per-tile evaluation cannot be exact. The os16 map is small
        # (128×64 at 2048×1024), so full-map compute costs almost nothing.
        if tile_info is not None:
            x = tile_info.assemble_full(x)
        h, w = x.shape[1], x.shape[2]
        branches = [ConvBNReLU(self.features, kernel_size=1)(x, train)]
        for rate in self.atrous_rates:
            branches.append(SeparableConvBNReLU(self.features, rate)(x, train))
        # image pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBNReLU(self.features, kernel_size=1)(pooled, train)
        pooled = jnp.broadcast_to(pooled, (x.shape[0], h, w, self.features))
        branches.append(pooled)

        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.features, kernel_size=1)(y, train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        if tile_info is not None:
            y = tile_info.extract_tiles(y)
        return y


class DeepLabV3PlusModel(nn.Module):
    """DeepLabV3+ with segmentation + optional depth head (model.py:226-374).

    Returns {'segmentation': [B, H, W, num_classes], 'depth': [B, H, W, 1]}.
    """

    num_classes: int = 19
    include_depth: bool = True
    output_stride: int = 16
    decoder_channels: int = 256
    # encoder overrides (ResNet-50 defaults; shrink for tests/small configs)
    encoder_layers: Sequence[int] = (3, 4, 6, 3)
    encoder_widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 tile_info=None) -> Dict[str, jax.Array]:
        h, w = x.shape[1], x.shape[2]
        feats = ResNetEncoder(layers=tuple(self.encoder_layers),
                              widths=tuple(self.encoder_widths),
                              output_stride=self.output_stride)(x, train,
                                                                tile_info)
        high = feats[-1]       # os16, 2048 ch
        low = feats[2]         # os4, 256 ch (layer1)

        y = ASPP(self.decoder_channels)(high, train, tile_info)
        y = SeparableConvBNReLU(self.decoder_channels)(y, train)
        y = upsample_like(y, (low.shape[1], low.shape[2]))

        low_proj = ConvBNReLU(48, kernel_size=1)(low, train)
        y = jnp.concatenate([y, low_proj], axis=-1)
        y = SeparableConvBNReLU(self.decoder_channels)(y, train)

        seg = nn.Conv(self.num_classes, (1, 1),
                      kernel_init=he_fan_out_normal)(y)
        seg = upsample_like(seg, (h, w))
        results = {'segmentation': seg}

        if self.include_depth:
            # encoder features reused (reference re-runs the encoder,
            # model.py:356-358 — documented deviation, same numerics)
            depth = DepthEstimationHead(hidden_channels=256)(high, train)
            results['depth'] = upsample_like(depth, (h, w))
        return results
