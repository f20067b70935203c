"""Prediction heads (segmentation + depth) shared by both model families.

Architecture parity with the reference heads:
* DepthEstimationHead — 3-conv BN/ReLU/Dropout stack → 1 channel + sigmoid
  (model.py:16-78), He fan-out init.
* SegmentationHead — Conv3×3 → BN → ReLU → Dropout(0.1) → Conv1×1
  (model.py:152-158).

All modules are NHWC (TPU-native layout).

Execution paths (same parameters, same variable tree — pinned by tests):
1. plain — materialized input, manual conv/BN numerically matching
   ``nn.Conv``/``nn.BatchNorm``;
2. fused upsample (``upsample_scale=``) — the faithful SegFormer design
   feeds the heads a ×32 bilinear upsample of stage-4 features
   (model.py:209-214); the first conv then collapses algebraically with
   the upsample (``ops/upconv.py``);
3. Pallas (eval mode on TPU, ``upsample_scale`` set) — the WHOLE head runs
   as one fused kernel per 32×32 output tile (``ops/headkernels.py``):
   full-res hidden activations never touch HBM.

Parameters live in ``Conv_N``/``BatchNorm_N``-named holders whose variable
layout is byte-identical to the ``nn.Conv``/``nn.BatchNorm`` modules they
replace, so checkpoints, converters, and pretrained grafting are
unaffected.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.headkernels import pallas_heads_available, seg_head_fused
from ..ops.depthkernels_train import depth_stage1_fused_train
from ..ops.headkernels_train import seg_head_fused_train
from ..ops.upconv import upsample_conv3x3

# He-normal fan_out on 'relu' — matches torch kaiming_normal_(mode='fan_out')
he_fan_out = nn.initializers.variance_scaling(2.0, 'fan_out', 'truncated_normal')
he_fan_out_normal = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def _env_flag(name: str) -> bool:
    """Conventional truthiness: '', '0', 'false', 'no' (any case) = unset."""
    return os.environ.get(name, '').strip().lower() not in (
        '', '0', 'false', 'no')


def _pallas_heads_enabled() -> bool:
    if _env_flag('AWSEG_DISABLE_PALLAS_HEADS'):
        return False
    return pallas_heads_available()


def _pallas_train_enabled(module: nn.Module, features: jax.Array,
                          upsample_scale, min_scale: int = 1) -> bool:
    """Single gate for the fused train-mode head kernels — shared so the
    seg and depth heads can never silently diverge on routing."""
    return (upsample_scale is not None
            and not module.is_initializing()
            and _pallas_heads_enabled()
            and not _env_flag('AWSEG_DISABLE_TRAIN_HEADS')
            and features.shape[1] >= 2 and features.shape[2] >= 2
            and upsample_scale >= min_scale)


class ConvParams(nn.Module):
    """Parameter holder matching ``nn.Conv``'s variable layout exactly
    (``kernel`` [kh,kw,Cin,Cout] + ``bias`` [Cout]) so the same parameters
    can drive either module-style or raw-kernel execution paths."""

    features: int
    kernel_size: int = 3
    kernel_init: nn.initializers.Initializer = he_fan_out_normal

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        kernel = self.param('kernel', self.kernel_init,
                            (k, k, in_features, self.features))
        bias = self.param('bias', nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class BatchNormParams(nn.Module):
    """``nn.BatchNorm``-compatible holder + manual forward.

    Variable layout matches ``nn.BatchNorm(momentum=.9, epsilon=1e-5)``:
    params ``scale``/``bias``, batch_stats ``mean``/``var``. ``__call__``
    with an array reproduces flax semantics (train: f32 fast-variance batch
    stats + running-stat momentum update; eval: running stats); with
    ``x=None`` it returns the raw arrays for the fused kernel path.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x: Optional[jax.Array], train: bool = False,
                 features: Optional[int] = None, set_stats=None):
        c = features if features is not None else x.shape[-1]
        scale = self.param('scale', nn.initializers.ones_init(), (c,))
        bias = self.param('bias', nn.initializers.zeros_init(), (c,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable('batch_stats', 'var',
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        if set_stats is not None:
            # externally computed batch stats (fused train kernels): fold
            # into the running stats exactly as the train branch below
            mean, var = set_stats
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum)
                                 * mean.astype(jnp.float32))
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum)
                                * var.astype(jnp.float32))
            return scale, bias, ra_mean.value, ra_var.value
        if x is None:
            return scale, bias, ra_mean.value, ra_var.value

        if train and not self.is_initializing():
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            var = jnp.mean(xf * xf, axes) - mean * mean
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        dt = jnp.promote_types(x.dtype, scale.dtype)
        mul = lax.rsqrt(var.astype(dt) + jnp.asarray(self.epsilon, dt))
        mul = mul * scale.astype(dt)
        return (x.astype(dt) - mean.astype(dt)) * mul + bias.astype(dt)


def _conv(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """SAME conv numerically matching ``nn.Conv`` (dtype promotion incl.)."""
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    y = lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + bias.astype(dt)


def _conv3x3(x: jax.Array, kernel: jax.Array, bias: jax.Array,
             upsample_scale: Optional[int]) -> jax.Array:
    """First head conv: plain, or fused with an implicit ×scale upsample."""
    if upsample_scale is not None:
        return upsample_conv3x3(x, kernel, bias, scale=upsample_scale)
    return _conv(x, kernel, bias)


class ConvBNReLU(nn.Module):
    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # torch-style symmetric padding (pad = d·(k−1)/2 per side), NOT
        # 'SAME': identical for stride 1, but at stride 2 flax 'SAME' pads
        # (0, 1) on even inputs while torch pads (1, 1) — a one-pixel
        # alignment shift that breaks numeric parity with torch-trained
        # weights (ResNet layer2.0/layer3.0 conv2, reference model.py:259).
        p = self.dilation * (self.kernel_size // 2)
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=[(p, p), (p, p)], use_bias=False,
                    kernel_init=he_fan_out_normal)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class DepthEstimationHead(nn.Module):
    """Depth head for multi-task learning (reference model.py:16-78).

    ``upsample_scale``: when set, ``features`` is the coarse field and the
    head fuses the ×scale bilinear upsample (see module docstring).
    """

    hidden_channels: int = 256
    out_channels: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False,
                 upsample_scale: Optional[int] = None) -> jax.Array:
        c1 = self.hidden_channels
        c2 = self.hidden_channels // 2
        k0, b0 = ConvParams(c1, 3, name='Conv_0')(features.shape[-1])
        bn0 = BatchNormParams(name='BatchNorm_0')
        k1, b1 = ConvParams(c2, 3, name='Conv_1')(c1)
        bn1 = BatchNormParams(name='BatchNorm_1')
        k2, b2 = ConvParams(self.out_channels, 1, name='Conv_2')(c2)

        # Eval mode runs the XLA upconv path unconditionally: it is
        # compute-bound at near-peak MXU rate (the full-res conv2 alone is
        # ~2.5 TFLOPs/B8, and the measured head is ~38 ms/B8 ≈ the 37 ms
        # FLOP floor at v5e bf16 peak), so no kernel can beat it without
        # changing the math. A roll-based fused Pallas variant was A/B'd
        # on chip twice and lost both times (24.7 vs 18.5 ms windowed-r2,
        # 49.8 vs 38.1 ms f32-rolls-r5); it was deleted after the second
        # loss rather than kept dead behind an env flag.

        # train-mode fused stage 1: batch stats in the coarse domain +
        # counter-hash dropout + custom-VJP backward; BN2/ReLU/proj tail
        # stays in XLA (flax-exact BN2 train semantics via bn1)
        use_pallas_train = (train and _pallas_train_enabled(
            self, features, upsample_scale, min_scale=4))
        if use_pallas_train:
            s0, o0, _, _ = bn0(None, features=c1)
            rng_key = (self.make_rng('dropout')
                       if self.dropout > 0.0 else None)
            h2, m1, v1 = depth_stage1_fused_train(
                features, k0, b0, s0, o0, BN_EPS, k1,
                rate=self.dropout, rng_key=rng_key, scale=upsample_scale)
            bn0(None, features=c1, set_stats=(m1, v1))
            x = nn.relu(bn1(h2 + b1.astype(h2.dtype), train))
            x = _conv(x, k2, b2)
            return nn.sigmoid(x)

        x = _conv3x3(features, k0, b0, upsample_scale)
        x = nn.relu(bn0(x, train))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = _conv(x, k1, b1)
        x = nn.relu(bn1(x, train))
        x = _conv(x, k2, b2)
        return nn.sigmoid(x)


class SegmentationHead(nn.Module):
    """Conv3×3-BN-ReLU-Dropout-Conv1×1 head (reference model.py:152-158).

    ``upsample_scale``: when set, ``features`` is the coarse field and the
    head fuses the ×scale bilinear upsample (see module docstring).
    """

    num_classes: int
    hidden_channels: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, features: jax.Array, train: bool = False,
                 upsample_scale: Optional[int] = None) -> jax.Array:
        c1 = self.hidden_channels
        k0, b0 = ConvParams(c1, 3, name='Conv_0')(features.shape[-1])
        bn0 = BatchNormParams(name='BatchNorm_0')
        kp, bp = ConvParams(self.num_classes, 1, name='Conv_1')(c1)

        use_pallas = (upsample_scale is not None and not train
                      and not self.is_initializing()
                      and _pallas_heads_enabled())
        if use_pallas:
            s0, o0, m0, v0 = bn0(None, features=c1)
            return seg_head_fused(features, k0, b0, s0, o0, m0, v0, BN_EPS,
                                  kp, bp, scale=upsample_scale)

        # train-mode fused path: batch stats in the coarse domain +
        # in-kernel hardware-PRNG dropout + custom-VJP backward
        use_pallas_train = (train and _pallas_train_enabled(
            self, features, upsample_scale))
        if use_pallas_train:
            s0, o0, _, _ = bn0(None, features=c1)
            rng_key = (self.make_rng('dropout')
                       if self.dropout > 0.0 else None)
            y, mean, var = seg_head_fused_train(
                features, k0, b0, s0, o0, BN_EPS, kp, bp,
                rate=self.dropout, rng_key=rng_key, scale=upsample_scale)
            bn0(None, features=c1, set_stats=(mean, var))
            return y

        x = _conv3x3(features, k0, b0, upsample_scale)
        x = nn.relu(bn0(x, train))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return _conv(x, kp, bp)
