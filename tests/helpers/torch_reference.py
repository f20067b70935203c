"""Run the REFERENCE's own models/model.py here, with its missing deps
stubbed, so end-to-end cross-framework parity can be oracle-tested.

The reference imports ``segmentation_models_pytorch`` (smp) and
``torchvision`` at module scope (model.py:9-11); neither is installed in
this environment. This helper installs:

* a ``segmentation_models_pytorch`` stub whose ``DeepLabV3Plus`` is an
  architecture twin of our JAX ``models/deeplab.py`` (ResNet-50 at
  output-stride 16, separable ASPP at rates 12/24/36 + image pooling,
  48-channel low-level fusion decoder — the same architecture smp builds,
  model.py:259-268), written in plain torch with conversion-friendly
  module names (torchvision encoder naming; ``dw``/``pw``/``bn`` for
  separable convs). The reference's wrapper code (depth head on
  ``model.encoder(x)[-1]``, the double encoder run, the upsamples) then
  executes verbatim.
* a minimal ``torchvision`` stub (only reached on the reference's smp
  fallback path, which these tests never take).

With the stubs in place, ``load_reference_model_module()`` imports the
reference's model.py so its ``SegFormerModel`` / ``EnsembleModel`` /
``FogDensityAwareLoss`` classes run unmodified (offline: HF_HUB_OFFLINE
forces the from-scratch B0 config fallback, model.py:111-146).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

REFERENCE_MODEL_PY = (
    '/root/reference/src/adverse_weather_semantic_segmentation_'
    'robustness_benchmark/models/model.py')


def _build_smp_stub():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class _ConvBN(nn.Module):
        """conv(k, bias-free) + BN + ReLU, torch-style symmetric padding
        (matches our heads.ConvBNReLU geometry exactly)."""

        def __init__(self, cin, cout, k=3, stride=1, dilation=1):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, stride,
                                  dilation * (k // 2), dilation=dilation,
                                  bias=False)
            self.bn = nn.BatchNorm2d(cout)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class _SepConv(nn.Module):
        """depthwise 3×3 (dilated) + pointwise 1×1 + BN + ReLU (our
        SeparableConvBNReLU twin)."""

        def __init__(self, cin, cout, dilation=1):
            super().__init__()
            self.dw = nn.Conv2d(cin, cin, 3, 1, dilation, dilation=dilation,
                                groups=cin, bias=False)
            self.pw = nn.Conv2d(cin, cout, 1, bias=False)
            self.bn = nn.BatchNorm2d(cout)

        def forward(self, x):
            return F.relu(self.bn(self.pw(self.dw(x))))

    class _Bottleneck(nn.Module):
        """torchvision-named ResNet v1.5 bottleneck (stride on conv2)."""

        def __init__(self, cin, width, stride=1, dilation=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride, dilation,
                                   dilation=dilation, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(width * 4)
            self.downsample = None
            if stride != 1 or cin != width * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(width * 4))

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = F.relu(self.bn1(self.conv1(x)))
            y = F.relu(self.bn2(self.conv2(y)))
            return F.relu(self.bn3(self.conv3(y)) + r)

    class _ResNet50OS16(nn.Module):
        """torchvision-named ResNet-50, output-stride 16 (layer4 stride→1,
        dilation 2 on EVERY layer4 block, mirroring our ResNetEncoder)."""

        def __init__(self, layers=(3, 4, 6, 3)):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            widths, strides, dils = (64, 128, 256, 512), (1, 2, 2, 1), \
                (1, 1, 1, 2)
            cin = 64
            for s, (n, w) in enumerate(zip(layers, widths)):
                blocks = [_Bottleneck(cin, w, strides[s], dils[s])]
                blocks += [_Bottleneck(w * 4, w, 1, dils[s])
                           for _ in range(n - 1)]
                setattr(self, f'layer{s + 1}', nn.Sequential(*blocks))
                cin = w * 4
            self.out_channels = [3, 64, 256, 512, 1024, 2048]

        def forward(self, x):
            feats = [x]
            y = F.relu(self.bn1(self.conv1(x)))
            feats.append(y)
            y = F.max_pool2d(y, 3, 2, 1)
            for s in range(4):
                y = getattr(self, f'layer{s + 1}')(y)
                feats.append(y)
            return feats  # smp encoder contract: list, [-1] = os16 2048ch

    class _ASPP(nn.Module):
        def __init__(self, cin=2048, cout=256, rates=(12, 24, 36)):
            super().__init__()
            self.b0 = _ConvBN(cin, cout, k=1)
            for i, r in enumerate(rates):
                setattr(self, f'sep{i}', _SepConv(cin, cout, dilation=r))
            self.pool = _ConvBN(cin, cout, k=1)
            self.proj = _ConvBN(cout * 5, cout, k=1)
            self.drop = nn.Dropout2d(0.5)

        def forward(self, x):
            h, w = x.shape[-2:]
            ys = [self.b0(x)] + [getattr(self, f'sep{i}')(x)
                                 for i in range(3)]
            p = self.pool(F.adaptive_avg_pool2d(x, 1))
            ys.append(p.expand(-1, -1, h, w))
            return self.drop(self.proj(torch.cat(ys, 1)))

    class DeepLabV3Plus(nn.Module):
        """smp.DeepLabV3Plus-compatible stand-in: same constructor surface
        (model.py:259-266), ``.encoder`` feature-list contract used by the
        reference's depth path (model.py:356-358), seg logits at input
        resolution from forward."""

        def __init__(self, encoder_name='resnet50', encoder_weights=None,
                     classes=19, activation=None, aux_params=None,
                     in_channels=3):
            super().__init__()
            if encoder_name != 'resnet50':
                raise ValueError(f'stub supports resnet50, got {encoder_name}')
            self.encoder = _ResNet50OS16()
            self.aspp = _ASPP()
            self.pre = _SepConv(256, 256)
            self.low_proj = _ConvBN(256, 48, k=1)
            self.fuse = _SepConv(304, 256)
            self.cls = nn.Conv2d(256, classes, 1)

        def forward(self, x):
            feats = self.encoder(x)
            low, high = feats[2], feats[-1]
            y = self.pre(self.aspp(high))
            y = torch.nn.functional.interpolate(
                y, size=low.shape[-2:], mode='bilinear',
                align_corners=False)
            y = self.fuse(torch.cat([y, self.low_proj(low)], 1))
            return torch.nn.functional.interpolate(
                self.cls(y), size=x.shape[-2:], mode='bilinear',
                align_corners=False)

    mod = types.ModuleType('segmentation_models_pytorch')
    mod.DeepLabV3Plus = DeepLabV3Plus
    return mod


def _build_torchvision_stub():
    mod = types.ModuleType('torchvision')
    models = types.ModuleType('torchvision.models')

    def _unavailable(*a, **k):
        raise RuntimeError('torchvision stub: pretrained backbones are not '
                           'available in this environment')

    models.resnet50 = _unavailable
    models.resnet101 = _unavailable
    mod.models = models
    sys.modules.setdefault('torchvision.models', models)
    return mod


def install_stubs() -> None:
    """Idempotently install the smp/torchvision stubs and force HF offline
    (so the reference's pretrained path falls back to the from-scratch B0
    config instantly instead of attempting a download)."""
    os.environ.setdefault('HF_HUB_OFFLINE', '1')
    os.environ.setdefault('TRANSFORMERS_OFFLINE', '1')
    if 'segmentation_models_pytorch' not in sys.modules:
        sys.modules['segmentation_models_pytorch'] = _build_smp_stub()
    if 'torchvision' not in sys.modules:
        sys.modules['torchvision'] = _build_torchvision_stub()


_CACHED = None


def load_reference_model_module():
    """Import the reference's models/model.py (with stubs) and return it."""
    global _CACHED
    if _CACHED is not None:
        return _CACHED
    install_stubs()
    spec = importlib.util.spec_from_file_location('ref_models',
                                                  REFERENCE_MODEL_PY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _CACHED = mod
    return mod
