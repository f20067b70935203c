#!/usr/bin/env python
"""Measure the REFERENCE's end-to-end eval throughput on this host's CPU.

The reference's own ``scripts/evaluate.py`` loop cannot be imported here:
its ``models/model.py`` imports ``segmentation_models_pytorch`` (and falls
back to ``torchvision``) at module scope, and neither is installed. This
harness therefore reproduces the reference's *workload* end-to-end with
the pieces that DO run plus architecture-equivalent torch members:

1. Per-sample weather corruption + depth estimation: the reference's own
   ``data/preprocessing.py`` executed verbatim from /root/reference
   (loader.py:256-293 per-__getitem__ hot path).
2. ImageNet normalization (loader.py:181-200).
3. Ensemble forward, architecture-equivalent in plain torch:
   * SegFormer member: HF ``SegformerModel`` built from the B0 config —
     the reference's own no-download fallback path (model.py:120-146) —
     then bilinear feature upsample to full resolution, conv seg head, and
     depth head (model.py:152-166, :209-221).
   * DeepLabV3+ member: from-scratch ResNet-50 (output-stride 16, dilated
     layer4) + separable-conv ASPP (rates 12/24/36 + image pooling) +
     low-level-fusion decoder — the same architecture smp builds
     (model.py:259-268) — plus a depth head fed by a SECOND encoder run,
     reproducing the reference's double-encoder-run behavior
     (model.py:356-358).
   * Softmax-weighted logit mix + temperature division (model.py:443-462).
4. Argmax + 19-class confusion-matrix update (metrics.py:62-71 semantics).

All torch code below is an original reimplementation written for this
measurement (NOT copied from the reference); fp32, CPU, default threading —
the reference specifies no hardware, so this host's CPU is the denominator
(BASELINE.md). Used by bench.py; results cached in .bench_baseline.json.
"""

import json
import time
from pathlib import Path

IMAGE_HW = (512, 1024)
NUM_CLASSES = 19


# --------------------------------------------------------------- torch models

def _build_torch_ensemble():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from transformers import SegformerConfig, SegformerModel

    class ConvBNReLU(nn.Sequential):
        def __init__(self, cin, cout, k=3, s=1, d=1):
            super().__init__(
                nn.Conv2d(cin, cout, k, s, d * (k // 2), dilation=d,
                          bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

    class SepConvBNReLU(nn.Sequential):
        def __init__(self, cin, cout, d=1):
            super().__init__(
                nn.Conv2d(cin, cin, 3, 1, d, dilation=d, groups=cin,
                          bias=False),
                nn.Conv2d(cin, cout, 1, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

    class Bottleneck(nn.Module):
        def __init__(self, cin, width, stride=1, dilation=1):
            super().__init__()
            self.a = ConvBNReLU(cin, width, k=1)
            self.b = ConvBNReLU(width, width, k=3, s=stride, d=dilation)
            self.c = nn.Sequential(
                nn.Conv2d(width, width * 4, 1, bias=False),
                nn.BatchNorm2d(width * 4))
            self.down = None
            if stride != 1 or cin != width * 4:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, width * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(width * 4))

        def forward(self, x):
            r = x if self.down is None else self.down(x)
            return F.relu(self.c(self.b(self.a(x))) + r)

    class ResNet50OS16(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = ConvBNReLU(3, 64, k=7, s=2)
            layers, widths = (3, 4, 6, 3), (64, 128, 256, 512)
            strides, dils = (1, 2, 2, 1), (1, 1, 1, 2)
            stages, cin = [], 64
            for n, w, s, d in zip(layers, widths, strides, dils):
                blocks = [Bottleneck(cin, w, s, d)]
                blocks += [Bottleneck(w * 4, w, 1, d) for _ in range(n - 1)]
                stages.append(nn.Sequential(*blocks))
                cin = w * 4
            self.stages = nn.ModuleList(stages)

        def forward(self, x):
            y = F.max_pool2d(self.stem(x), 3, 2, 1)
            feats = []
            for st in self.stages:
                y = st(y)
                feats.append(y)
            return feats[0], feats[-1]  # low (os4, 256), high (os16, 2048)

    class ASPP(nn.Module):
        def __init__(self, cin, cout=256, rates=(12, 24, 36)):
            super().__init__()
            self.b0 = ConvBNReLU(cin, cout, k=1)
            self.bs = nn.ModuleList(
                [SepConvBNReLU(cin, cout, d=r) for r in rates])
            self.pool = ConvBNReLU(cin, cout, k=1)
            self.proj = ConvBNReLU(cout * 5, cout, k=1)
            self.drop = nn.Dropout2d(0.5)

        def forward(self, x):
            h, w = x.shape[-2:]
            ys = [self.b0(x)] + [b(x) for b in self.bs]
            p = self.pool(F.adaptive_avg_pool2d(x, 1))
            ys.append(p.expand(-1, -1, h, w))
            return self.drop(self.proj(torch.cat(ys, 1)))

    class DepthHead(nn.Module):
        """3×(conv-BN-ReLU-dropout) → 1ch sigmoid (model.py:16-78)."""

        def __init__(self, cin, hidden=256):
            super().__init__()
            self.net = nn.Sequential(
                ConvBNReLU(cin, hidden), nn.Dropout2d(0.1),
                ConvBNReLU(hidden, hidden // 2), nn.Dropout2d(0.1),
                nn.Conv2d(hidden // 2, 1, 1), nn.Sigmoid())

        def forward(self, x):
            return self.net(x)

    class DeepLabMember(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = ResNet50OS16()
            self.aspp = ASPP(2048)
            self.pre = SepConvBNReLU(256, 256)
            self.low_proj = ConvBNReLU(256, 48, k=1)
            self.fuse = SepConvBNReLU(304, 256)
            self.cls = nn.Conv2d(256, NUM_CLASSES, 1)
            self.depth_head = DepthHead(2048)

        def forward(self, x):
            hw = x.shape[-2:]
            low, high = self.encoder(x)
            y = self.pre(self.aspp(high))
            y = F.interpolate(y, size=low.shape[-2:], mode='bilinear',
                              align_corners=False)
            y = self.fuse(torch.cat([y, self.low_proj(low)], 1))
            seg = F.interpolate(self.cls(y), size=hw, mode='bilinear',
                                align_corners=False)
            # reference quirk: the depth path re-runs the encoder
            # (model.py:356-358) — reproduce the compute
            _, high2 = self.encoder(x)
            depth = F.interpolate(self.depth_head(high2), size=hw,
                                  mode='bilinear', align_corners=False)
            return seg, depth

    class SegFormerMember(nn.Module):
        def __init__(self):
            super().__init__()
            cfg = SegformerConfig(
                num_channels=3, num_encoder_blocks=4, depths=[2, 2, 2, 2],
                sr_ratios=[8, 4, 2, 1], hidden_sizes=[32, 64, 160, 256],
                patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2],
                num_attention_heads=[1, 2, 5, 8], mlp_ratios=[4, 4, 4, 4])
            self.encoder = SegformerModel(cfg)
            self.seg_head = nn.Sequential(
                ConvBNReLU(256, 256), nn.Dropout2d(0.1),
                nn.Conv2d(256, NUM_CLASSES, 1))
            self.depth_head = DepthHead(256)

        def forward(self, x):
            hw = x.shape[-2:]
            feat = self.encoder(x).last_hidden_state  # [B, 256, H/32, W/32]
            # reference upsamples FEATURES to full res before the heads
            # (model.py:209-211) — the memory-heavy faithful design
            feat = F.interpolate(feat, size=hw, mode='bilinear',
                                 align_corners=False)
            return self.seg_head(feat), self.depth_head(feat)

    class Ensemble(nn.Module):
        def __init__(self):
            super().__init__()
            self.segformer = SegFormerMember()
            self.deeplab = DeepLabMember()
            self.weights = nn.Parameter(torch.ones(2))
            self.temperature = nn.Parameter(torch.ones(1))

        def forward(self, x):
            s_seg, _ = self.segformer(x)
            d_seg, _ = self.deeplab(x)
            w = torch.softmax(self.weights, 0)
            mix = (w[0] * s_seg + w[1] * d_seg) / self.temperature
            return mix

    torch.manual_seed(0)
    model = Ensemble().eval()
    return model


# ------------------------------------------------------------------- measure

def _load_reference_preprocessing():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'ref_preproc',
        '/root/reference/src/adverse_weather_semantic_segmentation_'
        'robustness_benchmark/data/preprocessing.py')
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)
    return rp


def measure_reference_pipeline(n: int = 8) -> float:
    """Data-pipeline-only throughput (corruption + depth), images/sec."""
    import numpy as np
    rp = _load_reference_preprocessing()
    wt = rp.WeatherDegradationTransforms(seed=0)
    dp = rp.DepthEstimationPreprocessor()
    rng = np.random.default_rng(0)
    weathers = ['fog', 'rain', 'snow', 'night']
    imgs = [rng.integers(0, 255, (*IMAGE_HW, 3), dtype=np.uint8)
            for _ in range(n)]
    _ = wt.apply_weather_effect(imgs[0], 'fog')  # warmup
    t0 = time.perf_counter()
    for i in range(n):
        corrupted = wt.apply_weather_effect(imgs[i], weathers[i % 4])
        _ = dp.estimate_depth(corrupted)
    return n / (time.perf_counter() - t0)


def measure_reference_e2e(n_fwd: int = 2) -> dict:
    """End-to-end eval throughput: pipeline + normalize + ensemble forward
    + argmax + confusion update. Forward is timed on ``n_fwd`` images and
    combined with the pipeline per-image time (the loop is sequential in
    the reference: DataLoader workers + main-process forward; with
    num_workers>0 they could overlap, so we ALSO report the
    forward-only bound — the reported e2e uses max(fwd, pipeline) per
    image, i.e. perfect overlap, the most favorable assumption for the
    reference)."""
    import numpy as np
    import torch

    pipeline_ips = measure_reference_pipeline()
    t_pipe = 1.0 / pipeline_ips

    model = _build_torch_ensemble()
    rng = np.random.default_rng(0)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    cm = torch.zeros(NUM_CLASSES, NUM_CLASSES, dtype=torch.long)
    times = []
    with torch.no_grad():
        for i in range(n_fwd + 1):  # +1 warmup
            img = rng.integers(0, 255, (*IMAGE_HW, 3),
                               dtype=np.uint8).astype(np.float32)
            x = ((img / 255.0 - mean) / std).transpose(2, 0, 1)[None]
            label = torch.from_numpy(
                rng.integers(0, NUM_CLASSES, IMAGE_HW).astype(np.int64))
            t0 = time.perf_counter()
            logits = model(torch.from_numpy(x))
            pred = logits.argmax(1)[0]
            idx = label.reshape(-1) * NUM_CLASSES + pred.reshape(-1)
            cm.view(-1).index_add_(0, idx, torch.ones_like(idx))
            t1 = time.perf_counter()
            if i > 0:
                times.append(t1 - t0)
    t_fwd = float(np.mean(times))
    # perfect pipeline/compute overlap (most favorable to the reference)
    t_e2e = max(t_fwd, t_pipe)
    return {
        'ref_pipeline_images_per_sec': pipeline_ips,
        'ref_forward_sec_per_image': t_fwd,
        'ref_e2e_images_per_sec': 1.0 / t_e2e,
        'image_hw': IMAGE_HW,
        'note': 'e2e assumes perfect DataLoader/compute overlap '
                '(max(t_fwd, t_pipe) per image). Forward is an '
                'architecture-equivalent torch ensemble (smp/torchvision '
                'not installed; reference model.py cannot import here). '
                'fp32 CPU, this host.',
    }


def main():
    out = measure_reference_e2e()
    cache = Path(__file__).resolve().parent / '.bench_baseline.json'
    cache.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
