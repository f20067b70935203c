#!/usr/bin/env python
"""Profile DeepLabV3+ sub-components on the real chip (VERDICT r3 item 3a).

The model-level profiler (profile_eval.py) showed DeepLabV3+ forward at
~16.3 ms/B8 @512x1024 with zero kernel work so far; this script breaks
that down so the optimization lands where the time actually is. Each part
is timed in isolation on random bf16 inputs of its production shape with
the chained-donated-carry methodology (single fetch barrier — see
bench.py; single dispatches carry ~28 ms of tunnel RPC latency):

  stem     — 7x7/2 conv + BN + ReLU + 3x3/2 maxpool   (B,H,W,3)
  l1..l4   — ResNet-50 stages (l4 dilated, os16)
  aspp     — full pyramid incl. image pooling          (B,H/16,W/16,2048)
  decoder  — sep conv + x4 up + low fusion + sep conv
             + classifier + x4 up
  depth    — DepthEstimationHead                        (B,H/16,W/16,2048)
  full     — whole DeepLabV3PlusModel (cross-check: sum of parts ~ full)

Usage: python scripts/profile_deeplab.py [--parts ...] [--hw 64x128]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.jax_compile_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
B = 8


def timeit(fn, carry, xs, warmup=2, measure=8):
    for i in range(warmup):
        carry = fn(carry, xs[i % len(xs)])
    np.asarray(jax.tree_util.tree_leaves(carry)[0])
    t0 = time.perf_counter()
    for i in range(measure):
        carry = fn(carry, xs[i % len(xs)])
    np.asarray(jax.tree_util.tree_leaves(carry)[0])
    return (time.perf_counter() - t0) / measure


def report(name, dt):
    print(f"  {name:10s} {dt*1e3:8.2f} ms/B{B}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--parts',
                    default='stem,l1,l2,l3,l4,aspp,decoder,depth,full')
    ap.add_argument('--measure', type=int, default=8)
    ap.add_argument('--hw', default=None,
                    help='override HxW (e.g. 64x128 for a CPU smoke run)')
    args = ap.parse_args()
    parts = [p for p in args.parts.split(',') if p]
    if args.hw:
        global H, W
        H, W = (int(v) for v in args.hw.split('x'))

    from awsegbench.models.deeplab import (ASPP, Bottleneck,
                                           DeepLabV3PlusModel,
                                           SeparableConvBNReLU)
    from awsegbench.models.heads import (ConvBNReLU, DepthEstimationHead,
                                         he_fan_out_normal)
    from awsegbench.models import init_model
    from awsegbench.ops.resize import upsample_like

    rng = np.random.default_rng(0)

    def bf16(shape):
        return [jax.device_put(
            rng.normal(size=shape).astype(np.float32).astype(jnp.bfloat16))
            for _ in range(2)]

    def run(name, module, in_shape, apply=None):
        x0 = bf16((B, *in_shape))
        variables = module.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, *in_shape), jnp.bfloat16))
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if jnp.issubdtype(v.dtype, jnp.floating) else v, variables)
        ap_fn = apply or (lambda v, x: module.apply(v, x))

        def step(acc, x):
            out = ap_fn(variables, x)
            return acc + out.astype(jnp.float32).sum() * 1e-30

        f = jax.jit(step, donate_argnums=(0,))
        report(name, timeit(f, jnp.zeros(()), x0, measure=args.measure))

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        kernel_init=he_fan_out_normal)(x)
            y = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5)(y)
            return nn.max_pool(nn.relu(y), (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

    class Stage(nn.Module):
        n_blocks: int
        width: int
        stride: int = 1
        dilation: int = 1

        @nn.compact
        def __call__(self, x):
            for b in range(self.n_blocks):
                x = Bottleneck(self.width,
                               strides=self.stride if b == 0 else 1,
                               dilation=self.dilation,
                               downsample=(b == 0))(x, False)
            return x

    class Decoder(nn.Module):
        """ASPP output -> seg logits (sep conv, fusion, classifier, x4 up)."""
        num_classes: int = 19

        @nn.compact
        def __call__(self, xs):
            y, low = xs
            y = SeparableConvBNReLU(256)(y, False)
            y = upsample_like(y, (low.shape[1], low.shape[2]))
            low_proj = ConvBNReLU(48, kernel_size=1)(low, False)
            y = jnp.concatenate([y, low_proj], axis=-1)
            y = SeparableConvBNReLU(256)(y, False)
            seg = nn.Conv(self.num_classes, (1, 1),
                          kernel_init=he_fan_out_normal)(y)
            return upsample_like(seg, (low.shape[1] * 4, low.shape[2] * 4))

    h4, w4 = H // 4, W // 4
    h16, w16 = H // 16, W // 16
    shapes = {
        'stem': (Stem(), (H, W, 3)),
        'l1': (Stage(3, 64), (h4, w4, 64)),
        'l2': (Stage(4, 128, stride=2), (h4, w4, 256)),
        'l3': (Stage(6, 256, stride=2), (H // 8, W // 8, 512)),
        'l4': (Stage(3, 512, dilation=2), (h16, w16, 1024)),
        'aspp': (ASPP(256), (h16, w16, 2048)),
        'depth': (DepthEstimationHead(hidden_channels=256), (h16, w16, 2048)),
    }

    for name in parts:
        if name in shapes:
            module, in_shape = shapes[name]
            if name in ('aspp', 'depth'):
                run(name, module, in_shape,
                    apply=lambda v, x, m=module: m.apply(v, x, False))
            else:
                run(name, module, in_shape)
        elif name == 'decoder':
            dec = Decoder()
            xs0 = [(a, b) for a, b in zip(
                bf16((B, h16, w16, 256)), bf16((B, h4, w4, 256)))]
            variables = dec.init(jax.random.PRNGKey(0),
                                 (jnp.zeros((1, h16, w16, 256), jnp.bfloat16),
                                  jnp.zeros((1, h4, w4, 256), jnp.bfloat16)))
            variables = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16)
                if jnp.issubdtype(v.dtype, jnp.floating) else v, variables)

            def dstep(acc, xs):
                out = dec.apply(variables, xs)
                return acc + out.astype(jnp.float32).sum() * 1e-30

            f = jax.jit(dstep, donate_argnums=(0,))
            report('decoder', timeit(f, jnp.zeros(()), xs0,
                                     measure=args.measure))
        elif name == 'full':
            model = DeepLabV3PlusModel(num_classes=19, include_depth=True)
            variables = init_model(model, jax.random.PRNGKey(0),
                                   (1, H, W, 3))
            variables = jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16)
                if jnp.issubdtype(v.dtype, jnp.floating) else v, variables)
            x0 = bf16((B, H, W, 3))

            def fstep(acc, x):
                out = model.apply(variables, x, train=False)
                return acc + sum(v.astype(jnp.float32).sum()
                                 for v in out.values()) * 1e-30

            f = jax.jit(fstep, donate_argnums=(0,))
            report('full', timeit(f, jnp.zeros(()), x0,
                                  measure=args.measure))
        else:
            print(f"  (unknown part {name!r} skipped)")


if __name__ == '__main__':
    main()
