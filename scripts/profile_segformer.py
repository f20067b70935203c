#!/usr/bin/env python
"""Profile MiT-B0 encoder sub-components on the real chip (VERDICT item 3c).

profile_train.py showed a ~7 ms encoder floor at 512x1024 attributed to
MixFFN dwconv + LayerNorm overhead at C=32; this script isolates where
that time actually is so the fix lands on the real bottleneck. Parts
(each timed standalone on random bf16 inputs at production shape,
chained-donated-carry methodology as in bench.py):

  embed1..4 — OverlapPatchEmbed convs (7x7/4, then 3x3/2)
  s1..s4    — full stages (embed + blocks + final LN)
  attn1..4  — one (LN + EfficientSelfAttention) sublayer at stage i
  ffn1..4   — one (LN + MixFFN) sublayer at stage i
  enc       — whole MiTEncoder (cross-check)

Stage i has depth 2, so stage_i ~ embed_i + 2*(attn_i + ffn_i) + LN.

Usage: python scripts/profile_segformer.py [--parts ...] [--hw 64x128]
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

HIDDEN = (32, 64, 160, 256)
HEADS = (1, 2, 5, 8)
SR = (8, 4, 2, 1)
PATCH = (7, 3, 3, 3)
STRIDE = (4, 2, 2, 2)


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
    print(f"  {name:8s} {dt*1e3:8.2f} ms/B{B}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    default_parts = (['enc'] + [f'embed{i}' for i in (1, 2, 3, 4)]
                     + [f's{i}' for i in (1, 2, 3, 4)]
                     + [f'attn{i}' for i in (1, 2, 3, 4)]
                     + [f'ffn{i}' for i in (1, 2, 3, 4)])
    ap.add_argument('--parts', default=','.join(default_parts))
    ap.add_argument('--measure', type=int, default=8)
    ap.add_argument('--hw', default=None,
                    help='override HxW (e.g. 64x128 for a CPU smoke run)')
    args = ap.parse_args()
    parts = [p for p in args.parts.split(',') if p]
    if args.hw:
        global H, W
        H, W = (int(v) for v in args.hw.split('x'))

    from awsegbench.models.segformer import (EfficientSelfAttention,
                                             MiTEncoder, MixFFN,
                                             OverlapPatchEmbed,
                                             SegFormerBlock)

    rng = np.random.default_rng(0)

    def bf16(shape):
        return [jax.device_put(
            rng.normal(size=shape).astype(np.float32).astype(jnp.bfloat16))
            for _ in range(2)]

    # stage input geometry: stage i consumes the (i-1)-th feature map
    stage_in = []  # (h_in, w_in, c_in) fed to embed_i
    h, w, c = H, W, 3
    geo = []  # (h, w, c) AFTER embed_i (token grid of stage i)
    for i in range(4):
        stage_in.append((h, w, c))
        h, w, c = h // STRIDE[i], w // STRIDE[i], HIDDEN[i]
        geo.append((h, w, c))

    def cast(variables):
        return jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if jnp.issubdtype(v.dtype, jnp.floating) else v, variables)

    def run(name, module, in_shape, apply, hw=None):
        xs = bf16((B, *in_shape))
        z = jnp.zeros((1, *in_shape), jnp.bfloat16)
        init_args = (z,) if hw is None else (z, hw)
        variables = cast(module.init(jax.random.PRNGKey(0), *init_args))

        def step(acc, x):
            out = apply(variables, x)
            leaves = (out if isinstance(out, (list, tuple)) else [out])
            return acc + sum(v.astype(jnp.float32).sum()
                             for v in leaves) * 1e-30

        f = jax.jit(step, donate_argnums=(0,))
        report(name, timeit(f, jnp.zeros(()), xs, measure=args.measure))

    class AttnSub(nn.Module):
        """One pre-LN attention sublayer (residual add included)."""
        dim: int
        heads: int
        sr: int

        @nn.compact
        def __call__(self, x, hw):
            return x + EfficientSelfAttention(self.dim, self.heads,
                                              self.sr)(
                nn.LayerNorm(epsilon=1e-6)(x), hw)

    class FFNSub(nn.Module):
        dim: int

        @nn.compact
        def __call__(self, x, hw):
            return x + MixFFN(self.dim)(nn.LayerNorm(epsilon=1e-6)(x), hw)

    class Stage(nn.Module):
        i: int

        @nn.compact
        def __call__(self, x):
            i = self.i
            x = OverlapPatchEmbed(HIDDEN[i], PATCH[i], STRIDE[i])(x)
            b, h, w, c = x.shape
            t = x.reshape(b, h * w, c)
            for _ in range(2):
                t = SegFormerBlock(HIDDEN[i], HEADS[i], SR[i])(t, (h, w))
            t = nn.LayerNorm(epsilon=1e-6)(t)
            return t.reshape(b, h, w, c)

    for name in parts:
        if name == 'enc':
            enc = MiTEncoder()
            xs = bf16((B, H, W, 3))
            variables = cast(enc.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, H, W, 3), jnp.bfloat16)))

            def estep(acc, x):
                feats = enc.apply(variables, x)
                return acc + sum(f.astype(jnp.float32).sum()
                                 for f in feats) * 1e-30

            f = jax.jit(estep, donate_argnums=(0,))
            report('enc', timeit(f, jnp.zeros(()), xs,
                                 measure=args.measure))
        elif name.startswith('embed'):
            i = int(name[5:]) - 1
            m = OverlapPatchEmbed(HIDDEN[i], PATCH[i], STRIDE[i])
            run(name, m, stage_in[i], lambda v, x, m=m: m.apply(v, x))
        elif name.startswith('s') and name[1:].isdigit():
            i = int(name[1:]) - 1
            m = Stage(i)
            run(name, m, stage_in[i], lambda v, x, m=m: m.apply(v, x))
        elif name.startswith('attn'):
            i = int(name[4:]) - 1
            gh, gw, gc = geo[i]
            m = AttnSub(HIDDEN[i], HEADS[i], SR[i])
            run(name, m, (gh * gw, gc),
                lambda v, x, m=m, hw=(gh, gw): m.apply(v, x, hw),
                hw=(gh, gw))
        elif name.startswith('ffn'):
            i = int(name[3:]) - 1
            gh, gw, gc = geo[i]
            m = FFNSub(HIDDEN[i])
            run(name, m, (gh * gw, gc),
                lambda v, x, m=m, hw=(gh, gw): m.apply(v, x, hw),
                hw=(gh, gw))
        else:
            print(f"  (unknown part {name!r} skipped)")


if __name__ == '__main__':
    main()
