#!/usr/bin/env python
"""Profile the one-jit eval step on the real chip: component breakdown.

Companion to profile_train.py for the faithful eval path (the bench
headline). Measures (B8 @512x1024 by default, bf16 compute, chained
donated accumulators, final-fetch barrier — the bench.py methodology):

  * full   — prepare(+depth est) + ensemble fwd (seg AND depth heads
             consumed) + CM/ECE/AUROC metric updates — matches the
             bench.py headline workload (depth folded into the carry so
             XLA cannot DCE it; the torch reference computes it eagerly)
  * prep   — prepare_batch alone (eval mode: corrupt + depth est +
             normalize, include_depth=True as in bench)
  * seg / dl / ens — member / ensemble forwards alone (train=False),
             all outputs consumed
  * ens_seg — ensemble forward consuming ONLY the segmentation outputs
             (depth heads DCE'd): `ens − ens_seg` is the marginal cost
             of both members' depth heads
  * metrics — the metric tail alone, on fixed precomputed outputs
             (softmax mixing + argmax + one-hot CM + ECE bins + AUROC hist)

The residual `full − prep − ens` vs the measured `metrics` row separates
"metric math" from fusion/layout overhead between the stages.

Each part compiles its own program (~1-3 min each on the tunneled AOT
helper, cached across runs in /root/.jax_compile_cache) — in a budgeted
chip window, invoke per-part (`--parts full`, then `--parts prep`, ...)
so every subprocess fits its timeout and partial results survive.

Usage: python scripts/profile_eval.py \
           [--parts full,prep,seg,dl,ens,ens_seg,metrics]
           [--head-mode faithful|fused]
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
import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
B = 8


def make_batch(rng, key):
    from awsegbench.core.prng import per_sample_keys
    return {
        'image': jax.device_put(
            rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8)),
        'label': jax.device_put(
            rng.integers(0, 19, (B, H, W)).astype(np.int32)),
        'weather_id': jax.device_put(
            rng.integers(0, 5, (B,)).astype(np.int32)),
        'keys': jax.device_put(per_sample_keys(
            key, jnp.arange(B, dtype=jnp.int32))),
    }


def timeit(fn, carry, batches, warmup=2, measure=8):
    for i in range(warmup):
        carry = fn(carry, batches[i % len(batches)])
    np.asarray(jax.tree_util.tree_leaves(carry)[0])
    t0 = time.perf_counter()
    for i in range(measure):
        carry = fn(carry, batches[i % len(batches)])
    np.asarray(jax.tree_util.tree_leaves(carry)[0])
    return (time.perf_counter() - t0) / measure


def report(name, dt):
    print(f"  {name:14s} {dt*1e3:8.1f} ms/B{B}  {B/dt:7.1f} img/s",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--parts', default='full,prep,seg,dl,ens,ens_seg,metrics')
    ap.add_argument('--head-mode', default='faithful',
                    choices=['faithful', 'fused'])
    ap.add_argument('--measure', type=int, default=8)
    ap.add_argument('--hw', default=None,
                    help='override HxW, e.g. 64x128 for a CPU smoke run')
    args = ap.parse_args()
    parts = set(args.parts.split(','))
    if args.hw:
        global H, W
        H, W = (int(v) for v in args.hw.split('x'))

    from awsegbench.data.pipeline import prepare_batch
    from awsegbench.eval.evaluator import AUROC_BINS, AUROC_RANGE
    from awsegbench.metrics.calibration import ece_bin_update_per_weather
    from awsegbench.metrics.disagreement import (auroc_histogram_update,
                                                 disagreement_map)
    from awsegbench.metrics.iou import confusion_matrix_per_weather
    from awsegbench.models import (DeepLabV3PlusModel, EnsembleModel,
                                   SegFormerModel, init_model)
    from awsegbench.weather.corruption import WEATHER_CONDITIONS

    NW, C = len(WEATHER_CONDITIONS), 19

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    batches = [make_batch(rng, jax.random.fold_in(key, i)) for i in range(2)]

    models = {}

    def get_model(name):
        if name not in models:
            if name == 'ensemble':
                m = EnsembleModel(num_classes=C, include_depth=True,
                                  head_mode=args.head_mode)
            elif name == 'segformer':
                m = SegFormerModel(num_classes=C, include_depth=True,
                                   head_mode=args.head_mode)
            else:
                m = DeepLabV3PlusModel(num_classes=C, include_depth=True)
            variables = init_model(m, jax.random.PRNGKey(0), (1, H, W, 3))
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)
            models[name] = (m, variables)
        return models[name]

    def metric_tail(outputs, lbl, weather_ids, acc):
        logits = outputs['segmentation'].astype(jnp.float32)
        preds = jnp.argmax(logits, axis=-1)
        mask = jnp.ones((lbl.shape[0],), bool)
        cm_w = confusion_matrix_per_weather(preds, lbl, C, weather_ids, NW,
                                            sample_mask=mask)
        ece_w = ece_bin_update_per_weather(logits, lbl, weather_ids, NW, 15,
                                           sample_mask=mask, class_axis=-1)
        acc = dict(acc)
        acc['cm'] = acc['cm'] + jnp.concatenate(
            [cm_w.sum(axis=0, keepdims=True), cm_w])
        acc['ece'] = acc['ece'] + jnp.concatenate(
            [ece_w.sum(axis=0, keepdims=True), ece_w])
        m1 = outputs['segformer_seg'].astype(jnp.float32)
        m2 = outputs['deeplabv3plus_seg'].astype(jnp.float32)
        dis = disagreement_map([m1, m2], class_axis=-1)
        mean_probs = (jax.nn.softmax(m1, axis=-1)
                      + jax.nn.softmax(m2, axis=-1)) / 2.0
        ens_pred = jnp.argmax(mean_probs, axis=-1)
        errors = (ens_pred != lbl).astype(jnp.float32)
        valid = (lbl != 255) & mask[:, None, None]
        acc['auroc_hist'] = acc['auroc_hist'] + auroc_histogram_update(
            dis.reshape(-1), errors.reshape(-1), AUROC_BINS,
            *AUROC_RANGE, weights=valid.reshape(-1), log_scale=True)
        return acc

    def init_acc():
        return {'cm': jnp.zeros((1 + NW, C, C), jnp.float32),
                'ece': jnp.zeros((1 + NW, 15, 3), jnp.float32),
                'auroc_hist': jnp.zeros((AUROC_BINS, 2), jnp.float32)}

    if 'full' in parts:
        model, variables = get_model('ensemble')

        def full_step(acc, b):
            prep = prepare_batch(b['image'], b['label'], b['weather_id'],
                                 b['keys'], train=False, include_depth=True)
            out = model.apply(variables,
                              prep['image'].astype(jnp.bfloat16),
                              train=False)
            acc = metric_tail(out, prep['label'], b['weather_id'], acc)
            # consume the depth heads exactly as bench.py's eval step does
            acc = dict(acc)
            acc['auroc_hist'] = acc['auroc_hist'] + (
                out['depth'].astype(jnp.float32).sum() * 1e-30)
            return acc

        f = jax.jit(full_step, donate_argnums=(0,))
        report('full', timeit(f, init_acc(), batches,
                              measure=args.measure))

    if 'prep' in parts:
        def prep_step(acc, b):
            p = prepare_batch(b['image'], b['label'], b['weather_id'],
                              b['keys'], train=False, include_depth=True)
            s = p['image'].astype(jnp.float32).sum()
            if p.get('depth') is not None:
                s = s + p['depth'].astype(jnp.float32).sum()
            return acc + s * 1e-30

        f = jax.jit(prep_step, donate_argnums=(0,))
        report('prepare', timeit(f, jnp.zeros(()), batches,
                                 measure=args.measure))

    def run_fwd(name, model_name, seg_only=False):
        model, variables = get_model(model_name)

        def step(acc, b):
            prep = prepare_batch(b['image'], b['label'], b['weather_id'],
                                 b['keys'], train=False, include_depth=False)
            out = model.apply(variables,
                              prep['image'].astype(jnp.bfloat16),
                              train=False)
            items = [(k, v) for k, v in out.items()
                     if not seg_only or 'depth' not in k]
            s = sum(v.astype(jnp.float32).sum() for _, v in items
                    if v is not None)
            return acc + s * 1e-30

        f = jax.jit(step, donate_argnums=(0,))
        report(name, timeit(f, jnp.zeros(()), batches,
                            measure=args.measure))

    if 'seg' in parts:
        run_fwd('segformer+prep', 'segformer')
    if 'dl' in parts:
        run_fwd('deeplab+prep', 'deeplab')
    if 'ens' in parts:
        run_fwd('ensemble+prep', 'ensemble')
    if 'ens_seg' in parts:
        run_fwd('ens_seg+prep', 'ensemble', seg_only=True)

    if 'metrics' in parts:
        r2 = np.random.default_rng(1)
        fixed = {
            'segmentation': jax.device_put(
                r2.normal(size=(B, H, W, C)).astype(np.float32)),
            'segformer_seg': jax.device_put(
                r2.normal(size=(B, H, W, C)).astype(np.float32)),
            'deeplabv3plus_seg': jax.device_put(
                r2.normal(size=(B, H, W, C)).astype(np.float32)),
        }

        def mstep(acc, b):
            return metric_tail(fixed, b['label'], b['weather_id'], acc)

        f = jax.jit(mstep, donate_argnums=(0,))
        report('metrics', timeit(f, init_acc(), batches,
                                 measure=args.measure))


if __name__ == '__main__':
    main()
