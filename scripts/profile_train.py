#!/usr/bin/env python
"""Profile the one-jit train step on the real chip: component breakdown.

Measures (B8 @512x1024, bf16 compute / f32 master, chained donated carries,
final-fetch barrier — the bench.py methodology):
  * full train step (prepare + fwd + bwd + clip + adamw)
  * prepare_batch alone (train=True)
  * fwd only (train=True)
  * fwd+bwd (grad, no optimizer)
  * per-member fwd+bwd (segformer / deeplab alone)

Usage: python scripts/profile_train.py [--parts full,prep,fwd,...]
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
import optax

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


def timeit(fn, carry, batches, warmup=2, measure=6):
    for i in range(warmup):
        carry = fn(carry, batches[i % len(batches)])
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, 'dtype') else x,
        jax.tree_util.tree_leaves(carry)[:1])
    t0 = time.perf_counter()
    for i in range(measure):
        carry = fn(carry, batches[i % len(batches)])
    jax.tree_util.tree_map(
        lambda x: np.asarray(x),
        jax.tree_util.tree_leaves(carry)[:1])
    dt = (time.perf_counter() - t0) / measure
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--parts', default='full,prep,fwd,grad,seg_grad,dl_grad')
    ap.add_argument('--model', default='ensemble')
    ap.add_argument('--measure', type=int, default=6)
    ap.add_argument('--variant', default='base',
                    choices=['base', 'nodrop', 'rbg', 'fusedheads'])
    args = ap.parse_args()
    parts = set(args.parts.split(','))

    if args.variant == 'nodrop':
        import flax.linen as fnn
        fnn.Dropout.__call__ = lambda self, x, **kw: x
    if args.variant == 'rbg':
        jax.config.update('jax_default_prng_impl', 'rbg')

    from awsegbench.core.prng import per_sample_keys  # noqa: F401
    from awsegbench.data.pipeline import prepare_batch
    from awsegbench.losses.fog_density import FogDensityAwareLoss
    from awsegbench.models import (DeepLabV3PlusModel, EnsembleModel,
                                   SegFormerModel, init_model)
    from awsegbench.train.trainer import fog_density_from_weather

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    batches = [make_batch(rng, jax.random.fold_in(key, i)) for i in range(2)]

    loss_fn = FogDensityAwareLoss()

    def build(model_name):
        hm = 'fused' if args.variant == 'fusedheads' else 'faithful'
        if model_name == 'ensemble':
            m = EnsembleModel(num_classes=19, include_depth=True,
                              head_mode=hm)
        elif model_name == 'segformer':
            m = SegFormerModel(num_classes=19, include_depth=True,
                               head_mode=hm)
        else:
            m = DeepLabV3PlusModel(num_classes=19, include_depth=True)
        variables = init_model(m, jax.random.PRNGKey(0), (1, H, W, 3))
        return m, variables

    def cast_bf16(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)
            else x, t)

    def forward(model, params, batch_stats, images, dropout_key):
        variables = {'params': cast_bf16(params),
                     'batch_stats': cast_bf16(batch_stats)}
        out, mutated = model.apply(
            variables, images.astype(jnp.bfloat16), train=True,
            rngs={'dropout': dropout_key}, mutable=['batch_stats'])
        new_bs = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), mutated['batch_stats'])
        return out, new_bs

    def loss_of(model, params, batch_stats, prep, fog, dropout_key):
        out, new_bs = forward(model, params, batch_stats, prep['image'],
                              dropout_key)
        out = {k: v.astype(jnp.float32) for k, v in out.items()}
        targets = {'label': prep['label'], 'depth': prep['depth']}
        ld = loss_fn(out, targets, fog)
        return ld['total_loss'], new_bs

    def report(name, dt):
        print(f"  {name:14s} {dt*1e3:8.1f} ms/B{B}  "
              f"{B/dt:7.1f} img/s", flush=True)

    # --- prepare only ---
    if 'prep' in parts:
        def prep_step(carry, b):
            acc, i = carry
            k2 = jax.random.fold_in(jax.random.PRNGKey(1), i)
            p = prepare_batch(b['image'], b['label'], b['weather_id'],
                              b['keys'], aug_key=k2, train=True,
                              include_depth=True)
            s = (p['image'].astype(jnp.float32).sum()
                 + p['depth'].astype(jnp.float32).sum())
            return (acc + s * 1e-30, i + 1)

        f = jax.jit(prep_step, donate_argnums=(0,))
        dt = timeit(f, (jnp.zeros(()), jnp.zeros((), jnp.int32)), batches,
                    measure=args.measure)
        report('prepare', dt)

    models = {}
    def get_model(name):
        # cache the host copy; return fresh device arrays each call (carries
        # get donated)
        if name not in models:
            m, variables = build(name)
            models[name] = (m, jax.tree_util.tree_map(np.asarray, variables))
        m, v = models[name]
        return m, jax.tree_util.tree_map(jnp.asarray, v)

    def run_grad(name, model_name, with_opt):
        model, variables = get_model(model_name)
        params = variables['params']
        bstats = variables.get('batch_stats', {})
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(1e-3))
        opt_state = tx.init(params)

        def step(carry, b):
            params, bstats, opt_state, i = carry
            kk = jax.random.fold_in(jax.random.PRNGKey(2), i)
            k_fog, k_aug, k_drop = jax.random.split(kk, 3)
            prep = prepare_batch(b['image'], b['label'], b['weather_id'],
                                 b['keys'], aug_key=k_aug, train=True,
                                 include_depth=True)
            fog = fog_density_from_weather(b['weather_id'], k_fog, H, W)
            (loss, new_bs), grads = jax.value_and_grad(
                lambda p: loss_of(model, p, bstats, prep, fog, k_drop),
                has_aux=True)(params)
            if with_opt:
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            else:
                params = jax.tree_util.tree_map(
                    lambda p, g: p - 1e-30 * g, params, grads)
            return (params, new_bs, opt_state, i + 1), loss

        f = jax.jit(lambda c, b: step(c, b)[0], donate_argnums=(0,))
        carry = (params, bstats, opt_state, jnp.zeros((), jnp.int32))
        dt = timeit(f, carry, batches, measure=args.measure)
        report(name, dt)

    def run_fwd(name, model_name):
        model, variables = get_model(model_name)
        params = variables['params']
        bstats = variables.get('batch_stats', {})

        def step(carry, b):
            acc, i = carry
            kk = jax.random.fold_in(jax.random.PRNGKey(2), i)
            k_fog, k_aug, k_drop = jax.random.split(kk, 3)
            prep = prepare_batch(b['image'], b['label'], b['weather_id'],
                                 b['keys'], aug_key=k_aug, train=True,
                                 include_depth=True)
            fog = fog_density_from_weather(b['weather_id'], k_fog, H, W)
            loss, _ = loss_of(model, params, bstats, prep, fog, k_drop)
            return (acc + loss, i + 1)

        f = jax.jit(step, donate_argnums=(0,))
        dt = timeit(f, (jnp.zeros(()), jnp.zeros((), jnp.int32)), batches,
                    measure=args.measure)
        report(name, dt)

    if 'fwd' in parts:
        run_fwd('fwd(+prep)', args.model)
    if 'grad' in parts:
        run_grad('fwd+bwd', args.model, with_opt=False)
    if 'full' in parts:
        run_grad('full step', args.model, with_opt=True)
    if 'seg_grad' in parts:
        run_grad('segformer f+b', 'segformer', with_opt=False)
    if 'dl_grad' in parts:
        run_grad('deeplab f+b', 'deeplab', with_opt=False)


if __name__ == '__main__':
    main()
