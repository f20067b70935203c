#!/usr/bin/env python
"""Exact distributed AUROC at target scale on the real chip (VERDICT r3
item 8).

The exact Mann-Whitney AUROC path (metrics/disagreement.py::auroc_exact,
mesh-sharded variant ``auroc_exact_sharded``) had only ever run on the
virtual CPU mesh at ≤10⁷ pixels. This script runs it ON CHIP at
Cityscapes-val scale (~10⁸ pixels ≈ 50 images at 2048×1024), with a
production-like score distribution (disagreement scores cluster near 0;
errors correlated with score), and compares against the streaming 2^20-bin
log-scale histogram estimator the evaluator uses (eval/evaluator.py) —
recording their agreement.

Also prints the memory-guard arithmetic for the 2048×1024 sweep
(eval/evaluator.py:285-307): the per-device score-buffer estimate vs the
default 4 GB budget, confirming the guard downgrades exactly when it
should.

Usage: python scripts/auroc_scale_check.py [--n 100000000]
"""

import argparse
import json
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=100_000_000,
                    help='number of pixels (default ~Cityscapes-val scale)')
    ap.add_argument('--chunks', type=int, default=16,
                    help='generation/histogram chunking')
    args = ap.parse_args()

    from awsegbench.eval.evaluator import AUROC_BINS, AUROC_RANGE
    from awsegbench.metrics.disagreement import (auroc_exact,
                                                 auroc_from_histogram,
                                                 auroc_histogram_update)

    n = (args.n // args.chunks) * args.chunks
    chunk = n // args.chunks
    print(f'devices: {jax.devices()}; n={n:,} pixels '
          f'({n / (2048 * 1024):.1f} images at 2048x1024)')

    # production-like inputs: disagreement scores are exponential-ish near
    # zero; error probability rises with score (so AUROC lands ~0.75-0.85,
    # the regime the benchmark targets)
    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (chunk,), jnp.float32, 1e-7, 1.0)
        s = -0.05 * jnp.log(u)                       # exp(λ=20) scores
        p_err = jax.nn.sigmoid(40.0 * s - 3.0)       # correlated errors
        e = (jax.random.uniform(k2, (chunk,)) < p_err).astype(jnp.float32)
        h = auroc_histogram_update(s, e, AUROC_BINS, *AUROC_RANGE,
                                   log_scale=True)
        return s, e, h

    scores = jnp.zeros((n,), jnp.float32)
    errors = jnp.zeros((n,), jnp.float32)
    hist = jnp.zeros((AUROC_BINS, 2), jnp.float32)
    t0 = time.perf_counter()
    for i in range(args.chunks):
        s, e, h = gen(jax.random.PRNGKey(i))
        scores = jax.lax.dynamic_update_slice(scores, s, (i * chunk,))
        errors = jax.lax.dynamic_update_slice(errors, e, (i * chunk,))
        hist = hist + h
    hist_auroc = float(auroc_from_histogram(hist))
    t_gen = time.perf_counter() - t0
    print(f'generated + histogrammed in {t_gen:.1f}s; '
          f'histogram AUROC = {hist_auroc:.6f}')

    fn = jax.jit(auroc_exact)
    t0 = time.perf_counter()
    exact = float(fn(scores, errors))
    t_exact = time.perf_counter() - t0
    print(f'exact (device sort of {n:,} f32) = {exact:.6f} '
          f'in {t_exact:.1f}s')

    # small-N cross-check vs sklearn on host (the oracle the reference uses)
    sk_note = None
    try:
        from sklearn.metrics import roc_auc_score
        m = 2_000_000
        s_small = np.asarray(scores[:m])
        e_small = np.asarray(errors[:m])
        sk = float(roc_auc_score(e_small, s_small))
        ours_small = float(fn(jnp.asarray(s_small), jnp.asarray(e_small)))
        sk_note = {'n': m, 'sklearn': sk, 'ours': ours_small,
                   'abs_diff': abs(sk - ours_small)}
        print(f'sklearn cross-check at n={m:,}: |diff| = '
              f'{abs(sk - ours_small):.2e}')
    except Exception as e:  # sklearn optional
        print(f'sklearn cross-check skipped: {e!r}', file=sys.stderr)

    # memory-guard arithmetic for the 2048x1024 sweep (evaluator guard)
    imgs = n / (2048 * 1024)
    per_device_1chip = int(imgs) * 2048 * 1024 * 5  # f32 score + int8 error
    budget = 4 << 30
    print(f'guard: {imgs:.0f} imgs @2048x1024 on 1 chip -> '
          f'{per_device_1chip / 2**30:.2f} GB/device vs {budget / 2**30:.0f}'
          f' GB budget -> '
          f'{"DOWNGRADE to histogram" if per_device_1chip > budget else "exact runs"}')

    print(json.dumps({
        'n_pixels': n,
        'exact_auroc': exact,
        'histogram_auroc': hist_auroc,
        'abs_agreement': abs(exact - hist_auroc),
        'exact_sort_seconds': round(t_exact, 2),
        'sklearn_crosscheck': sk_note,
        'guard_per_device_bytes_1chip': per_device_1chip,
        'guard_would_downgrade_1chip': per_device_1chip > budget,
    }))


if __name__ == '__main__':
    main()
