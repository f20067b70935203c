#!/usr/bin/env python
"""Benchmark: 4-weather corrupted ensemble eval throughput (images/sec/chip).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The workload is the reference's headline path (BASELINE.md): the full
ensemble (SegFormer-B0 + DeepLabV3+/ResNet-50) evaluated over a mixed
4-weather corrupted stream at the default 512×1024 resolution, with
weather corruption + depth estimation + normalization + both forwards +
on-device metric accumulation fused into one jitted program per batch —
i.e. everything the reference does per eval batch
(loader.py:256-293 + scripts/evaluate.py:134-205).

HEADLINE = ``head_mode='faithful'`` — the reference-parity architecture
(features bilinearly upsampled to full input resolution BEFORE the conv
heads, model.py:209-221) and the ``configs/default.yaml`` default. The
faster ``head_mode='fused'`` variant (heads at stage-4 resolution, then
logit upsample — a different function, disclosed in ARCHITECTURE.md) is
also measured and reported in the same JSON line as ``fused_value``.

``vs_baseline`` divides by the reference's measured END-TO-END eval
throughput on this host (bench_baseline.py: the reference's own
preprocessing.py pipeline verbatim + an architecture-equivalent torch
ensemble forward, assuming perfect DataLoader/compute overlap — the most
favorable assumption for the reference). The older pipeline-only proxy is
kept as ``vs_pipeline_only``. Both cached in .bench_baseline.json.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BASELINE_CACHE = REPO / '.bench_baseline.json'
IMAGE_HW = (512, 1024)
# Since round 2 the faithful heads fuse their ×32 upsample (ops/upconv.py,
# ops/headkernels.py) so full-res 256-channel activations no longer
# materialize — B=32 fits and is ~1.3× faster per image than B=8.
BATCH = {'faithful': 32, 'fused': 64}
WARMUP_BATCHES = 2
MEASURE_BATCHES = {'faithful': 8, 'fused': 12}


def reference_baseline() -> dict:
    if BASELINE_CACHE.exists():
        try:
            d = json.loads(BASELINE_CACHE.read_text())
            if 'ref_e2e_images_per_sec' in d:
                return d
        except Exception:
            pass
    from bench_baseline import measure_reference_e2e
    d = measure_reference_e2e()
    BASELINE_CACHE.write_text(json.dumps(d, indent=2))
    return d


def measure_tpu_eval(head_mode: str) -> float:
    import jax
    # persistent compile cache: tunnel-backend compiles take minutes; cache
    # them across processes so repeat bench runs start hot
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_compile_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    import jax.numpy as jnp
    import numpy as np

    from awsegbench.core.prng import per_sample_keys
    from awsegbench.data.pipeline import prepare_batch
    from awsegbench.metrics.iou import confusion_matrix
    from awsegbench.models import EnsembleModel, init_model

    batch = BATCH[head_mode]
    n_measure = MEASURE_BATCHES[head_mode]

    model = EnsembleModel(num_classes=19, include_depth=True,
                          head_mode=head_mode)
    h, w = IMAGE_HW
    variables = init_model(model, jax.random.PRNGKey(0), (1, h, w, 3))

    # bf16 compute
    def cast(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating)
            else x, t)
    variables_bf16 = {'params': cast(variables['params']),
                      'batch_stats': cast(variables.get('batch_stats', {}))}

    def eval_step(variables, images_u8, labels, weather_ids, keys, cm):
        # Full reference eval workload: corrupt + depth-estimate + normalize
        # + both member forwards + argmax + confusion accumulate. Note: the
        # model's depth-head outputs are unused by the segmentation metrics,
        # so XLA dead-code-eliminates them inside the jitted step — the
        # torch reference computes them eagerly and pays for them. This is
        # a legitimate whole-program-compilation benefit, disclosed here.
        prep = prepare_batch(images_u8, labels, weather_ids, keys,
                             train=False, include_depth=True)
        x = prep['image'].astype(jnp.bfloat16)
        out = model.apply(variables, x, train=False)
        preds = jnp.argmax(out['segmentation'].astype(jnp.float32), axis=-1)
        return cm + confusion_matrix(preds, labels, 19)

    step = jax.jit(eval_step, donate_argnums=(5,))

    # Timing methodology: inputs are placed on device up front (a production
    # input pipeline overlaps host transfers with compute; on this dev setup
    # the host link is a network tunnel whose transfer cost is an artifact),
    # the measured steps are chained through the donated confusion-matrix
    # carry, and the FINAL ACCUMULATOR VALUE is fetched to host — fetching a
    # value is the only reliable completion barrier on remote-tunnel
    # backends where block_until_ready can return at enqueue time.
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    n = 2  # distinct batches, cycled — bounds tunnel transfer volume
    batches = []
    for i in range(n):
        batches.append({
            'image': jax.device_put(
                rng.integers(0, 255, (batch, h, w, 3), dtype=np.uint8)),
            'label': jax.device_put(
                rng.integers(0, 19, (batch, h, w)).astype(np.int32)),
            'weather_id': jax.device_put(
                rng.integers(0, 5, (batch,)).astype(np.int32)),
            'keys': jax.device_put(per_sample_keys(
                jax.random.fold_in(key, i),
                jnp.arange(batch, dtype=jnp.int32))),
        })
    cm = jnp.zeros((19, 19), jnp.float32)

    for i in range(WARMUP_BATCHES):
        b = batches[i % n]
        cm = step(variables_bf16, b['image'], b['label'], b['weather_id'],
                  b['keys'], cm)
    np.asarray(cm)  # hard completion barrier

    t0 = time.perf_counter()
    for i in range(n_measure):
        b = batches[i % n]
        cm = step(variables_bf16, b['image'], b['label'], b['weather_id'],
                  b['keys'], cm)
    np.asarray(cm)  # hard completion barrier
    elapsed = time.perf_counter() - t0
    return n_measure * batch / elapsed


_TRANSIENT_MARKERS = ('DEADLINE_EXCEEDED', 'UNAVAILABLE', 'INTERNAL',
                      '500', 'Connection', 'Socket', 'RESOURCE_EXHAUSTED: '
                      'Attempting to reserve')


def _measure_with_retry(head_mode: str, attempts: int = 2) -> float:
    # the tunneled dev backend's remote-compile helper occasionally 500s;
    # one retry (transient errors only) protects the benchmark artifact.
    # Deterministic failures (shape errors, true OOM) surface immediately.
    for i in range(attempts):
        try:
            return measure_tpu_eval(head_mode)
        except Exception as e:
            transient = any(m in str(e) for m in _TRANSIENT_MARKERS)
            if i == attempts - 1 or not transient:
                raise
            print(f"bench: transient failure, retrying in 20s: {e!r}",
                  file=sys.stderr)
            time.sleep(20)


def main() -> None:
    base = reference_baseline()
    ref_e2e = base['ref_e2e_images_per_sec']
    ref_pipe = base.get('ref_pipeline_images_per_sec',
                        base.get('ref_images_per_sec', ref_e2e))
    faithful = _measure_with_retry('faithful')
    fused = _measure_with_retry('fused')
    print(json.dumps({
        'metric': 'ensemble_4weather_eval_throughput',
        'value': round(faithful, 3),
        'unit': 'images/sec/chip @512x1024 B32 (head_mode=faithful, '
                'reference-parity arch)',
        'vs_baseline': round(faithful / ref_e2e, 2),
        'fused_value': round(fused, 3),
        'fused_vs_baseline': round(fused / ref_e2e, 2),
        'vs_pipeline_only': round(faithful / ref_pipe, 2),
        'ref_e2e_images_per_sec': round(ref_e2e, 4),
        'baseline_note': 'ref e2e = reference preprocessing verbatim + '
                         'architecture-equivalent torch ensemble on this '
                         'host CPU, perfect-overlap assumption '
                         '(bench_baseline.py)',
    }))


if __name__ == '__main__':
    main()
