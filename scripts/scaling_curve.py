#!/usr/bin/env python
"""Multi-chip scaling curve on a virtual CPU mesh.

Real multi-chip hardware is unavailable on this host (one TPU chip behind a
tunnel), so this measures the two things a virtual mesh CAN prove about the
data-parallel sharding (SURVEY.md §2.2; no reference counterpart — the
reference is single-device, trainer.py:121):

1. **Per-device compiled FLOPs** of the jitted train/eval steps at a fixed
   global batch, from XLA's own cost model (`compiled.cost_analysis()`).
   If the batch sharding divides work, per-device FLOPs fall ~1/N as the
   mesh grows; if it silently replicated, they would stay flat.
2. **Wall-clock step time** at fixed global batch. All N virtual devices
   share the same host CPU cores, so perfect sharding keeps total work (and
   time) roughly constant as N grows, while replication would scale it ~N×.

Usage: python scripts/scaling_curve.py [--devices 1 2 4 8] [--out SCALING.json]

Each mesh size runs in a subprocess that forces a CPU platform with N
devices before JAX backend init (the recipe from tests/conftest.py /
__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

GLOBAL_BATCH = 8
IMAGE_HW = (64, 128)
MEASURE_STEPS = 3


def child_main(n_devices: int, model_par: int = 1) -> None:
    """Runs inside the forced-CPU subprocess. Prints one JSON line.
    ``model_par > 1`` builds a 2-D (data x model) mesh — the TP path."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(REPO))
    from awsegbench.core.mesh import create_mesh, replicated_sharding
    from awsegbench.models import EnsembleModel
    from awsegbench.train.trainer import AdverseWeatherTrainer

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    if model_par > 1:
        mesh = create_mesh(devices=jax.devices()[:n_devices],
                           mesh_shape={'data': n_devices // model_par,
                                       'model': model_par})
    else:
        mesh = create_mesh(devices=jax.devices()[:n_devices])
    h, w = IMAGE_HW

    class _Loader:
        class dataset:
            image_size = (h, w)

        def __iter__(self):
            rng = np.random.default_rng(0)
            yield {
                'image': rng.integers(0, 255, (GLOBAL_BATCH, h, w, 3),
                                      dtype=np.uint8),
                'label': rng.integers(0, 19, (GLOBAL_BATCH, h, w)).astype(
                    np.int32),
                'weather_id': (np.arange(GLOBAL_BATCH) % 5).astype(np.int32),
                'sample_id': np.arange(GLOBAL_BATCH, dtype=np.int32),
            }

        def __len__(self):
            return 1

    config = {
        'model': {'type': 'ensemble', 'num_classes': 19,
                  'include_depth': True, 'pretrained': False},
        'data': {'apply_augmentation': True},
        'epochs': 1,
        'optimizer': {'type': 'adamw', 'learning_rate': 1e-3,
                      'weight_decay': 0.01},
        'scheduler': {'enabled': False},
        'loss': {'type': 'fog_density_aware'},
        'early_stopping': {'patience': 10},
        'mlflow': {'enabled': False},
        'tpu': {'precision': 'bf16'},
        'seed': 0,
    }
    model = EnsembleModel(num_classes=19, include_depth=True)
    loader = _Loader()
    trainer = AdverseWeatherTrainer(
        model, loader, loader, config, mesh=mesh,
        checkpoint_dir='/tmp/scaling_ckpt', log_dir='/tmp/scaling_logs')

    (args, _bsz), = trainer._device_batches(loader)
    rep = replicated_sharding(mesh)
    step_key = trainer.rngs.fold('weather', 0)

    def flops_of(jitted, *a):
        cost = jitted.lower(*a).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get('flops', float('nan')))

    sums0 = jax.device_put(jnp.zeros((4,), jnp.float32), rep)
    train_flops = flops_of(trainer._train_step, trainer.state, *args,
                           step_key, sums0)
    cm0 = {
        'cm': jax.device_put(
            jnp.zeros((6, 19, 19), jnp.float32), rep),
        'sums': jax.device_put(jnp.zeros((4,), jnp.float32), rep),
    }
    eval_flops = flops_of(trainer._eval_step, trainer.state, *args,
                          step_key, cm0)

    # wall-clock: chain train steps through the donated state carry
    state, sums = trainer.state, sums0
    state, metrics, sums = trainer._train_step(state, *args, step_key, sums)
    np.asarray(sums)  # warmup + barrier
    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, metrics, sums = trainer._train_step(state, *args, step_key,
                                                   sums)
    np.asarray(sums)
    train_ms = (time.perf_counter() - t0) / MEASURE_STEPS * 1000

    acc = cm0
    acc = trainer._eval_step(state, *args, step_key, acc)
    np.asarray(acc['sums'])
    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        acc = trainer._eval_step(state, *args, step_key, acc)
    np.asarray(acc['sums'])
    eval_ms = (time.perf_counter() - t0) / MEASURE_STEPS * 1000

    print('SCALING ' + json.dumps({
        'n_devices': n_devices,
        'mesh': (f'{n_devices // model_par}x{model_par} (data x model)'
                 if model_par > 1 else f'{n_devices} (data)'),
        'global_batch': GLOBAL_BATCH,
        'image_hw': list(IMAGE_HW),
        'train_flops_per_device': train_flops,
        'eval_flops_per_device': eval_flops,
        'train_step_ms': round(train_ms, 2),
        'eval_step_ms': round(eval_ms, 2),
    }))


def run_child(n: int, model_par: int = 1) -> dict:
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + f' --xla_force_host_platform_device_count={n}'
                        ).strip()
    code = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
        f"import jax\n"
        f"jax.config.update('jax_platforms', 'cpu')\n"
        f"jax.config.update('jax_num_cpu_devices', {n})\n"
        f"sys.path.insert(0, {str(REPO / 'scripts')!r})\n"
        f"import scaling_curve\n"
        f"scaling_curve.child_main({n}, {model_par})\n"
    )
    proc = subprocess.run([sys.executable, '-c', code], env=env,
                          capture_output=True, text=True, timeout=3000)
    for line in proc.stdout.splitlines():
        if line.startswith('SCALING '):
            return json.loads(line[len('SCALING '):])
    raise RuntimeError(
        f"n={n} child failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--devices', nargs='+', default=['1', '2', '4', '8'],
                    help="mesh specs: N (data-parallel) or DxM (data x "
                         "model tensor parallelism), e.g. 8 4x2")
    ap.add_argument('--out', default=str(REPO / 'SCALING.json'))
    args = ap.parse_args()

    rows = []
    for spec in args.devices:
        if 'x' in str(spec):
            d, m = (int(v) for v in str(spec).split('x'))
            row = run_child(d * m, m)
        else:
            row = run_child(int(spec))
        rows.append(row)
        print(json.dumps(row))

    base = rows[0]
    summary = {
        'workload': f'ensemble train/eval step, global batch {GLOBAL_BATCH}'
                    f' @ {IMAGE_HW[0]}x{IMAGE_HW[1]}, virtual CPU mesh',
        'rows': rows,
        'train_flops_ratio_vs_1dev': [
            round(r['train_flops_per_device']
                  / base['train_flops_per_device'], 4) for r in rows],
        'eval_flops_ratio_vs_1dev': [
            round(r['eval_flops_per_device']
                  / base['eval_flops_per_device'], 4) for r in rows],
        'note': 'per-device FLOPs ~1/N proves the batch sharding divides '
                'work instead of replicating it; wall-clock stays ~flat '
                'because virtual devices share the same host cores.',
    }
    Path(args.out).write_text(json.dumps(summary, indent=2))
    print(f"wrote {args.out}")


if __name__ == '__main__':
    main()
