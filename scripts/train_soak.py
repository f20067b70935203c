#!/usr/bin/env python
"""Real-data training soak, disk-to-metrics (VERDICT r3 item 7).

Trains the full ensemble for several epochs from a generated
Cityscapes-layout PNG tree through the actual train CLI (checkpoints,
early-stop state, TB events), then resumes mid-run from the latest
checkpoint for more epochs, then evaluates the final checkpoint through
the evaluate CLI — the complete disk-to-metrics production flow the
reference drives via scripts/train.py + scripts/evaluate.py.

Records per-epoch train_images_per_sec (from the results JSON history)
for both the PNG-decode first epoch and the raw-cache steady state, so
the disk-fed train rate can be compared against bench.py's tensor-fed
``train_value``.

Usage: python scripts/train_soak.py [--epochs 3] [--resume-epochs 2]
       [--batch 8] [--hw 512 1024] [--n-train 64] [--device auto]
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / '.tpu_window'


def ensure_soak_tree(n_train: int, n_val: int, hw) -> Path:
    """Cityscapes-layout train+val PNG tree (street-scene-like gradients +
    rectangles, realistic PNG entropy — same recipe as bench.py's disk
    tree but with both splits)."""
    import cv2
    import numpy as np
    h, w = hw
    root = REPO / '.soak_data'
    done = root / f'.complete_{n_train}_{n_val}_{h}x{w}'
    if done.exists():
        return root
    rng = np.random.default_rng(11)
    yy = np.linspace(0, 1, h)[:, None]
    xx = np.linspace(0, 1, w)[None, :]
    for split, n in (('train', n_train), ('val', n_val)):
        img_dir = root / f'cityscapes/leftImg8bit/{split}/soakcity'
        lbl_dir = root / f'cityscapes/gtFine/{split}/soakcity'
        img_dir.mkdir(parents=True, exist_ok=True)
        lbl_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            sky = (180 - 120 * yy) * np.ones_like(xx)
            img = np.stack([sky * c for c in (0.9, 0.95, 1.0)], -1)
            box = max(8, min(h, w) // 8)
            for _ in range(30):
                y0, x0 = rng.integers(0, h - box), rng.integers(0, w - box)
                hh, ww = rng.integers(box // 2, box * 4, 2)
                img[y0:y0 + hh, x0:x0 + ww] = rng.integers(30, 220, 3)
            img += rng.normal(0, 6, img.shape)
            img = np.clip(img, 0, 255).astype(np.uint8)
            lbl = (np.clip(yy * 18, 0, 18) * np.ones((h, w))).astype(np.uint8)
            cv2.imwrite(str(img_dir / f's{i:04d}_leftImg8bit.png'),
                        img[..., ::-1])
            cv2.imwrite(str(lbl_dir / f's{i:04d}_gtFine_labelIds.png'), lbl)
    done.touch()
    return root


def run_cli(argv, log_path: Path, timeout: float) -> float:
    t0 = time.perf_counter()
    with open(log_path, 'w') as log:
        proc = subprocess.run([sys.executable, *argv], stdout=log,
                              stderr=subprocess.STDOUT, timeout=timeout,
                              cwd=str(REPO))
    dur = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f'{argv[0]} rc={proc.returncode}; see {log_path}')
    return dur


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--resume-epochs', type=int, default=2)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--hw', type=int, nargs=2, default=[512, 1024])
    ap.add_argument('--n-train', type=int, default=64)
    ap.add_argument('--n-val', type=int, default=16)
    ap.add_argument('--device', default='auto')
    ap.add_argument('--step-timeout', type=float, default=2400.0)
    args = ap.parse_args()

    import yaml

    OUT.mkdir(exist_ok=True)
    run_dir = OUT / 'soak_run'
    tree = ensure_soak_tree(args.n_train, args.n_val, args.hw)
    print(f'data tree: {tree}')

    cfg = yaml.safe_load(open(REPO / 'configs/default.yaml'))
    cfg['epochs'] = args.epochs
    cfg['data'].update({
        'data_root': str(tree),
        'dataset_type': 'cityscapes',
        'image_size': list(args.hw),
        'decoded_cache': str(tree / '.cache'),   # raw-cache steady state
    })
    cfg['training']['batch_size'] = args.batch
    cfg['mlflow'] = {'enabled': False}
    cfg['early_stopping']['patience'] = 100     # the soak must not stop early
    cfg_path = OUT / 'soak_cfg.yaml'
    yaml.safe_dump(cfg, open(cfg_path, 'w'))

    common = ['--config', str(cfg_path), '--device', args.device, '--seed', '0']
    t_train = run_cli(['scripts/train.py', *common,
                       '--output-dir', str(run_dir)],
                      OUT / 'soak_train.log', args.step_timeout)
    results = json.load(open(run_dir / 'results/training_results.json'))
    rates1 = [e['train_images_per_sec'] for e in results['history']['train']]
    print(f'initial run: {args.epochs} epochs in {t_train:.1f}s; '
          f'per-epoch img/s = {[round(r, 2) for r in rates1]}')

    # resume mid-run from latest and continue (exercises optimizer/scheduler/
    # early-stop state restore through the CLI path). Both frameworks rerun
    # range(epochs) with restored weights (reference trainer.py:525-526,
    # 659-662) — so the resumed leg sets epochs to the *additional* count.
    cfg['epochs'] = args.resume_epochs
    yaml.safe_dump(cfg, open(cfg_path, 'w'))
    t_resume = run_cli(['scripts/train.py', *common,
                        '--output-dir', str(run_dir),
                        '--resume', str(run_dir / 'checkpoints/latest')],
                       OUT / 'soak_resume.log', args.step_timeout)
    results2 = json.load(open(run_dir / 'results/training_results.json'))
    rates2 = [e['train_images_per_sec'] for e in results2['history']['train']]
    print(f'resumed run: +{len(rates2)} epochs in {t_resume:.1f}s; '
          f'per-epoch img/s = {[round(r, 2) for r in rates2]}')

    t_eval = run_cli(['scripts/evaluate.py',
                      str(run_dir / 'checkpoints/latest'),
                      '--config', str(cfg_path), '--device', args.device,
                      '--output-dir', str(run_dir / 'eval')],
                     OUT / 'soak_eval.log', args.step_timeout)
    ev = json.load(open(run_dir / 'eval/evaluation_results.json'))

    # steady state = best epoch rate once the raw cache is warm (epoch ≥2)
    steady = max(rates1[1:] + rates2) if len(rates1) > 1 or rates2 else None
    summary = {
        'n_train': args.n_train, 'batch': args.batch, 'hw': args.hw,
        'epochs_initial': args.epochs, 'epochs_resumed': len(rates2),
        'train_seconds': round(t_train, 1),
        'resume_seconds': round(t_resume, 1),
        'eval_seconds': round(t_eval, 1),
        'epoch_img_per_sec_initial': [round(r, 3) for r in rates1],
        'epoch_img_per_sec_resumed': [round(r, 3) for r in rates2],
        'steady_disk_train_img_per_sec': round(steady, 3) if steady else None,
        'final_val_miou': results2['history']['val'][-1]['val_miou'],
        'eval_overall_miou': ev.get('overall_miou'),
        'eval_img_per_sec': ev.get('_throughput_images_per_sec'),
    }
    json.dump(summary, open(OUT / 'soak_summary.json', 'w'), indent=2)
    print(json.dumps(summary))


if __name__ == '__main__':
    main()
