#!/usr/bin/env python
"""Dependency-free structural validation (tier 2).

Mirrors the reference's repo-root ``test_imports.py`` (SURVEY.md §4 tier 2):
verifies the file inventory, syntax-checks every module with ``compile()``,
and checks packaging metadata — all without importing jax or any heavy
dependency. Run directly: ``python test_imports.py``.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent

EXPECTED_FILES = [
    'awsegbench/__init__.py',
    'awsegbench/utils/config.py',
    'awsegbench/utils/profiling.py',
    'awsegbench/core/mesh.py',
    'awsegbench/core/prng.py',
    'awsegbench/core/precision.py',
    'awsegbench/ops/filters.py',
    'awsegbench/ops/resize.py',
    'awsegbench/weather/corruption.py',
    'awsegbench/weather/depth.py',
    'awsegbench/weather/augmentation.py',
    'awsegbench/models/heads.py',
    'awsegbench/models/segformer.py',
    'awsegbench/models/deeplab.py',
    'awsegbench/models/ensemble.py',
    'awsegbench/models/factory.py',
    'awsegbench/losses/fog_density.py',
    'awsegbench/data/dataset.py',
    'awsegbench/data/pipeline.py',
    'awsegbench/metrics/iou.py',
    'awsegbench/metrics/calibration.py',
    'awsegbench/metrics/disagreement.py',
    'awsegbench/metrics/robustness.py',
    'awsegbench/train/trainer.py',
    'awsegbench/train/optim.py',
    'awsegbench/train/checkpoints.py',
    'awsegbench/eval/evaluator.py',
    'awsegbench/parallel/collectives.py',
    'awsegbench/cli/train.py',
    'awsegbench/cli/evaluate.py',
    'scripts/train.py',
    'scripts/evaluate.py',
    'configs/default.yaml',
    'bench.py',
    '__graft_entry__.py',
    'pyproject.toml',
]


def test_file_inventory() -> list:
    missing = [f for f in EXPECTED_FILES if not (REPO / f).exists()]
    return [f"missing file: {f}" for f in missing]


def test_syntax() -> list:
    errors = []
    for py in sorted(REPO.glob('awsegbench/**/*.py')) + \
            sorted(REPO.glob('scripts/*.py')) + \
            sorted(REPO.glob('tests/*.py')) + \
            [REPO / 'bench.py', REPO / '__graft_entry__.py']:
        try:
            compile(py.read_text(), str(py), 'exec')
        except SyntaxError as e:
            errors.append(f"syntax error in {py}: {e}")
    return errors


def test_packaging() -> list:
    errors = []
    text = (REPO / 'pyproject.toml').read_text()
    for needle in ('name = "awsegbench"', '[project.scripts]',
                   'awsegbench.cli.train:main'):
        if needle not in text:
            errors.append(f"pyproject.toml missing: {needle}")
    # console-script targets must exist (the reference's point at a
    # nonexistent module — latent packaging bug we fix; SURVEY.md item 24)
    for mod in ('awsegbench/cli/train.py', 'awsegbench/cli/evaluate.py'):
        if 'def main(' not in (REPO / mod).read_text():
            errors.append(f"{mod} lacks main()")
    return errors


def test_config_yaml() -> list:
    errors = []
    text = (REPO / 'configs/default.yaml').read_text()
    for key in ('model:', 'data:', 'training:', 'optimizer:', 'scheduler:',
                'loss:', 'early_stopping:', 'mlflow:', 'evaluation:',
                'logging:', 'paths:', 'device:', 'seed:'):
        if key not in text:
            errors.append(f"default.yaml missing section: {key}")
    return errors


def main() -> int:
    all_errors = []
    for fn in (test_file_inventory, test_syntax, test_packaging,
               test_config_yaml):
        errs = fn()
        status = 'OK' if not errs else f'FAIL ({len(errs)})'
        print(f"{fn.__name__}: {status}")
        all_errors.extend(errs)
    for e in all_errors:
        print(f"  - {e}")
    print(f"\n{'PASSED' if not all_errors else 'FAILED'}")
    return 1 if all_errors else 0


if __name__ == '__main__':
    sys.exit(main())
