#!/usr/bin/env python
"""Dependency-free behavioral validation via AST inspection (tier 2).

Mirrors the reference's ``test_training_simulation.py`` (SURVEY.md §4):
AST-parses the CLI scripts for ``main``/argparse structure and the trainer
for its required public methods, without importing anything heavy.
"""

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent


def _parse(path: str) -> ast.Module:
    return ast.parse((REPO / path).read_text())


def _functions(tree: ast.Module) -> set:
    return {n.name for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)}


def _classes(tree: ast.Module) -> dict:
    return {n.name: {m.name for m in n.body
                     if isinstance(m, ast.FunctionDef)}
            for n in ast.walk(tree) if isinstance(n, ast.ClassDef)}


def test_train_cli() -> list:
    errors = []
    tree = _parse('awsegbench/cli/train.py')
    fns = _functions(tree)
    for required in ('main', 'set_seed', 'create_datasets_and_loaders'):
        if required not in fns:
            errors.append(f"cli/train.py missing function: {required}")
    src = (REPO / 'awsegbench/cli/train.py').read_text()
    for flag in ('--config', '--resume', '--device', '--seed',
                 '--output-dir'):
        if flag not in src:
            errors.append(f"cli/train.py missing CLI flag: {flag}")
    return errors


def test_evaluate_cli() -> list:
    errors = []
    tree = _parse('awsegbench/cli/evaluate.py')
    fns = _functions(tree)
    for required in ('main', 'load_model', 'create_test_dataset_and_loader'):
        if required not in fns:
            errors.append(f"cli/evaluate.py missing function: {required}")
    src = (REPO / 'awsegbench/cli/evaluate.py').read_text()
    for flag in ("'checkpoint'", '--config', '--output-dir', '--device'):
        if flag not in src:
            errors.append(f"cli/evaluate.py missing CLI arg: {flag}")
    return errors


def test_trainer_methods() -> list:
    errors = []
    classes = _classes(_parse('awsegbench/train/trainer.py'))
    trainer = classes.get('AdverseWeatherTrainer', set())
    for method in ('train', 'train_epoch', 'validate_epoch',
                   'save_checkpoint', 'load_checkpoint', 'resume_training'):
        if method not in trainer:
            errors.append(f"AdverseWeatherTrainer missing method: {method}")
    es = classes.get('EarlyStopping', set())
    if '__call__' not in es:
        errors.append("EarlyStopping missing __call__")
    return errors


def test_metrics_surface() -> list:
    errors = []
    classes = _classes(_parse('awsegbench/metrics/robustness.py'))
    rm = classes.get('RobustnessMetrics', set())
    for method in ('compute_miou', 'compute_weather_specific_metrics',
                   'compute_robustness_degradation_ratio',
                   'compute_comprehensive_metrics',
                   'create_robustness_summary'):
        if method not in rm:
            errors.append(f"RobustnessMetrics missing method: {method}")
    return errors


def test_model_surface() -> list:
    errors = []
    for path, cls, methods in [
        ('awsegbench/models/ensemble.py', 'EnsembleModel',
         {'__call__', 'get_ensemble_disagreement'}),
        ('awsegbench/models/segformer.py', 'SegFormerModel', {'__call__'}),
        ('awsegbench/models/deeplab.py', 'DeepLabV3PlusModel', {'__call__'}),
    ]:
        classes = _classes(_parse(path))
        have = classes.get(cls, set())
        for m in methods:
            if m not in have:
                errors.append(f"{cls} missing method: {m}")
    return errors


def main() -> int:
    all_errors = []
    for fn in (test_train_cli, test_evaluate_cli, test_trainer_methods,
               test_metrics_surface, test_model_surface):
        errs = fn()
        print(f"{fn.__name__}: {'OK' if not errs else f'FAIL ({len(errs)})'}")
        all_errors.extend(errs)
    for e in all_errors:
        print(f"  - {e}")
    print(f"\n{'PASSED' if not all_errors else 'FAILED'}")
    return 1 if all_errors else 0


if __name__ == '__main__':
    sys.exit(main())
