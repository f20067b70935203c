#!/usr/bin/env python
"""Dependency-light behavioral validation (tier 2).

Mirrors the reference's ``test_training_functionality.py`` (SURVEY.md §4
tier 2), which injects a MockTorch into sys.modules to exercise
config/device/logging codepaths without the heavy runtime. Here the heavy
runtime is JAX: the config system, env overrides, validation, logging, and
the scheduler math are exercised with NO jax import; the top-level facade's
graceful fallback is verified by simulating a broken jax.

Run directly: ``python test_training_functionality.py``.
"""

import importlib
import logging
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def test_config_without_jax() -> list:
    errors = []
    # load the config module standalone (not via the package facade, which
    # deliberately probes jax) and verify it needs no heavy runtime
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'awseg_config_standalone', REPO / 'awsegbench/utils/config.py')
    mod = importlib.util.module_from_spec(spec)
    had_jax = 'jax' in sys.modules
    spec.loader.exec_module(mod)
    if not had_jax and 'jax' in sys.modules:
        errors.append("utils/config.py imported jax")
    Config = mod.Config
    create_default_config = mod.create_default_config
    load_config = mod.load_config
    save_config = mod.save_config
    setup_logging = mod.setup_logging
    validate_config = mod.validate_config

    cfg = create_default_config()
    try:
        validate_config(cfg)
    except Exception as e:
        errors.append(f"default config fails validation: {e}")

    c = Config({'a': {'b': 1}})
    if c.get('a.b') != 1 or c.get('a.c', 9) != 9:
        errors.append("dot-notation get broken")

    with tempfile.TemporaryDirectory() as d:
        p = Path(d) / 'c.yaml'
        save_config(cfg, p)
        os.environ['CONFIG_TRAINING__BATCH_SIZE'] = '64'
        try:
            loaded = load_config(p)
            if loaded.get('training.batch_size') != 64:
                errors.append("env override not applied")
        finally:
            del os.environ['CONFIG_TRAINING__BATCH_SIZE']

    setup_logging(cfg)
    if logging.getLogger().level != logging.INFO:
        errors.append("setup_logging did not set INFO level")
    return errors


def test_scheduler_math_without_jax() -> list:
    errors = []
    from awsegbench.train.optim import (CosineAnnealingLR, ReduceLROnPlateau,
                                        StepLR)
    import math
    sch = CosineAnnealingLR(0.1, t_max=4, eta_min=0.0)
    lr1 = sch.step()
    if abs(lr1 - 0.1 * (1 + math.cos(math.pi / 4)) / 2) > 1e-12:
        errors.append("cosine schedule math wrong")
    sch = StepLR(1.0, step_size=1, gamma=0.5)
    if abs(sch.step() - 0.5) > 1e-12:
        errors.append("step schedule math wrong")
    sch = ReduceLROnPlateau(1.0, patience=0, factor=0.1)
    sch.step(1.0)
    if abs(sch.step(2.0) - 0.1) > 1e-12:
        errors.append("plateau schedule math wrong")
    return errors


def test_facade_fallback_with_broken_jax() -> list:
    """Top-level package degrades gracefully when jax import fails
    (mirrors the reference's torch-optional facade, __init__.py:11-46)."""
    errors = []
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == 'jax' or k.startswith(('jax.', 'awsegbench'))}

    class _BrokenJaxFinder:
        def find_spec(self, name, path=None, target=None):
            if name == 'jax' or name.startswith('jax.'):
                raise ImportError("jax disabled for fallback test")
            return None

    finder = _BrokenJaxFinder()
    sys.meta_path.insert(0, finder)
    try:
        import awsegbench
        if awsegbench._JAX_AVAILABLE:
            errors.append("facade claims jax available with broken jax")
        # dummy classes must exist
        for name in ('SegFormerModel', 'EnsembleModel',
                     'AdverseWeatherTrainer', 'RobustnessMetrics'):
            if not hasattr(awsegbench, name):
                errors.append(f"facade missing dummy {name}")
        if not isinstance(awsegbench.Config({'x': 1}).get('x'), int):
            errors.append("Config unusable in fallback mode")
    finally:
        sys.meta_path.remove(finder)
        for k in list(sys.modules):
            if k.startswith('awsegbench'):
                del sys.modules[k]
        sys.modules.update(saved)
    return errors


def main() -> int:
    all_errors = []
    for fn in (test_config_without_jax, test_scheduler_math_without_jax,
               test_facade_fallback_with_broken_jax):
        errs = fn()
        print(f"{fn.__name__}: {'OK' if not errs else f'FAIL ({len(errs)})'}")
        all_errors.extend(errs)
    for e in all_errors:
        print(f"  - {e}")
    print(f"\n{'PASSED' if not all_errors else 'FAILED'}")
    return 1 if all_errors else 0


if __name__ == '__main__':
    sys.exit(main())
