"""Evaluation CLI — same surface as the reference scripts/evaluate.py.

Positional ``checkpoint`` + flags --config --output-dir --device
(scripts/evaluate.py:395-430). Loads the checkpoint into a fresh model
built from config, runs the robustness sweep, writes
``evaluation_results.json`` + ``evaluation_report.md``.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import jax

from ..data.dataset import CityscapesKITTIDataset
from ..data.pipeline import BatchIterator
from ..eval.evaluator import Evaluator, generate_evaluation_report
from ..models.factory import create_model, init_model
from ..train.checkpoints import load_checkpoint
from ..utils.config import (Config, create_default_config, get_device_config,
                            load_config, setup_logging)

logger = logging.getLogger(__name__)


def load_model(checkpoint_path: str, config: Config):
    """Rebuild the architecture from config and restore checkpoint params
    (scripts/evaluate.py:42-86)."""
    model = create_model(config)
    h, w = config.get('data.image_size', [512, 1024])
    variables = init_model(model, jax.random.PRNGKey(config.get('seed', 42)),
                           (1, h, w, 3))
    template = {
        'epoch': 0, 'step': 0,
        'params': variables['params'],
        'batch_stats': variables.get('batch_stats', {}),
    }
    path = Path(checkpoint_path)
    try:
        tree, _meta = load_checkpoint(str(path), template)
        restored = {'params': tree['params'],
                    'batch_stats': tree['batch_stats']}
    except Exception:
        # allow restoring a bare {params, batch_stats} tree too
        tree, _meta = load_checkpoint(str(path), {
            'params': variables['params'],
            'batch_stats': variables.get('batch_stats', {})})
        restored = tree
    logger.info(f"Loaded model from {checkpoint_path}")
    return model, restored


def create_test_dataset_and_loader(config: Config):
    """Test split loader (scripts/evaluate.py:89-131)."""
    data_cfg = config.get('data', {}) or {}
    test_ds = CityscapesKITTIDataset(
        data_root=data_cfg.get('data_root', 'data'),
        split='test',
        image_size=tuple(data_cfg.get('image_size', [512, 1024])),
        weather_conditions=data_cfg.get('weather_conditions'),
        apply_augmentation=False,
        include_depth=data_cfg.get('include_depth', True),
        dataset_type=data_cfg.get('dataset_type', 'combined'),
        seed=config.get('seed', 42),
    )
    batch_size = config.get('training.batch_size', 2)
    return BatchIterator(test_ds, batch_size=batch_size, shuffle=False)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Evaluate adverse weather semantic segmentation models")
    parser.add_argument('checkpoint', type=str,
                        help='Path to model checkpoint')
    parser.add_argument('--config', type=str, default='configs/default.yaml',
                        help='Path to configuration file')
    parser.add_argument('--output-dir', type=str, default='results',
                        help='Output directory for evaluation results')
    parser.add_argument('--device', type=str, default='auto',
                        help='Device to use (auto, cpu, tpu)')
    args = parser.parse_args(argv)

    if not Path(args.checkpoint).exists():
        logger.error(f"Checkpoint file not found: {args.checkpoint}")
        sys.exit(1)

    try:
        if Path(args.config).exists():
            config = load_config(args.config)
        else:
            logger.warning(f"Config file {args.config} not found. "
                           "Using default configuration.")
            config = create_default_config()
    except Exception as e:
        logger.error(f"Error loading config: {e}")
        logger.info("Using default configuration")
        config = create_default_config()

    if args.device != 'auto':
        config.set('device', args.device)

    from ..core.cache import setup_compilation_cache
    setup_compilation_cache()
    setup_logging(config)
    platform = get_device_config(config.get('device', 'auto'))
    if platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    model, variables = load_model(args.checkpoint, config)
    test_loader = create_test_dataset_and_loader(config)

    evaluator = Evaluator(model, variables, config)
    results = evaluator.run(test_loader, seed=config.get('seed', 42))

    generate_evaluation_report(results, Path(args.output_dir))
    logger.info("Evaluation complete. Results:")
    for k, v in results.items():
        if not k.startswith('_'):
            logger.info(f"  {k}: {v:.4f}" if isinstance(v, float)
                        else f"  {k}: {v}")


if __name__ == '__main__':
    main()
