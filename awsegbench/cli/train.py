"""Training CLI — same flag surface as the reference scripts/train.py.

Flags: --config --resume --device --seed --output-dir (scripts/train.py:167-199).
Config-not-found and load errors fall back to the default config; results are
dumped to ``<output>/<paths.results>/training_results.json``
(scripts/train.py:299-318). KeyboardInterrupt is caught gracefully.
"""

from __future__ import annotations

import argparse
import json
import logging
import random
import sys
from pathlib import Path

import numpy as np

from ..data.dataset import CityscapesKITTIDataset
from ..data.pipeline import BatchIterator
from ..models.factory import count_parameters, create_model
from ..train.trainer import AdverseWeatherTrainer
from ..utils.config import (Config, create_default_config, get_device_config,
                            load_config, setup_logging, validate_config)

logger = logging.getLogger(__name__)


def set_seed(seed: int) -> None:
    """Seed host RNGs (scripts/train.py:39-59). Device randomness flows from
    jax.random keys derived from the same seed inside the trainer."""
    random.seed(seed)
    np.random.seed(seed)


def create_datasets_and_loaders(config: Config):
    """Dataset/loader construction (scripts/train.py:100-162)."""
    data_cfg = config.get('data', {}) or {}
    common = dict(
        data_root=data_cfg.get('data_root', 'data'),
        image_size=tuple(data_cfg.get('image_size', [512, 1024])),
        weather_conditions=data_cfg.get('weather_conditions'),
        apply_augmentation=data_cfg.get('apply_augmentation', True),
        include_depth=data_cfg.get('include_depth', True),
        dataset_type=data_cfg.get('dataset_type', 'combined'),
        seed=config.get('seed', 42),
        # raw decoded-array cache (TFRecord-analog production path):
        # steady-state epochs read uint8 memmaps instead of re-decoding PNGs
        decoded_cache=data_cfg.get('decoded_cache'),
    )
    train_ds = CityscapesKITTIDataset(split='train', **common)
    val_ds = CityscapesKITTIDataset(split='val', **common)

    batch_size = config.get('training.batch_size', 2)
    num_workers = config.get('training.num_workers', 4)
    train_loader = BatchIterator(train_ds, batch_size=batch_size, shuffle=True,
                                 seed=config.get('seed', 42),
                                 num_threads=num_workers)
    val_loader = BatchIterator(val_ds, batch_size=batch_size, shuffle=False,
                               num_threads=num_workers)
    return train_loader, val_loader


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Train adverse weather semantic segmentation models")
    parser.add_argument('--config', type=str, default='configs/default.yaml',
                        help='Path to configuration file')
    parser.add_argument('--resume', type=str, default=None,
                        help='Path to checkpoint to resume from')
    parser.add_argument('--device', type=str, default='auto',
                        help='Device to use (auto, cpu, tpu)')
    parser.add_argument('--seed', type=int, default=None,
                        help='Random seed (overrides config)')
    parser.add_argument('--output-dir', type=str, default='.',
                        help='Output directory for checkpoints and logs')
    args = parser.parse_args(argv)

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
    if args.seed is not None:
        config.set('seed', args.seed)

    output_dir = Path(args.output_dir)
    checkpoint_dir = output_dir / config.get('paths.checkpoints', 'checkpoints')
    log_dir = output_dir / config.get('paths.logs', 'logs')
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    log_dir.mkdir(parents=True, exist_ok=True)

    setup_logging(config)
    try:
        validate_config(config)
    except ValueError as e:
        logger.error(f"Configuration validation failed: {e}")
        sys.exit(1)

    from ..core.cache import setup_compilation_cache
    setup_compilation_cache()
    seed = config.get('seed', 42)
    set_seed(seed)

    platform = get_device_config(config.get('device', 'auto'))
    logger.info(f"Using JAX platform: {platform}")
    if platform == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')

    try:
        model = create_model(config)
    except Exception as e:
        logger.error(f"Error creating model: {e}")
        sys.exit(1)

    # Missing dataset files are handled inside the dataset itself (synthetic
    # fallback, data/dataset.py); any exception here is a real error.
    try:
        train_loader, val_loader = create_datasets_and_loaders(config)
    except Exception as e:
        logger.error(f"Error creating datasets: {e}")
        sys.exit(1)

    trainer = AdverseWeatherTrainer(
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        config=config.to_dict(),
        checkpoint_dir=str(checkpoint_dir),
        log_dir=str(log_dir),
    )
    logger.info(f"Model parameters: "
                f"{count_parameters(trainer.state.params):,} total")

    if args.resume:
        try:
            trainer.load_checkpoint(args.resume)
            logger.info(f"Resumed training from {args.resume}")
        except Exception as e:
            logger.error(f"Error loading checkpoint: {e}")
            sys.exit(1)

    try:
        logger.info("Starting training...")
        results = trainer.train()
        logger.info("Training completed successfully!")
        logger.info(f"Best validation mIoU: {results['best_val_miou']:.4f}")
        logger.info(f"Best validation loss: {results['best_val_loss']:.4f}")
        logger.info(f"Total epochs: {results['total_epochs']}")

        results_dir = output_dir / config.get('paths.results', 'results')
        results_dir.mkdir(parents=True, exist_ok=True)
        with open(results_dir / 'training_results.json', 'w') as f:
            json.dump({
                'best_val_miou': results['best_val_miou'],
                'best_val_loss': results['best_val_loss'],
                'total_epochs': results['total_epochs'],
                # per-epoch losses + train_images_per_sec (throughput record)
                'history': results['history'],
                'config': config.to_dict(),
            }, f, indent=2, default=str)
    except KeyboardInterrupt:
        logger.info("Training interrupted by user")
    except Exception as e:
        logger.error(f"Training failed: {e}")
        raise


if __name__ == '__main__':
    main()
