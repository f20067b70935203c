"""Configuration management.

Contract-identical to the reference config system
(/root/reference/src/.../utils/config.py:13-441): dot-notation ``Config``
wrapper with deep-merge, YAML load/save, ``CONFIG_SECTION__KEY=value``
environment overrides with typed parsing, programmatic defaults, schema-lite
validation, logging setup, and device auto-selection — except the device layer
targets JAX/TPU instead of torch/CUDA.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Any, Dict, Optional, Union

import yaml

logger = logging.getLogger(__name__)


class Config:
    """Dot-notation configuration wrapper.

    Mirrors the public behavior of the reference ``Config``
    (utils/config.py:13-130): ``get``/``set`` with dot-separated keys,
    ``update`` with deep merge, bracket access, ``in`` checks.
    """

    def __init__(self, config_dict: Optional[Dict[str, Any]] = None) -> None:
        self._config: Dict[str, Any] = config_dict or {}

    def get(self, key: str, default: Any = None) -> Any:
        value: Any = self._config
        for k in key.split('.'):
            if isinstance(value, dict) and k in value:
                value = value[k]
            else:
                return default
        return value

    def set(self, key: str, value: Any) -> None:
        keys = key.split('.')
        node = self._config
        for k in keys[:-1]:
            if k not in node or not isinstance(node[k], dict):
                node[k] = {}
            node = node[k]
        node[keys[-1]] = value

    def update(self, other_config: Union['Config', Dict[str, Any]]) -> None:
        other = other_config._config if isinstance(other_config, Config) else other_config
        self._config = _deep_merge(self._config, other)

    def to_dict(self) -> Dict[str, Any]:
        return self._config.copy()

    def __getitem__(self, key: str) -> Any:
        return self.get(key)

    def __setitem__(self, key: str, value: Any) -> None:
        self.set(key, value)

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def __repr__(self) -> str:
        return f"Config({self._config})"


def _deep_merge(dict1: Dict[str, Any], dict2: Dict[str, Any]) -> Dict[str, Any]:
    result = dict1.copy()
    for key, value in dict2.items():
        if key in result and isinstance(result[key], dict) and isinstance(value, dict):
            result[key] = _deep_merge(result[key], value)
        else:
            result[key] = value
    return result


def load_config(config_path: Union[str, Path]) -> Config:
    """Load YAML config, applying ``CONFIG_*`` env overrides.

    Same contract as reference utils/config.py:133-167.
    """
    config_path = Path(config_path)
    if not config_path.exists():
        raise FileNotFoundError(f"Configuration file not found: {config_path}")
    try:
        with open(config_path, 'r', encoding='utf-8') as f:
            config_dict = yaml.safe_load(f) or {}
        config_dict = _apply_env_overrides(config_dict)
        logger.info(f"Loaded configuration from {config_path}")
        return Config(config_dict)
    except yaml.YAMLError as e:
        raise yaml.YAMLError(f"Error parsing configuration file {config_path}: {e}")
    except Exception as e:
        raise RuntimeError(f"Error loading configuration from {config_path}: {e}")


def save_config(config: Config, config_path: Union[str, Path]) -> None:
    """Save configuration to a YAML file (reference utils/config.py:170-188)."""
    config_path = Path(config_path)
    config_path.parent.mkdir(parents=True, exist_ok=True)
    try:
        with open(config_path, 'w', encoding='utf-8') as f:
            yaml.safe_dump(config.to_dict(), f, default_flow_style=False, indent=2)
        logger.info(f"Saved configuration to {config_path}")
    except Exception as e:
        raise RuntimeError(f"Error saving configuration to {config_path}: {e}")


def _apply_env_overrides(config_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Apply ``CONFIG_SECTION__SUBSECTION__KEY=value`` overrides.

    Same convention as reference utils/config.py:191-221 — this is public API.
    """
    env_prefix = "CONFIG_"
    for env_key, env_value in os.environ.items():
        if not env_key.startswith(env_prefix):
            continue
        config_key = env_key[len(env_prefix):].lower().replace('__', '.')
        parsed_value = _parse_env_value(env_value)
        _set_nested_value(config_dict, config_key, parsed_value)
        logger.debug(f"Applied environment override: {config_key} = {parsed_value}")
    return config_dict


def _parse_env_value(value: str) -> Union[str, int, float, bool]:
    """bool → int → float → str parse order (reference utils/config.py:224-251)."""
    if value.lower() in ('true', 'false'):
        return value.lower() == 'true'
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    return value


def _set_nested_value(config_dict: Dict[str, Any], key: str, value: Any) -> None:
    keys = key.split('.')
    current = config_dict
    for k in keys[:-1]:
        if k not in current or not isinstance(current[k], dict):
            current[k] = {}
        current = current[k]
    current[keys[-1]] = value


def create_default_config() -> Config:
    """Default config tree — same schema/values as reference
    utils/config.py:276-351 / configs/default.yaml, plus TPU-native additions
    under ``tpu`` (mesh/precision) that default to single-chip behavior.
    """
    default_config = {
        'model': {
            'type': 'ensemble',
            'num_classes': 19,
            'include_depth': True,
            'pretrained': True,
            'ensemble_strategy': 'weighted_average',
            'temperature_scaling': True,
            # MiT family member for the SegFormer branch ('b0'..'b5', or an
            # HF segformer-bN id à la the reference's model_name)
            'segformer_variant': 'b0',
        },
        'data': {
            'dataset_type': 'combined',
            'data_root': 'data',
            'image_size': [512, 1024],
            'weather_conditions': ['clean', 'fog', 'rain', 'snow', 'night'],
            'apply_augmentation': True,
            'include_depth': True,
        },
        'training': {
            'batch_size': 2,
            'epochs': 100,
            'num_workers': 4,
            'pin_memory': True,
            'grad_clip': 1.0,
        },
        'optimizer': {
            'type': 'adamw',
            'learning_rate': 0.001,
            'weight_decay': 0.01,
            'betas': [0.9, 0.999],
        },
        'scheduler': {
            'enabled': True,
            'type': 'cosine',
            'eta_min': 0.000001,
        },
        'loss': {
            'type': 'fog_density_aware',
            'base_loss': 'cross_entropy',
            'depth_weight': 0.5,
            'fog_sensitivity': 2.0,
            'depth_loss_weight': 0.1,
        },
        'early_stopping': {
            'patience': 10,
            'min_delta': 0.001,
            'restore_best_weights': True,
        },
        'mlflow': {
            'enabled': True,
            'experiment_name': 'adverse_weather_segmentation',
            'run_name': None,
        },
        'evaluation': {
            'num_bins': 15,
            'auroc_mode': 'histogram',
            'spatial_tiling': 'auto',
            'tile_size': 'auto',
            'tile_halo': 128,
            'weather_conditions': ['clean', 'fog', 'rain', 'snow', 'night'],
        },
        'logging': {
            'level': 'INFO',
            'format': '%(asctime)s - %(name)s - %(levelname)s - %(message)s',
        },
        'paths': {
            'checkpoints': 'checkpoints',
            'logs': 'logs',
            'results': 'results',
        },
        'device': 'auto',  # 'auto', 'cpu', 'tpu' — JAX platform selection
        'seed': 42,
        # TPU-native extensions (no reference counterpart):
        'tpu': {
            'mesh_shape': 'auto',     # 'auto' = 1-D data mesh over all devices
            'precision': 'bf16',      # 'bf16' | 'fp32' compute dtype
            'donate_state': True,     # donate train state buffers under jit
            # Dropout-mask PRNG: 'rbg' uses the TPU hardware RNG (threefry
            # mask regeneration in fwd+bwd costs ~70 ms/step at 512x1024 B8);
            # 'threefry' keeps JAX's default stream. Deterministic either way.
            'dropout_rng': 'rbg',
        },
    }
    return Config(default_config)


def get_device_config(device_setting: str = 'auto') -> str:
    """Resolve the JAX platform to run on.

    TPU-native analog of reference utils/config.py:354-375: 'auto' prefers
    TPU, then GPU, then CPU. Returns a JAX platform string.
    """
    if device_setting == 'auto':
        try:
            import jax
            platforms = {d.platform for d in jax.devices()}
            for p in ('tpu', 'axon', 'gpu'):
                if p in platforms:
                    return 'tpu' if p == 'axon' else p
            return 'cpu'
        except Exception:
            logger.warning("JAX not available or no devices found, defaulting to CPU")
            return 'cpu'
    # accept torch-style strings for drop-in compatibility
    if device_setting.startswith('cuda'):
        return 'gpu'
    return device_setting


def setup_logging(config: Config) -> None:
    """Configure the root logger from config (reference utils/config.py:378-399)."""
    log_config = config.get('logging', {}) or {}
    log_level = log_config.get('level', 'INFO')
    log_format = log_config.get('format', '%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    numeric_level = getattr(logging, str(log_level).upper(), logging.INFO)
    logging.basicConfig(level=numeric_level, format=log_format, force=True)
    logger.info("Logging configured")


def validate_config(config: Config) -> None:
    """Validate required fields and value ranges (reference utils/config.py:402-441)."""
    required_fields = [
        'model.num_classes',
        'data.image_size',
        'training.batch_size',
        'training.epochs',
        'optimizer.learning_rate',
    ]
    for field in required_fields:
        if config.get(field) is None:
            raise ValueError(f"Required configuration field missing: {field}")

    if config.get('model.num_classes', 0) <= 0:
        raise ValueError("model.num_classes must be positive")
    if config.get('training.batch_size', 0) <= 0:
        raise ValueError("training.batch_size must be positive")
    if config.get('training.epochs', 0) <= 0:
        raise ValueError("training.epochs must be positive")
    if config.get('optimizer.learning_rate', 0) <= 0:
        raise ValueError("optimizer.learning_rate must be positive")

    image_size = config.get('data.image_size')
    if not isinstance(image_size, list) or len(image_size) != 2:
        raise ValueError("data.image_size must be a list of two integers [height, width]")

    logger.info("Configuration validation passed")
