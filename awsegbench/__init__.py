"""Adverse Weather Semantic Segmentation Robustness Benchmark — TPU-native.

A ground-up JAX/XLA/Pallas re-design of
A-SHOJAEI/adverse-weather-semantic-segmentation-robustness-benchmark:
synthetic fog/rain/snow/night corruptions as batched on-device kernels,
SegFormer-B0 + DeepLabV3+ (ResNet-50) segmentation models with multi-task
depth heads and a confidence-calibrated ensemble, a fog-density-aware
training loss, and robustness metrics (mIoU, ECE, disagreement AUROC,
degradation ratio) that accumulate on TPU with no per-batch host syncs.
Scales over a ``jax.sharding.Mesh`` with data-parallel pjit.
"""

__version__ = "1.0.0"

# Basic utilities never require an accelerator runtime
from .utils.config import Config

# Conditional imports mirror the reference's torch-optional facade
# (/root/reference/src/.../__init__.py:11-46) with JAX as the runtime.
try:
    from .losses.fog_density import FogDensityAwareLoss
    from .metrics.robustness import RobustnessMetrics
    from .models.deeplab import DeepLabV3PlusModel
    from .models.ensemble import EnsembleModel
    from .models.segformer import SegFormerModel
    from .train.trainer import AdverseWeatherTrainer
    _JAX_AVAILABLE = True
except ImportError:  # pragma: no cover - graceful degradation contract
    _JAX_AVAILABLE = False

    class SegFormerModel:  # type: ignore[no-redef]
        pass

    class DeepLabV3PlusModel:  # type: ignore[no-redef]
        pass

    class EnsembleModel:  # type: ignore[no-redef]
        pass

    class FogDensityAwareLoss:  # type: ignore[no-redef]
        pass

    class AdverseWeatherTrainer:  # type: ignore[no-redef]
        pass

    class RobustnessMetrics:  # type: ignore[no-redef]
        pass

# torch-compat alias: downstream code checking the reference's flag keeps working
_TORCH_AVAILABLE = _JAX_AVAILABLE

__all__ = [
    "SegFormerModel",
    "DeepLabV3PlusModel",
    "EnsembleModel",
    "FogDensityAwareLoss",
    "AdverseWeatherTrainer",
    "RobustnessMetrics",
    "Config",
    "_JAX_AVAILABLE",
    "_TORCH_AVAILABLE",
]
