"""Data loading: host scanners + synthetic fallback, device-side pipeline."""

from .dataset import CITYSCAPES_CLASSES, CityscapesKITTIDataset
from .pipeline import (
    IMAGENET_MEAN,
    create_dataloader,
    IMAGENET_STD,
    BatchIterator,
    normalize_imagenet,
    prepare_batch,
)

__all__ = [
    "CityscapesKITTIDataset", "CITYSCAPES_CLASSES", "BatchIterator",
    "create_dataloader",
    "prepare_batch", "normalize_imagenet", "IMAGENET_MEAN", "IMAGENET_STD",
]
