"""Training: trainer, early stopping, optimizers/schedulers, checkpoints."""

from .checkpoints import CheckpointManager, load_checkpoint
from .optim import (
    CosineAnnealingLR,
    ReduceLROnPlateau,
    StepLR,
    create_optimizer,
    create_scheduler,
    get_learning_rate,
    set_learning_rate,
)
from .trainer import (
    AdverseWeatherTrainer,
    EarlyStopping,
    TrainState,
    fog_density_from_weather,
)

__all__ = [
    "AdverseWeatherTrainer", "EarlyStopping", "TrainState",
    "fog_density_from_weather", "CheckpointManager", "load_checkpoint",
    "create_optimizer", "create_scheduler", "set_learning_rate",
    "get_learning_rate", "CosineAnnealingLR", "StepLR", "ReduceLROnPlateau",
]
