"""Optimizer + LR scheduler factories (optax, torch-semantics).

Mirrors the reference factories (trainer.py:170-230):
* optimizers: adamw (decoupled wd), sgd (momentum, L2-into-grad wd),
  adam (L2-into-grad wd) — matching torch.optim semantics;
* schedulers: cosine / step / plateau stepped once per EPOCH on the host
  (the reference calls ``scheduler.step()`` per epoch, trainer.py:538-542),
  with the learning rate injected into the optax state via
  ``optax.inject_hyperparams`` so the jitted train step never recompiles.
* global-norm gradient clipping (trainer.py:339-341) is part of the chain.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import optax


def create_optimizer(config: Dict[str, Any], grad_clip: float = 1.0
                     ) -> optax.GradientTransformation:
    """Build the optax chain from the reference's optimizer config schema."""
    opt_type = str(config.get('type', 'adamw')).lower()
    lr = config.get('learning_rate', 0.001)
    wd = config.get('weight_decay', 0.01)

    def make(learning_rate):
        if opt_type == 'adamw':
            betas = config.get('betas', (0.9, 0.999))
            inner = optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                                eps=1e-8, weight_decay=wd)
        elif opt_type == 'sgd':
            momentum = config.get('momentum', 0.9)
            inner = optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.sgd(learning_rate, momentum=momentum),
            )
        else:  # adam with torch's L2-style weight decay
            inner = optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.adam(learning_rate, eps=1e-8),
            )
        if grad_clip and grad_clip > 0:
            return optax.chain(optax.clip_by_global_norm(grad_clip), inner)
        return inner

    return optax.inject_hyperparams(make)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Write the current LR into an inject_hyperparams state (host-side)."""
    opt_state.hyperparams['learning_rate'] = lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams['learning_rate'])


class LRScheduler:
    """Base epoch scheduler with torch-like ``step()`` semantics.

    Epoch 0 trains at ``base_lr``; each post-epoch ``step()`` advances
    ``last_epoch`` and returns the LR for the NEXT epoch (torch calls its
    closed form at the incremented counter).
    """

    def __init__(self, base_lr: float) -> None:
        self.base_lr = base_lr
        self.last_epoch = 0
        self.current_lr = base_lr

    def step(self, metric: Optional[float] = None) -> float:
        self.last_epoch += 1
        self.current_lr = self._compute_lr(metric)
        return self.current_lr

    def _compute_lr(self, metric: Optional[float]) -> float:  # pragma: no cover
        raise NotImplementedError

    def state_dict(self) -> Dict[str, Any]:
        return {'last_epoch': self.last_epoch, 'current_lr': self.current_lr,
                'base_lr': self.base_lr}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.last_epoch = state['last_epoch']
        self.current_lr = state['current_lr']
        self.base_lr = state.get('base_lr', self.base_lr)


class CosineAnnealingLR(LRScheduler):
    """torch.optim.lr_scheduler.CosineAnnealingLR closed form."""

    def __init__(self, base_lr: float, t_max: int, eta_min: float = 1e-6) -> None:
        super().__init__(base_lr)
        self.t_max = max(1, t_max)
        self.eta_min = eta_min

    def _compute_lr(self, metric=None) -> float:
        e = self.last_epoch
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * e / self.t_max)) / 2


class StepLR(LRScheduler):
    def __init__(self, base_lr: float, step_size: int = 30, gamma: float = 0.1) -> None:
        super().__init__(base_lr)
        self.step_size = step_size
        self.gamma = gamma

    def _compute_lr(self, metric=None) -> float:
        return self.base_lr * (self.gamma ** (self.last_epoch // self.step_size))


class ReduceLROnPlateau(LRScheduler):
    """torch ReduceLROnPlateau (mode='min') semantics."""

    def __init__(self, base_lr: float, patience: int = 5, factor: float = 0.5,
                 min_lr: float = 0.0) -> None:
        super().__init__(base_lr)
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.best = float('inf')
        self.num_bad_epochs = 0

    def _compute_lr(self, metric: Optional[float]) -> float:
        if metric is None:
            return self.current_lr
        if metric < self.best:
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            return max(self.current_lr * self.factor, self.min_lr)
        return self.current_lr

    def state_dict(self) -> Dict[str, Any]:
        d = super().state_dict()
        d.update({'best': self.best, 'num_bad_epochs': self.num_bad_epochs})
        return d

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        super().load_state_dict(state)
        self.best = state.get('best', float('inf'))
        self.num_bad_epochs = state.get('num_bad_epochs', 0)


def create_scheduler(scheduler_config: Dict[str, Any], base_lr: float,
                     epochs: int) -> Optional[LRScheduler]:
    """Scheduler factory matching trainer.py:200-230."""
    if not scheduler_config or not scheduler_config.get('enabled', False):
        return None
    stype = scheduler_config.get('type', 'cosine')
    if stype == 'cosine':
        return CosineAnnealingLR(base_lr, t_max=epochs,
                                 eta_min=scheduler_config.get('eta_min', 1e-6))
    if stype == 'step':
        return StepLR(base_lr, step_size=scheduler_config.get('step_size', 30),
                      gamma=scheduler_config.get('gamma', 0.1))
    if stype == 'plateau':
        return ReduceLROnPlateau(base_lr,
                                 patience=scheduler_config.get('patience', 5),
                                 factor=scheduler_config.get('factor', 0.5))
    return None
