"""Checkpointing with Orbax — latest/best/periodic naming contract.

TPU-native replacement for the reference's ``torch.save`` checkpoints
(trainer.py:606-673). Each checkpoint is a directory with two Orbax
sub-trees — ``model`` ({epoch, step, params, batch_stats}) and ``opt``
({opt_state}) — plus a JSON sidecar with metrics/config. Splitting model
from optimizer lets evaluation restore weights without knowing the
optimizer structure (scripts/evaluate.py:42-86 loads only
model_state_dict). Naming matches the reference: ``latest/``, ``best/``,
``epoch_{N}/``.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _abstract(tree):
    return jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                  _to_host(tree))


class CheckpointManager:
    """latest / best / periodic checkpoints of model + optimizer trees."""

    def __init__(self, checkpoint_dir: str, keep_every: int = 10) -> None:
        self.checkpoint_dir = Path(checkpoint_dir).absolute()
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.keep_every = keep_every
        self._ckptr = ocp.StandardCheckpointer()

    def _save_to(self, name: str, model_tree: Dict[str, Any],
                 opt_tree: Optional[Dict[str, Any]],
                 meta: Dict[str, Any]) -> None:
        path = self.checkpoint_dir / name
        self._ckptr.save(path / 'model', _to_host(model_tree), force=True)
        if opt_tree is not None:
            self._ckptr.save(path / 'opt', _to_host(opt_tree), force=True)
        self._ckptr.wait_until_finished()
        with open(self.checkpoint_dir / f"{name}.meta.json", 'w') as f:
            json.dump(meta, f, indent=2, default=str)

    def save(self, epoch: int, model_tree: Dict[str, Any],
             opt_tree: Optional[Dict[str, Any]],
             metrics: Dict[str, float], config: Dict[str, Any],
             is_best: bool = False) -> None:
        """'latest' every epoch, 'best' on improvement, 'epoch_{N}' every 10
        (contract of trainer.py:606-642)."""
        meta = {'epoch': epoch, 'metrics': metrics, 'config': config}
        self._save_to('latest', model_tree, opt_tree, meta)
        if is_best:
            self._save_to('best', model_tree, opt_tree, meta)
            logger.info(f"New best model saved with mIoU: "
                        f"{metrics.get('val_miou', float('nan')):.4f}")
        if (epoch + 1) % self.keep_every == 0:
            self._save_to(f'epoch_{epoch + 1}', model_tree, opt_tree, meta)

    def restore(self, name_or_path: str, model_template: Dict[str, Any],
                opt_template: Optional[Dict[str, Any]] = None
                ) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]],
                           Dict[str, Any]]:
        """Restore by name ('latest', 'best', 'epoch_N') or path.

        Returns (model_tree, opt_tree_or_None, meta).
        """
        path = Path(name_or_path)
        if not path.is_absolute() and not path.exists():
            path = self.checkpoint_dir / name_or_path
        path = path.absolute()

        model_tree = self._ckptr.restore(path / 'model',
                                         _abstract(model_template))
        opt_tree = None
        if opt_template is not None and (path / 'opt').exists():
            opt_tree = self._ckptr.restore(path / 'opt',
                                           _abstract(opt_template))
        meta_path = Path(str(path) + '.meta.json')
        meta = {}
        if meta_path.exists():
            with open(meta_path) as f:
                meta = json.load(f)
        logger.info(f"Loaded checkpoint from {path}")
        return model_tree, opt_tree, meta


def load_checkpoint(checkpoint_path: str, model_template: Dict[str, Any]
                    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Standalone model-part restore (evaluate CLI, scripts/evaluate.py:42-86)."""
    path = Path(checkpoint_path).absolute()
    ckptr = ocp.StandardCheckpointer()
    model_dir = path / 'model' if (path / 'model').exists() else path
    tree = ckptr.restore(model_dir, _abstract(model_template))
    meta_path = Path(str(path) + '.meta.json')
    meta = {}
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta
