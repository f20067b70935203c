"""Checkpointing with Orbax — latest/best/periodic naming contract.

TPU-native replacement for the reference's ``torch.save`` checkpoints
(trainer.py:606-673): the train-state PyTree
{epoch, params, batch_stats, opt_state, metrics, config} is written with
``orbax.checkpoint.StandardCheckpointer`` under ``latest/``, ``best/`` and
``epoch_{N}/`` directories — same semantics as the reference's
``latest.pth`` / ``best.pth`` / ``epoch_N.pth`` files.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """latest / best / periodic checkpoints of an arbitrary PyTree."""

    def __init__(self, checkpoint_dir: str, keep_every: int = 10) -> None:
        self.checkpoint_dir = Path(checkpoint_dir).absolute()
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.keep_every = keep_every
        self._ckptr = ocp.StandardCheckpointer()

    def _save_to(self, name: str, tree: Dict[str, Any],
                 meta: Dict[str, Any]) -> None:
        path = self.checkpoint_dir / name
        self._ckptr.save(path, _to_host(tree), force=True)
        self._ckptr.wait_until_finished()
        with open(self.checkpoint_dir / f"{name}.meta.json", 'w') as f:
            json.dump(meta, f, indent=2, default=str)

    def save(self, epoch: int, tree: Dict[str, Any],
             metrics: Dict[str, float], config: Dict[str, Any],
             is_best: bool = False) -> None:
        """Save 'latest', optionally 'best', and 'epoch_{N}' every 10 epochs
        (contract of trainer.py:606-642)."""
        meta = {'epoch': epoch, 'metrics': metrics, 'config': config}
        self._save_to('latest', tree, meta)
        if is_best:
            self._save_to('best', tree, meta)
            logger.info(f"New best model saved with mIoU: "
                        f"{metrics.get('val_miou', float('nan')):.4f}")
        if (epoch + 1) % self.keep_every == 0:
            self._save_to(f'epoch_{epoch + 1}', tree, meta)

    def restore(self, name_or_path: str, template: Dict[str, Any]
                ) -> tuple[Dict[str, Any], Dict[str, Any]]:
        """Restore a checkpoint by name ('latest', 'best', 'epoch_N') or path.

        Returns (tree, meta). ``template`` is a PyTree with the target
        structure/shapes (an existing train-state dict).
        """
        path = Path(name_or_path)
        if not path.is_absolute() and not path.exists():
            path = self.checkpoint_dir / name_or_path
        path = path.absolute()
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          _to_host(template))
        tree = self._ckptr.restore(path, abstract)
        meta_path = Path(str(path) + '.meta.json')
        meta = {}
        if meta_path.exists():
            with open(meta_path) as f:
                meta = json.load(f)
        logger.info(f"Loaded checkpoint from {path}")
        return tree, meta


def load_checkpoint(checkpoint_path: str, template: Dict[str, Any]
                    ) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """Standalone restore (used by evaluate CLI, scripts/evaluate.py:42-86)."""
    path = Path(checkpoint_path).absolute()
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      _to_host(template))
    tree = ckptr.restore(path, abstract)
    meta_path = Path(str(path) + '.meta.json')
    meta = {}
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta
