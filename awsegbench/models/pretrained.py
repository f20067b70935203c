"""Pretrained encoder weight resolution + grafting.

The reference defaults to pretrained encoders with graceful fallback to
random init: HF SegFormer weights at model.py:94,111-146 and smp ImageNet
ResNet-50 at model.py:239,258-274. This environment has no network egress,
so weights are resolved from a local cache directory instead:

    ``$AWSEG_WEIGHTS_DIR`` (default ``~/.cache/awsegbench/weights``)

Recognized files (first match wins, ``.npz`` preferred):

* SegFormer MiT-B0 encoder — ``segformer_b0.{npz,safetensors,pt,pth,bin}``:
  an HF ``SegformerModel`` state dict (a leading ``segformer.`` prefix, as
  saved from ``SegformerForSemanticSegmentation``, is stripped).
* ResNet-50 encoder — ``resnet50.{npz,safetensors,pt,pth,bin}``: a
  torchvision-style state dict (``conv1/bn1/layer{1..4}``).

Anything missing or malformed degrades gracefully to random init with a
warning — the same contract as the reference. Conversion itself is handled
by :mod:`awsegbench.models.convert`; this module only finds files, loads
state dicts (without requiring torch for ``.npz``), shape-checks, and
grafts the converted trees into a freshly-initialized variables PyTree.
"""

from __future__ import annotations

import copy
import logging
import os
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np

from .convert import convert_hf_segformer_encoder, convert_torch_resnet_encoder

logger = logging.getLogger(__name__)

_EXTS = ('.npz', '.safetensors', '.pt', '.pth', '.bin')


def resolve_weights_dir() -> Path:
    return Path(os.environ.get(
        'AWSEG_WEIGHTS_DIR',
        str(Path.home() / '.cache' / 'awsegbench' / 'weights')))


def find_weights_file(stem: str,
                      weights_dir: Optional[Path] = None) -> Optional[Path]:
    d = Path(weights_dir) if weights_dir is not None else resolve_weights_dir()
    if not d.is_dir():
        return None
    for ext in _EXTS:
        p = d / f'{stem}{ext}'
        if p.is_file():
            return p
    return None


def load_state_dict(path: Path) -> Dict[str, np.ndarray]:
    """Load a ``{name: ndarray}`` state dict from npz/safetensors/torch."""
    path = Path(path)
    if path.suffix == '.npz':
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    if path.suffix == '.safetensors':
        from safetensors.numpy import load_file
        return dict(load_file(str(path)))
    # torch pickle formats
    import torch
    sd = torch.load(str(path), map_location='cpu', weights_only=True)
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    if 'state_dict' in sd and isinstance(sd['state_dict'], dict):
        sd = sd['state_dict']
    return {k: np.asarray(v.numpy() if hasattr(v, 'numpy') else v)
            for k, v in sd.items()}


def _strip_prefix(sd: Mapping[str, np.ndarray],
                  marker: str) -> Dict[str, np.ndarray]:
    """Strip a uniform wrapping prefix (e.g. 'segformer.') if every key that
    contains ``marker`` is prefixed with it."""
    keys = [k for k in sd if marker in k]
    if keys and all(k.startswith(marker) for k in keys):
        n = len(marker)
        return {(k[n:] if k.startswith(marker) else k): v
                for k, v in sd.items()}
    return dict(sd)


def _tree_at(tree: Dict, scope: str) -> Optional[Dict]:
    node = tree
    for k in scope.split('/'):
        if not isinstance(node, Mapping) or k not in node:
            return None
        node = node[k]
    return node


def _set_tree_at(tree: Dict, scope: str, value: Any) -> None:
    node = tree
    keys = scope.split('/')
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _check_shapes(new: Dict, existing: Dict, what: str) -> None:
    """Every leaf in ``existing`` must appear in ``new`` with the same shape
    (extra leaves in ``new`` are an error too: the converted tree must be a
    drop-in replacement)."""
    new_leaves = {jax.tree_util.keystr(p): np.shape(v)
                  for p, v in jax.tree_util.tree_leaves_with_path(new)}
    old_leaves = {jax.tree_util.keystr(p): np.shape(v)
                  for p, v in jax.tree_util.tree_leaves_with_path(existing)}
    if new_leaves.keys() != old_leaves.keys():
        missing = sorted(old_leaves.keys() - new_leaves.keys())[:4]
        extra = sorted(new_leaves.keys() - old_leaves.keys())[:4]
        raise ValueError(f'{what}: param tree mismatch '
                         f'(missing={missing}, extra={extra})')
    for k, shp in old_leaves.items():
        if new_leaves[k] != shp:
            raise ValueError(
                f'{what}: shape mismatch at {k}: {new_leaves[k]} vs {shp}')


def _graft_segformer(variables: Dict, scope_prefix: str,
                     weights_dir: Optional[Path],
                     variant: str = 'b0') -> bool:
    from .segformer import MIT_VARIANTS, mit_variant_name
    variant = mit_variant_name(variant)
    path = find_weights_file(f'segformer_{variant}', weights_dir)
    if path is None:
        logger.warning(
            f'Pretrained SegFormer ({variant}) weights not found in '
            f'{weights_dir or resolve_weights_dir()} — using random init '
            '(reference fallback contract, model.py:111-146)')
        return False
    sd = _strip_prefix(load_state_dict(path), 'segformer.')
    enc_scope = (f'{scope_prefix}/MiTEncoder_0' if scope_prefix
                 else 'MiTEncoder_0')
    existing = _tree_at(variables['params'], enc_scope)
    if existing is None:
        raise ValueError(f'encoder scope {enc_scope} not found in params')
    converted = convert_hf_segformer_encoder(sd,
                                             depths=MIT_VARIANTS[variant][1])
    _check_shapes(converted, existing, f'segformer encoder ({path.name})')
    _set_tree_at(variables['params'], enc_scope, converted)
    logger.info(f'Loaded pretrained SegFormer encoder from {path}')
    return True


def _graft_resnet(variables: Dict, scope_prefix: str,
                  weights_dir: Optional[Path]) -> bool:
    path = find_weights_file('resnet50', weights_dir)
    if path is None:
        logger.warning(
            'Pretrained ResNet-50 weights not found in '
            f'{weights_dir or resolve_weights_dir()} — using random init '
            '(reference fallback contract, model.py:258-274)')
        return False
    sd = load_state_dict(path)
    enc_scope = (f'{scope_prefix}/ResNetEncoder_0' if scope_prefix
                 else 'ResNetEncoder_0')
    existing = _tree_at(variables['params'], enc_scope)
    if existing is None:
        raise ValueError(f'encoder scope {enc_scope} not found in params')
    converted = convert_torch_resnet_encoder(sd)
    stats = converted.pop('__batch_stats__')
    _check_shapes(converted, existing, f'resnet50 encoder ({path.name})')
    _set_tree_at(variables['params'], enc_scope, converted)
    existing_stats = _tree_at(variables.get('batch_stats', {}), enc_scope)
    if existing_stats is not None:
        _check_shapes(stats, existing_stats,
                      f'resnet50 batch stats ({path.name})')
        _set_tree_at(variables['batch_stats'], enc_scope, stats)
    logger.info(f'Loaded pretrained ResNet-50 encoder from {path}')
    return True


def apply_pretrained(variables: Dict, model_config: Mapping[str, Any],
                     weights_dir: Optional[Path] = None) -> Dict:
    """Graft cached pretrained encoder weights into ``variables``.

    Returns a new variables tree (input is not mutated). Per-encoder
    graceful fallback: a missing or malformed weights file leaves that
    encoder randomly initialized and logs a warning, exactly like the
    reference's try/except constructors.
    """
    from flax.core import unfreeze
    model_type = model_config.get('type', 'ensemble')
    out = copy.deepcopy(unfreeze(variables))

    targets = []
    if model_type == 'segformer':
        targets.append(('segformer', ''))
    elif model_type == 'deeplabv3plus':
        targets.append(('resnet', ''))
    else:  # ensemble: submodule scopes from EnsembleModel.setup
        targets.append(('segformer', 'segformer'))
        targets.append(('resnet', 'deeplabv3plus'))

    variant = model_config.get('segformer_variant')
    if variant is None:
        from .segformer import mit_variant_name
        variant = mit_variant_name(model_config.get('model_name', 'b0'),
                                   default='b0')
    for kind, scope in targets:
        try:
            if kind == 'segformer':
                _graft_segformer(out, scope, weights_dir, variant=variant)
            else:
                _graft_resnet(out, scope, weights_dir)
        except Exception as e:
            logger.warning(f'Could not load pretrained {kind} weights: {e} '
                           '— using random init')
    return out
