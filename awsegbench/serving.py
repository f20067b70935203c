"""AOT serving export: compile the eval forward once, serve it anywhere.

The reference stops at checkpoint files — deployment means carrying the
whole torch stack. The TPU-native answer is ``jax.export``: the jitted
eval forward (normalize → ensemble forward → logits [+ depth]) is lowered
to StableHLO at fixed shapes, the weights are baked in as constants, and
the result is one self-contained artifact a serving host can load and run
without model code, checkpoint trees, or the config system — only jax.
Artifacts are portable across lowering platforms (export for ``tpu`` from
a CPU host); calling one checks the platform at dispatch time.

Layout of an artifact directory:
    model.stablehlo   serialized jax.export module (weights inlined)
    meta.json         shapes, dtype policy, class count, git describe

Extends the reference scope (deployment was out of scope there; closest
hook is the eval CLI's checkpoint restore, evaluation/evaluator.py);
design follows the jax.export AOT recipe.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Mapping, Optional, Sequence

logger = logging.getLogger(__name__)

_ARTIFACT = 'model.stablehlo'
_META = 'meta.json'


def build_serving_fn(model, variables: Dict[str, Any], *,
                     precision: str = 'bf16', include_depth: bool = True):
    """The serving forward: uint8 NHWC images → f32 logits dict.

    Matches the Evaluator's eval path (eval/evaluator.py): weights cast
    once to the policy compute dtype, normalize on device, logits returned
    in f32. No weather corruption — serving sees real images.
    """
    import jax.numpy as jnp

    from .core.precision import get_policy
    from .data.pipeline import normalize_imagenet

    policy = get_policy(precision)
    cast_vars = policy.cast_to_compute(variables)

    def serve(images_u8):
        x = normalize_imagenet(images_u8).astype(policy.compute_dtype)
        out = model.apply(cast_vars, x, train=False)
        res = {'segmentation': out['segmentation'].astype(jnp.float32)}
        if include_depth and 'depth' in out:
            res['depth'] = out['depth'].astype(jnp.float32)
        return res

    return serve


def export_serving(model, variables: Dict[str, Any],
                   image_hw: Sequence[int], *, batch_size=1,
                   precision: str = 'bf16', include_depth: bool = True,
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """Lower + serialize the serving forward at static spatial shapes.

    ``batch_size`` is an int for a fixed-batch artifact, or ``'poly'``
    for a batch-polymorphic one (jax.export symbolic dimension — one
    artifact serves any batch size; spatial dims stay static, which is
    what XLA tiling wants). ``platforms=None`` exports for the current
    backend; pass e.g. ``('tpu', 'cpu')`` for a multi-platform artifact
    (lowering needs no device — a CPU host can export for TPU).
    """
    import jax
    import jax.numpy as jnp

    serve = build_serving_fn(model, variables, precision=precision,
                             include_depth=include_depth)
    h, w = int(image_hw[0]), int(image_hw[1])
    if batch_size == 'poly':
        batch_size, = jax.export.symbolic_shape('b')
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8)
    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = list(platforms)
    exported = jax.export.export(jax.jit(serve), **kwargs)(spec)
    return exported.serialize()


def save_serving_artifact(out_dir, blob: bytes,
                          meta: Mapping[str, Any]) -> Path:
    """Write ``model.stablehlo`` + ``meta.json`` under ``out_dir``."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / _ARTIFACT).write_bytes(blob)
    (out / _META).write_text(json.dumps(dict(meta), indent=2))
    logger.info(f'Serving artifact written to {out} '
                f'({len(blob) / 1e6:.1f} MB)')
    return out


class ServingModel:
    """A loaded serving artifact: ``predict(images_u8)`` → logits dict.

    Needs only jax at load time — no model code, config, or checkpoint
    tree. Input shape/dtype are static (fixed at export); mismatches fail
    loudly with the expected spec.
    """

    def __init__(self, exported, meta: Dict[str, Any]):
        self._exported = exported
        self.meta = meta
        self.input_spec = tuple(meta['input_shape'])

    @classmethod
    def load(cls, artifact_dir) -> 'ServingModel':
        import jax

        d = Path(artifact_dir)
        blob = (d / _ARTIFACT).read_bytes()
        meta = json.loads((d / _META).read_text())
        return cls(jax.export.deserialize(blob), meta)

    def predict(self, images_u8) -> Dict[str, Any]:
        import numpy as np

        x = np.asarray(images_u8)
        spec_ok = (len(x.shape) == len(self.input_spec) and all(
            e == 'poly' or int(e) == s
            for e, s in zip(self.input_spec, x.shape)))
        if not spec_ok or x.dtype != np.uint8:
            raise ValueError(
                f'expected uint8 input of shape {self.input_spec}, got '
                f'{x.dtype} {tuple(x.shape)} (shapes are static at export; '
                f're-export for other sizes)')
        return self._exported.call(x)

    @property
    def platforms(self) -> tuple:
        return tuple(self._exported.platforms)
