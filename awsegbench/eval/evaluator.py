"""Evaluation driver — the robustness benchmark sweep.

TPU-native re-design of the reference ``scripts/evaluate.py:134-274``. The
reference keeps the ENTIRE test set's logits on CPU (all_logits list) and
computes metrics with sklearn afterwards; here every metric accumulates on
device inside one jitted step:

* [6, C, C] confusion matrices (overall + 5 weathers) → mIoU,
* [6, num_bins, 3] ECE bin stats (overall + per weather),
* [K, 2] disagreement-score histogram (pos=error / neg=correct) → AUROC
  with within-bin tie correction (log-spaced 2^20 bins, equals sklearn within ~1e-4;
  'exact' mode additionally collects raw scores for small test sets).

One host transfer happens at sweep end. Result keys match the reference:
overall_miou, miou_{weather}, expected_calibration_error, ece_{weather},
ensemble_disagreement_auroc, robustness_degradation_{weather},
robustness_degradation_ratio.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import batch_sharding, create_mesh, replicated_sharding
from ..core.precision import get_policy
from ..core.prng import RngStreams, per_sample_keys
from ..data.pipeline import prepare_batch
from ..metrics.calibration import (ece_bin_update_per_weather,
                                   ece_from_bins)
from ..metrics.disagreement import (auroc_exact, auroc_from_histogram,
                                    auroc_histogram_update, disagreement_map)
from ..metrics.iou import (confusion_matrix_per_weather_from_logits,
                           iou_from_confusion)
from ..metrics.robustness import RobustnessMetrics
from ..weather.corruption import WEATHER_CONDITIONS

logger = logging.getLogger(__name__)

AUROC_BINS = 1 << 20   # 8 MB of (pos, neg) counts — log-spaced bins
# mutual-information disagreement of a 2-member ensemble lies in [~0, ln 2];
# the 1e-8 log-epsilon quirk can push it a hair negative
AUROC_RANGE = (-0.01, 0.75)


class Evaluator:
    """Jitted per-batch evaluation with on-device accumulators."""

    def __init__(self, model, variables: Dict[str, Any], config,
                 mesh=None, num_bins: int = 15,
                 collect_exact_auroc: bool = False,
                 auroc_mode: Optional[str] = None) -> None:
        self.model = model
        self.variables = variables
        cfg = config.to_dict() if hasattr(config, 'to_dict') else dict(config or {})
        self.config = cfg
        model_cfg = cfg.get('model') or {}
        self.num_classes = model_cfg.get('num_classes', 19)
        self.num_bins = num_bins
        self.collect_exact_auroc = collect_exact_auroc
        # AUROC modes (reference semantics = exact sklearn rank AUROC,
        # metrics.py:393-438):
        #  'histogram'  — streaming 2^20-bin log-histogram (≤~1e-4 of exact)
        #  'exact'      — scores stay ON DEVICE in a mesh-sharded buffer; one
        #                 distributed sort at sweep end gives the exact value
        #  'exact_host' — legacy: gather scores to host, exact sort there
        if auroc_mode is None:
            auroc_mode = (cfg.get('evaluation') or {}).get(
                'auroc_mode', 'exact_host' if collect_exact_auroc
                else 'histogram')
        if auroc_mode not in ('histogram', 'exact', 'exact_host'):
            raise ValueError(f'Unknown auroc_mode: {auroc_mode!r}')
        self.auroc_mode = auroc_mode
        self.collect_exact_auroc = (auroc_mode == 'exact_host')

        tpu_cfg = cfg.get('tpu') or {}
        self.mesh = mesh if mesh is not None else create_mesh(
            mesh_shape=tpu_cfg.get('mesh_shape', 'auto'))
        self.n_devices = self.mesh.devices.size
        self.policy = get_policy(tpu_cfg.get('precision', 'bf16'))
        # Cast the model weights ONCE to the policy compute dtype. Casting
        # only the input is not enough: flax modules with dtype=None promote
        # (bf16 activations × f32 params) back to f32, so without this the
        # whole forward silently ran full-precision and the MXU at half
        # rate. Metrics stay f32 (the step casts logits before softmax/ECE);
        # the fp32 policy keeps this a no-op for reference-parity runs.
        self.variables = self.policy.cast_to_compute(self.variables)

        # Spatial tiling (SURVEY §5 long-context analog): shard one full-res
        # image's tile grid over the mesh instead of the batch axis.
        #  'auto' — tile when the image is ≥ 2048×1024 AND the mesh has >1
        #           device; 'on'/'off' force it. tile_size 'auto' picks a
        #           near-square n_devices grid. Tiled inference is EXACT
        #           (f32-rounding) vs the monolithic forward for the
        #           product model families: SR attention gathers the
        #           full-image KV, ASPP runs on the assembled full map, and
        #           per-stage halo resyncs keep every segment's local
        #           receptive radius (≤ ~96 px for B0/R50) inside the
        #           default 128 px halo (parallel/collectives.TileInfo;
        #           tests/test_parallel.py tiled-vs-monolithic ensemble).
        eval_cfg = cfg.get('evaluation') or {}
        self.spatial_tiling = eval_cfg.get('spatial_tiling', 'auto')
        self.tile_size = eval_cfg.get('tile_size', 'auto')
        self.tile_halo = int(eval_cfg.get('tile_halo', 128))
        self._step = None  # built lazily: tiling decision needs image size

    def _use_tiling(self, height: int, width: int) -> bool:
        if self.spatial_tiling == 'on':
            return True
        if self.spatial_tiling == 'auto':
            return height * width >= 2048 * 1024 and self.n_devices > 1
        return False

    def _resolve_tiles(self, height: int, width: int):
        from ..parallel.collectives import choose_tile_grid
        if self.tile_size == 'auto':
            return choose_tile_grid(height, width, self.n_devices)
        return tuple(self.tile_size)

    def _build_step(self, tiled: bool, image_hw=None):
        n_weathers = len(WEATHER_CONDITIONS)
        c = self.num_classes
        if tiled:
            tile_h, tile_w = self._resolve_tiles(*image_hw)
            halo = self.tile_halo
            logger.info(f'Spatial tiling enabled: {tile_h}x{tile_w} tiles '
                        f'+{halo}px halo over {self.n_devices} devices')

        def forward(variables, x):
            if not tiled:
                return self.model.apply(variables, x, train=False)
            import inspect
            from ..parallel.collectives import tiled_forward
            # models that accept tile_info (the product families) get the
            # exact tiled path (halo resyncs + full-image KV/ASPP); plain
            # conv models are halo-exact already
            accepts_ti = 'tile_info' in inspect.signature(
                type(self.model).__call__).parameters

            if accepts_ti:
                apply_fn = lambda v, t, ti: self.model.apply(  # noqa: E731
                    v, t, train=False, tile_info=ti)
            else:
                apply_fn = lambda v, t: self.model.apply(  # noqa: E731
                    v, t, train=False)

            def one(img):
                return tiled_forward(
                    apply_fn, variables, img, tile_h, tile_w, halo,
                    mesh=self.mesh, with_tile_info=accepts_ti)
            # sequential over the (small) image batch; parallel over tiles
            return jax.lax.map(one, x)

        def step(variables, images, labels, weather_ids, sample_ids,
                 sample_mask, step_key, acc):
            keys = per_sample_keys(step_key, sample_ids)
            prep = prepare_batch(images, labels, weather_ids, keys,
                                 train=False, include_depth=False)
            x = prep['image'].astype(self.policy.compute_dtype)
            outputs = forward(variables, x)
            logits = outputs['segmentation'].astype(jnp.float32)
            lbl = prep['label']

            # confusion + ECE via ONE joint (weather × class/bin) one-hot
            # matmul each; slot 0 (overall) = sum over weathers. The CM
            # takes the model-dtype logits directly (bf16→f32 is monotone
            # injective, so argmax decisions incl. tie-breaks are
            # identical) and reduces them to int argmax [B,H,W] before the
            # chunked one-hot matmul — no [B,H,W,C]-shaped temp survives
            # (the r4 "fused" variant's s32 cumsum temp was the BENCH_r04
            # HBM OOM); f32 is kept for the ECE softmax/binning only.
            cm_w = confusion_matrix_per_weather_from_logits(
                outputs['segmentation'], lbl, c, weather_ids, n_weathers,
                sample_mask=sample_mask)
            ece_w = ece_bin_update_per_weather(
                logits, lbl, weather_ids, n_weathers, self.num_bins,
                sample_mask=sample_mask, class_axis=-1)
            acc = dict(acc)
            acc['cm'] = acc['cm'] + jnp.concatenate(
                [cm_w.sum(axis=0, keepdims=True), cm_w])
            acc['ece'] = acc['ece'] + jnp.concatenate(
                [ece_w.sum(axis=0, keepdims=True), ece_w])

            # ensemble disagreement AUROC over the whole set
            out = {'disagreement': None, 'errors': None}
            if 'segformer_seg' in outputs:
                m1 = outputs['segformer_seg'].astype(jnp.float32)
                m2 = outputs['deeplabv3plus_seg'].astype(jnp.float32)
                dis = disagreement_map([m1, m2], class_axis=-1)
                mean_probs = (jax.nn.softmax(m1, axis=-1) +
                              jax.nn.softmax(m2, axis=-1)) / 2.0
                ens_pred = jnp.argmax(mean_probs, axis=-1)
                errors = (ens_pred != lbl).astype(jnp.float32)
                valid = (lbl != 255) & sample_mask[:, None, None]
                acc['auroc_hist'] = acc['auroc_hist'] + auroc_histogram_update(
                    dis.reshape(-1), errors.reshape(-1), AUROC_BINS,
                    *AUROC_RANGE, weights=valid.reshape(-1),
                    log_scale=True)
                if self.auroc_mode == 'exact' and 'scores' in acc:
                    # append into the mesh-sharded device buffers; the
                    # chunk offset is a multiple of the (device-divisible)
                    # chunk size, so writes stay shard-local
                    flat_s = dis.reshape(-1)
                    flat_e = jnp.where(valid, errors, -1.0).reshape(-1)
                    acc['scores'] = jax.lax.dynamic_update_slice(
                        acc['scores'], flat_s, (acc['offset'],))
                    acc['errors'] = jax.lax.dynamic_update_slice(
                        acc['errors'], flat_e.astype(jnp.int8),
                        (acc['offset'],))
                    acc['offset'] = acc['offset'] + flat_s.shape[0]
                if self.collect_exact_auroc:
                    out['disagreement'] = dis
                    out['errors'] = jnp.where(valid, errors, -1.0)
            return acc, out

        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        # tiled mode: the batch is replicated and parallelism comes from the
        # tile axis inside forward(); the exact-AUROC buffers then shard on
        # their own (pixel) axis in either mode
        bsh = rep if tiled else data
        if self.auroc_mode == 'exact':
            acc_sharding = {'cm': rep, 'ece': rep, 'auroc_hist': rep,
                            'scores': data, 'errors': data, 'offset': rep}
        else:
            acc_sharding = rep
        return jax.jit(step,
                       in_shardings=(rep, bsh, bsh, bsh, bsh, bsh, rep,
                                     acc_sharding),
                       out_shardings=(acc_sharding, None),
                       donate_argnums=(7,))

    def _init_acc(self, capacity: int = 0):
        n = 1 + len(WEATHER_CONDITIONS)
        c = self.num_classes
        rep = replicated_sharding(self.mesh)
        acc = {
            'cm': jnp.zeros((n, c, c), jnp.float32),
            'ece': jnp.zeros((n, self.num_bins, 3), jnp.float32),
            'auroc_hist': jnp.zeros((AUROC_BINS, 2), jnp.float32),
        }
        acc = jax.device_put(acc, rep)
        if self.auroc_mode == 'exact':
            if capacity <= 0:
                raise ValueError('exact AUROC mode needs a sized loader '
                                 '(len()) to bound the score buffer')
            # round capacity up so the buffer divides over the mesh
            capacity += (-capacity) % self.n_devices
            data = batch_sharding(self.mesh)
            acc['scores'] = jax.device_put(
                jnp.zeros((capacity,), jnp.float32), data)
            acc['errors'] = jax.device_put(
                jnp.full((capacity,), -1, jnp.int8), data)
            acc['offset'] = jax.device_put(jnp.zeros((), jnp.int32), rep)
        return acc

    def _pad_batch(self, batch):
        b = batch['image'].shape[0]
        pad = (-b) % self.n_devices
        mask = np.ones((b + pad,), dtype=bool)
        if pad:
            mask[b:] = False

            def _pad_arr(x):
                widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x, widths, mode='edge')

            batch = {k: (_pad_arr(v) if isinstance(v, np.ndarray) else v)
                     for k, v in batch.items()}
        return batch, mask

    def run(self, test_loader, seed: int = 42) -> Dict[str, Any]:
        """Full evaluation sweep. Returns the reference's results schema."""
        rngs = RngStreams(seed)
        acc = None
        exact_scores, exact_errors = [], []
        n_images = 0
        t0 = time.time()

        for i, batch in enumerate(test_loader):
            n_images += batch['image'].shape[0]
            h, w = batch['image'].shape[1:3]
            tiled = self._use_tiling(h, w)
            if not tiled:
                batch, mask = self._pad_batch(batch)
            else:  # batch replicated; every row is real
                mask = np.ones((batch['image'].shape[0],), dtype=bool)
            if self._step is None and self.auroc_mode == 'exact':
                # memory guard BEFORE the step is built (downgrading changes
                # the compiled program): the score buffer is f32 + int8 =
                # 5 bytes/pixel sharded over the mesh; at 2048×1024
                # Cityscapes-val scale a single chip would hold ~5 GB —
                # degrade loudly to the histogram estimator (≤~1e-4 of
                # exact) instead of OOMing mid-sweep.
                try:
                    n_batches = len(test_loader)
                except TypeError:
                    raise ValueError(
                        "auroc_mode='exact' needs a sized loader; use "
                        "'exact_host' or 'histogram' for unsized streams")
                bb = batch['image'].shape[0]
                budget = int((self.config.get('evaluation') or {}).get(
                    'exact_auroc_max_bytes', 4 << 30))
                per_device = n_batches * bb * h * w * 5 // self.n_devices
                if per_device > budget:
                    logger.warning(
                        "auroc_mode='exact' would need %.1f GB/device for "
                        "the score buffer (budget %.1f GB, "
                        "evaluation.exact_auroc_max_bytes); falling back to "
                        "the 2^20-bin histogram estimator",
                        per_device / 2**30, budget / 2**30)
                    self.auroc_mode = 'histogram'
            if self._step is None:
                self._step = self._build_step(tiled, image_hw=(h, w))
            if acc is None:
                capacity = 0
                if self.auroc_mode == 'exact':
                    n_batches = len(test_loader)
                    b, h, w = batch['image'].shape[:3]
                    capacity = n_batches * b * h * w
                acc = self._init_acc(capacity)
            step_key = rngs.fold('weather', i)
            acc, out = self._step(self.variables, batch['image'],
                                  batch['label'], batch['weather_id'],
                                  batch['sample_id'], mask, step_key, acc)
            if self.collect_exact_auroc and out['disagreement'] is not None:
                exact_scores.append(np.asarray(out['disagreement']).reshape(-1))
                exact_errors.append(np.asarray(out['errors']).reshape(-1))

        if acc is None:
            acc = self._init_acc(self.n_devices if
                                 self.auroc_mode == 'exact' else 0)

        # exact mode: one distributed sort over the mesh-sharded buffers;
        # only the scalar comes to host
        exact_device_auroc = None
        if self.auroc_mode == 'exact':
            scores_buf = acc.pop('scores')
            errors_buf = acc.pop('errors')
            acc.pop('offset')
            from ..metrics.disagreement import auroc_exact_sharded
            valid = (errors_buf >= 0).astype(jnp.float32)
            exact_device_auroc = float(auroc_exact_sharded(
                scores_buf, errors_buf.astype(jnp.float32) * valid,
                valid, self.mesh))

        acc = jax.device_get(acc)
        elapsed = time.time() - t0

        results: Dict[str, Any] = {}
        cms = acc['cm']
        results['overall_miou'] = float(
            iou_from_confusion(jnp.asarray(cms[0]))['mean_iou'])
        weather_mious: Dict[str, float] = {}
        for wid, weather in enumerate(WEATHER_CONDITIONS):
            if cms[1 + wid].sum() > 0:
                miou = float(iou_from_confusion(jnp.asarray(cms[1 + wid]))['mean_iou'])
                weather_mious[weather] = miou
                results[f'miou_{weather}'] = miou

        results['expected_calibration_error'] = float(
            ece_from_bins(jnp.asarray(acc['ece'][0])))
        for wid, weather in enumerate(WEATHER_CONDITIONS):
            if acc['ece'][1 + wid][:, 0].sum() > 0:
                results[f'ece_{weather}'] = float(
                    ece_from_bins(jnp.asarray(acc['ece'][1 + wid])))

        if acc['auroc_hist'].sum() > 0:
            hist_auroc = float(
                auroc_from_histogram(jnp.asarray(acc['auroc_hist'])))
            if exact_device_auroc is not None:
                results['ensemble_disagreement_auroc'] = exact_device_auroc
                results['_auroc_histogram_estimate'] = hist_auroc
            elif self.collect_exact_auroc and exact_scores:
                s = np.concatenate(exact_scores)
                e = np.concatenate(exact_errors)
                keep = e >= 0
                results['ensemble_disagreement_auroc'] = float(
                    auroc_exact(jnp.asarray(s[keep]), jnp.asarray(e[keep])))
                results['_auroc_histogram_estimate'] = hist_auroc
            else:
                results['ensemble_disagreement_auroc'] = hist_auroc

        # degradation ratios (scripts/evaluate.py:257-271)
        if 'clean' in weather_mious:
            clean_miou = weather_mious['clean']
            rm = RobustnessMetrics(self.num_classes)
            degradations = []
            for weather in ['fog', 'rain', 'snow', 'night']:
                if weather in weather_mious:
                    d = rm.compute_robustness_degradation_ratio(
                        clean_miou, weather_mious[weather])
                    results[f'robustness_degradation_{weather}'] = d
                    degradations.append(d)
            if degradations:
                results['robustness_degradation_ratio'] = float(
                    np.mean(degradations))

        results['_throughput_images_per_sec'] = n_images / max(elapsed, 1e-9)
        results['_eval_seconds'] = elapsed
        results['_num_images'] = n_images
        logger.info("Model evaluation completed")
        return results


def generate_evaluation_report(results: Dict[str, Any], output_dir: Path,
                               target_metrics: Optional[Dict[str, float]] = None
                               ) -> None:
    """Write evaluation_results.json + evaluation_report.md with the
    reference's hard-coded targets table (scripts/evaluate.py:277-392).
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    with open(output_dir / 'evaluation_results.json', 'w') as f:
        json.dump({k: v for k, v in results.items()}, f, indent=2,
                  default=float)

    if target_metrics is None:
        target_metrics = {
            'miou_clean': 0.78,
            'miou_fog': 0.65,
            'miou_rain': 0.62,
            'robustness_degradation_ratio': 0.18,
            'expected_calibration_error': 0.05,
            'ensemble_disagreement_auroc': 0.85,
        }

    lines = [
        "# Adverse Weather Semantic Segmentation Evaluation Report",
        "",
        "## Summary Metrics",
        "",
        "| Metric | Target | Actual | Status |",
        "|--------|--------|--------|--------|",
    ]
    for metric, target in target_metrics.items():
        actual = results.get(metric, 0.0)
        status = "✓" if actual >= target else "✗"
        lines.append(f"| {metric} | {target:.3f} | {actual:.3f} | {status} |")

    lines += ["", "## Weather-Specific Performance", ""]
    for weather in WEATHER_CONDITIONS:
        key = f'miou_{weather}'
        if key in results:
            lines.append(f"- **{weather.title()}**: mIoU = {results[key]:.3f}")

    lines += ["", "## Robustness Analysis", ""]
    if 'robustness_degradation_ratio' in results:
        lines.append(f"- **Overall Degradation Ratio**: "
                     f"{results['robustness_degradation_ratio']:.3f}")
    for weather in ['fog', 'rain', 'snow', 'night']:
        key = f'robustness_degradation_{weather}'
        if key in results:
            lines.append(f"- **{weather.title()} Degradation**: "
                         f"{results[key]:.3f}")

    if 'expected_calibration_error' in results:
        lines += ["", "## Confidence Calibration", "",
                  f"- **Expected Calibration Error**: "
                  f"{results['expected_calibration_error']:.3f}"]

    if 'ensemble_disagreement_auroc' in results:
        lines += ["", "## Ensemble Performance", "",
                  f"- **Disagreement AUROC**: "
                  f"{results['ensemble_disagreement_auroc']:.3f}"]

    with open(output_dir / 'evaluation_report.md', 'w') as f:
        f.write('\n'.join(lines))
    logger.info(f"Evaluation report saved to {output_dir}")
