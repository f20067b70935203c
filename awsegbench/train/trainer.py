"""Training pipeline — jitted steps over a device mesh.

TPU-native re-design of the reference ``AdverseWeatherTrainer``
(trainer.py:91-673). Key architectural shifts (SURVEY.md §7):

* the whole per-step pipeline — weather corruption, depth estimation,
  augmentation, normalization, both ensemble members' forwards, the
  fog-density-aware loss, backward, global-norm clip, optimizer update —
  is ONE jitted XLA program; batches shard over the ``data`` mesh axis and
  XLA inserts the gradient all-reduce automatically;
* validation accumulates per-weather confusion matrices on device
  ([6, C, C]: overall + 5 weathers) instead of `.cpu()` list appends
  (trainer.py:447-455); one host transfer per epoch;
* bf16 compute / fp32 master params by default (reference is fp32-only).

Contract preserved: optimizer/scheduler/loss factories, per-epoch scheduler
stepping, early stopping on val loss with best-weight restore, checkpoint
latest/best/periodic, the random per-batch fog-density keyed on weather
(trainer.py:480-511), MLflow/TensorBoard logging (both optional), and the
reference's quirk of reading ``epochs``/``batch_size``/``grad_clip``/
``num_classes`` from the top level of the config dict (with a fallback to
the nested ``training`` section, which the reference silently ignores).
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..core.mesh import (batch_sharding, create_mesh, has_model_axis,
                         opt_state_shardings, replicated_sharding,
                         tp_param_shardings)
from ..core.precision import get_policy
from ..core.prng import RngStreams, dropout_key, per_sample_keys
from ..data.pipeline import prepare_batch
from ..losses.fog_density import FogDensityAwareLoss, cross_entropy_loss
from ..metrics.iou import (confusion_matrix_per_weather,
                           iou_from_confusion)
from ..metrics.robustness import RobustnessMetrics
from ..utils.profiling import ThroughputMeter, trace
from ..weather.corruption import WEATHER_CONDITIONS
from .checkpoints import CheckpointManager
from .optim import create_optimizer, create_scheduler, set_learning_rate

logger = logging.getLogger(__name__)

try:
    from tensorboardX import SummaryWriter
    _TB_AVAILABLE = True
except ImportError:  # pragma: no cover
    _TB_AVAILABLE = False
    SummaryWriter = None

try:  # MLflow optional, like trainer.py:17-24
    import mlflow
    MLFLOW_AVAILABLE = True
except ImportError:
    MLFLOW_AVAILABLE = False
    mlflow = None

try:  # tqdm in-epoch progress, like trainer.py:295,399
    from tqdm import tqdm as _tqdm
except ImportError:  # pragma: no cover
    _tqdm = None


class TrainState(train_state.TrainState):
    batch_stats: Any = None


class EarlyStopping:
    """Early stopping on validation loss (reference trainer.py:33-88)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.001,
                 restore_best_weights: bool = True) -> None:
        self.patience = patience
        self.min_delta = min_delta
        self.restore_best_weights = restore_best_weights
        self.best_loss = float('inf')
        self.counter = 0
        self.best_weights: Optional[Dict[str, Any]] = None
        self.early_stop = False

    def __call__(self, val_loss: float, state: TrainState
                 ) -> tuple[bool, TrainState]:
        """Returns (should_stop, possibly-restored state)."""
        if val_loss < self.best_loss - self.min_delta:
            self.best_loss = val_loss
            self.counter = 0
            if self.restore_best_weights:
                self.best_weights = {
                    'params': jax.tree_util.tree_map(np.asarray, state.params),
                    'batch_stats': jax.tree_util.tree_map(np.asarray,
                                                          state.batch_stats),
                }
        else:
            self.counter += 1

        if self.counter >= self.patience:
            self.early_stop = True
            if self.restore_best_weights and self.best_weights:
                state = state.replace(
                    params=_shard_like(self.best_weights['params'],
                                       state.params),
                    batch_stats=_shard_like(self.best_weights['batch_stats'],
                                            state.batch_stats))
        return self.early_stop, state


def _shard_like(snapshot: Any, live: Any) -> Any:
    """Place a host-numpy snapshot back on device with the live state's
    shardings. Snapshots are taken as numpy (host RAM, cheap); restoring
    them bare would hand the jitted train step unsharded arrays — on a
    model-axis mesh that silently drops the tp_param_shardings layout that
    load_checkpoint re-applies. Copying each live leaf's sharding keeps
    restore correct on any mesh (DP-replicated or TP-sharded)."""
    return jax.tree_util.tree_map(
        lambda s, l: jax.device_put(s, l.sharding)
        if hasattr(l, 'sharding') else s,
        snapshot, live)


def fog_density_from_weather(weather_ids: jax.Array, key: jax.Array,
                             height: int, width: int) -> jax.Array:
    """Random per-pixel fog density keyed on weather label
    (trainer.py:480-511): fog→U[.5,1], rain/snow→U[.2,.5], else→U[0,.1].
    """
    b = weather_ids.shape[0]
    u = jax.random.uniform(key, (b, height, width), dtype=jnp.float32)
    wid = weather_ids[:, None, None]
    fog = u * 0.5 + 0.5
    mid = u * 0.3 + 0.2
    low = u * 0.1
    return jnp.where(wid == 1, fog, jnp.where((wid == 2) | (wid == 3), mid, low))


class AdverseWeatherTrainer:
    """Trainer with the reference's public surface: ``train()``,
    ``train_epoch()``, ``validate_epoch()``, ``save_checkpoint()``,
    ``load_checkpoint()``, ``resume_training()``.
    """

    def __init__(self, model, train_loader, val_loader,
                 config: Dict[str, Any], device: Optional[str] = None,
                 checkpoint_dir: str = 'checkpoints',
                 log_dir: str = 'logs',
                 mesh=None, seed: Optional[int] = None) -> None:
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.config = config

        def _cfg(key, default):
            # top-level first (reference quirk), then nested training section
            if key in config:
                return config[key]
            return (config.get('training') or {}).get(key, default)

        self.epochs = _cfg('epochs', 100)
        self.grad_clip = _cfg('grad_clip', 1.0)
        self.num_classes = config.get('num_classes',
                                      (config.get('model') or {}).get('num_classes', 19))
        self.include_depth = (config.get('model') or {}).get('include_depth', True)
        self.apply_augmentation = (config.get('data') or {}).get('apply_augmentation', True)

        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)

        # --- TPU runtime ---------------------------------------------------
        tpu_cfg = config.get('tpu') or {}
        self.mesh = mesh if mesh is not None else create_mesh(
            mesh_shape=tpu_cfg.get('mesh_shape', 'auto'))
        self.n_devices = self.mesh.devices.size
        self._pad_warned = False
        self.policy = get_policy(tpu_cfg.get('precision', 'bf16'))
        self.rngs = RngStreams(seed if seed is not None else config.get('seed', 42))

        # --- optimizer / scheduler / loss ----------------------------------
        opt_cfg = config.get('optimizer') or {}
        self.tx = create_optimizer(opt_cfg, grad_clip=self.grad_clip)
        self.base_lr = opt_cfg.get('learning_rate', 0.001)
        self.scheduler = create_scheduler(config.get('scheduler') or {},
                                          self.base_lr, self.epochs)
        self.loss_fn = self._setup_loss_function()

        # --- metrics / logging ---------------------------------------------
        self.metrics = RobustnessMetrics(num_classes=self.num_classes)
        self.writer = (SummaryWriter(log_dir=str(self.log_dir))
                       if _TB_AVAILABLE else None)
        self.ckpt = CheckpointManager(str(self.checkpoint_dir))

        # --- training state -------------------------------------------------
        self.current_epoch = 0
        self.global_step = 0
        self.best_val_loss = float('inf')
        self.best_val_miou = 0.0

        es_cfg = config.get('early_stopping') or {}
        self.early_stopping = EarlyStopping(
            patience=es_cfg.get('patience', 10),
            min_delta=es_cfg.get('min_delta', 0.001),
            restore_best_weights=es_cfg.get('restore_best_weights', True))

        self.state = self._init_state()
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._setup_mlflow()
        logger.info(f"Initialized AdverseWeatherTrainer with "
                    f"{type(model).__name__} on {self.n_devices} device(s)")

    # ------------------------------------------------------------------ setup

    def _setup_loss_function(self):
        loss_cfg = self.config.get('loss') or {}
        loss_type = loss_cfg.get('type', 'fog_density_aware')
        if loss_type == 'fog_density_aware':
            return FogDensityAwareLoss(
                base_loss=loss_cfg.get('base_loss', 'cross_entropy'),
                depth_weight=loss_cfg.get('depth_weight', 0.5),
                fog_sensitivity=loss_cfg.get('fog_sensitivity', 2.0),
                depth_loss_weight=loss_cfg.get('depth_loss_weight', 0.1))
        return cross_entropy_loss

    def _setup_mlflow(self) -> None:
        if not MLFLOW_AVAILABLE:
            logger.warning("MLflow not available. Skipping MLflow setup.")
            return
        try:
            mlflow_cfg = self.config.get('mlflow') or {}
            if mlflow_cfg.get('enabled', True):
                mlflow.set_experiment(mlflow_cfg.get(
                    'experiment_name', 'adverse_weather_segmentation'))
                mlflow.start_run(run_name=mlflow_cfg.get('run_name'))
                opt_cfg = self.config.get('optimizer') or {}
                mlflow.log_params({
                    'model_type': type(self.model).__name__,
                    'optimizer': opt_cfg.get('type', 'adamw'),
                    'learning_rate': opt_cfg.get('learning_rate', 0.001),
                    'batch_size': self.config.get('batch_size', 8),
                    'epochs': self.epochs,
                    'num_classes': self.num_classes,
                })
                logger.info("MLflow tracking initialized")
        except Exception as e:  # pragma: no cover
            logger.warning(f"Failed to setup MLflow: {e}")

    def _peek_batch_shape(self):
        ds = getattr(self.train_loader, 'dataset', None)
        if ds is not None and hasattr(ds, 'image_size'):
            return tuple(ds.image_size)
        if ds is not None:
            try:  # peek one sample without consuming the loader; snapshot
                # the dataset RNG so the peek doesn't perturb epoch-0
                # sampling (weather choice + synthetic draws)
                rng = getattr(ds, '_rng', None)
                rng_state = rng.bit_generator.state if rng is not None else None
                try:
                    return ds[0]['image'].shape[:2]
                finally:
                    if rng_state is not None:
                        rng.bit_generator.state = rng_state
            except Exception:
                pass
        # Last resort: consume one batch, then rewind the iterator's epoch
        # counter so epoch-0's shuffle order is not silently skipped.
        epoch_before = getattr(self.train_loader, '_epoch', None)
        batch = next(iter(self.train_loader))
        if epoch_before is not None:
            self.train_loader._epoch = epoch_before
        return batch['image'].shape[1:3]

    def _init_state(self) -> TrainState:
        from ..models.factory import init_model_variables
        h, w = self._peek_batch_shape()
        variables = init_model_variables(self.model, self.config,
                                         self.rngs.key('params'),
                                         (1, h, w, 3))
        rep = replicated_sharding(self.mesh)
        if not has_model_axis(self.mesh):
            state = TrainState.create(
                apply_fn=self.model.apply,
                params=variables['params'],
                batch_stats=variables.get('batch_stats', {}),
                tx=self.tx)
            return jax.device_put(state, rep)

        # 2-D (data × model) mesh: tensor-parallel param sharding. Kernels
        # shard their output-feature axis over MODEL_AXIS (core/mesh.py);
        # optimizer state inherits the layout through jit propagation
        # (zeros_like keeps its argument's sharding), so Adam moments shard
        # with their parameters.
        tp_min = (self.config.get('tpu') or {}).get('tp_min_features', 64)
        ps = tp_param_shardings(variables['params'], self.mesh,
                                min_features=tp_min)
        params = jax.device_put(variables['params'], ps)
        opt_host = self.tx.init(variables['params'])
        opt_state = jax.device_put(
            opt_host, opt_state_shardings(opt_host, variables['params'],
                                          ps, self.mesh))
        return TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), rep),
            apply_fn=self.model.apply,
            params=params,
            tx=self.tx,
            opt_state=opt_state,
            batch_stats=jax.device_put(
                variables.get('batch_stats', {}), rep))

    # ------------------------------------------------------------- jit builds

    def _forward(self, params, batch_stats, images, train: bool,
                 dropout_key=None):
        p = self.policy.cast_to_compute(params)
        bs = self.policy.cast_to_compute(batch_stats)
        variables = {'params': p, 'batch_stats': bs}
        x = images.astype(self.policy.compute_dtype)
        if train:
            out, mutated = self.model.apply(
                variables, x, train=True, rngs={'dropout': dropout_key},
                mutable=['batch_stats'])
            new_bs = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), mutated['batch_stats'])
            return out, new_bs
        out = self.model.apply(variables, x, train=False)
        return out, batch_stats

    def _compute_loss(self, outputs, targets, fog_density, sample_mask):
        outputs = {k: v.astype(jnp.float32) for k, v in outputs.items()}
        if isinstance(self.loss_fn, FogDensityAwareLoss):
            return self.loss_fn(outputs, targets, fog_density,
                                sample_mask=sample_mask)
        return self.loss_fn(outputs, targets)

    def _build_train_step(self):
        use_fog = isinstance(self.loss_fn, FogDensityAwareLoss)
        drng = (self.config.get('tpu') or {}).get('dropout_rng', 'rbg')

        def step(state: TrainState, images, labels, weather_ids, sample_ids,
                 sample_mask, step_key, metric_sums):
            k_weather, k_aug, k_dropout, k_fog = jax.random.split(step_key, 4)
            k_dropout = dropout_key(k_dropout, drng)
            keys = per_sample_keys(k_weather, sample_ids)
            prep = prepare_batch(images, labels, weather_ids, keys,
                                 aug_key=k_aug, train=True,
                                 include_depth=self.include_depth,
                                 apply_augmentation=self.apply_augmentation)
            targets = {'label': prep['label']}
            if self.include_depth:
                targets['depth'] = prep['depth']
            fog_density = None
            if use_fog:
                h, w = images.shape[1], images.shape[2]
                fog_density = fog_density_from_weather(weather_ids, k_fog, h, w)

            def loss_fn(params):
                outputs, new_bs = self._forward(params, state.batch_stats,
                                                prep['image'], True, k_dropout)
                loss_dict = self._compute_loss(outputs, targets, fog_density,
                                               sample_mask)
                return loss_dict['total_loss'], (new_bs, loss_dict)

            grads, (new_bs, loss_dict) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads=grads, batch_stats=new_bs)
            # epoch sums ride on device: (loss, seg, depth) × batch size + n
            bsz = jnp.sum(sample_mask.astype(jnp.float32))
            metric_sums = metric_sums + jnp.stack([
                loss_dict['total_loss'] * bsz,
                loss_dict['segmentation_loss'] * bsz,
                loss_dict['depth_loss'] * bsz,
                bsz,
            ])
            metrics = {
                'loss': loss_dict['total_loss'],
                'seg_loss': loss_dict['segmentation_loss'],
                'depth_loss': loss_dict['depth_loss'],
            }
            return new_state, metrics, metric_sums

        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        # TP meshes: the state's sharding is heterogeneous (kernels on the
        # model axis) — leave it unspecified so jit infers it from the
        # committed arrays and preserves it through the update
        st = None if has_model_axis(self.mesh) else rep
        return jax.jit(step,
                       in_shardings=(st, data, data, data, data, data, rep,
                                     rep),
                       out_shardings=(st, rep, rep),
                       donate_argnums=(0, 7))

    def _build_eval_step(self):
        use_fog = isinstance(self.loss_fn, FogDensityAwareLoss)
        n_weathers = len(WEATHER_CONDITIONS)

        def step(state: TrainState, images, labels, weather_ids, sample_ids,
                 sample_mask, step_key, cm_acc):
            k_weather, k_fog = jax.random.split(step_key, 2)
            keys = per_sample_keys(k_weather, sample_ids)
            prep = prepare_batch(images, labels, weather_ids, keys,
                                 train=False,
                                 include_depth=self.include_depth)
            targets = {'label': prep['label']}
            if self.include_depth:
                targets['depth'] = prep['depth']
            fog_density = None
            if use_fog:
                h, w = images.shape[1], images.shape[2]
                fog_density = fog_density_from_weather(weather_ids, k_fog, h, w)

            outputs, _ = self._forward(state.params, state.batch_stats,
                                       prep['image'], False)
            loss_dict = self._compute_loss(outputs, targets, fog_density,
                                           sample_mask)
            preds = jnp.argmax(outputs['segmentation'], axis=-1)

            # [1 + n_weathers, C, C] confusion via one joint one-hot matmul
            cm_w = confusion_matrix_per_weather(
                preds, prep['label'], self.num_classes, weather_ids,
                n_weathers, sample_mask=sample_mask)
            updates = jnp.concatenate([cm_w.sum(axis=0, keepdims=True), cm_w])
            bsz = jnp.sum(sample_mask.astype(jnp.float32))
            acc = {
                'cm': cm_acc['cm'] + updates,
                'sums': cm_acc['sums'] + jnp.stack([
                    loss_dict['total_loss'] * bsz,
                    loss_dict['segmentation_loss'] * bsz,
                    loss_dict['depth_loss'] * bsz,
                    bsz,
                ]),
            }
            return acc

        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        st = None if has_model_axis(self.mesh) else rep
        return jax.jit(step,
                       in_shardings=(st, data, data, data, data, data, rep, rep),
                       out_shardings=rep,
                       donate_argnums=(7,))

    # ------------------------------------------------------------- host utils

    def _pad_batch(self, batch, mult: Optional[int] = None):
        """Pad the batch to a multiple of ``mult`` (default: mesh size);
        return mask.

        Padded rows are edge-duplicated real samples: the loss masks them
        out (losses/fog_density.py sample_mask) but BatchNorm batch_stats
        updates still see them — a duplicate-sample bias of at most
        (mesh_size−1)/batch, negligible at production batch sizes. A
        mask-aware BN would be needed if mesh size ever approaches the
        per-step batch.
        """
        b = batch['image'].shape[0]
        mult = self.n_devices if mult is None else mult
        pad = (-b) % mult
        mask = np.ones((b + pad,), dtype=bool)
        if pad:
            if pad * 4 >= b + pad and not self._pad_warned:
                self._pad_warned = True
                logger.warning(
                    "batch %d padded to %d for the %d-device mesh: %d%% of "
                    "BatchNorm's batch statistics are duplicate rows (the "
                    "loss masks them; BN cannot). Use a batch size that is "
                    "a multiple of the mesh size to avoid the bias.",
                    b, b + pad, mult, round(100 * pad / (b + pad)))
            mask[b:] = False

            def _pad_arr(x):
                widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x, widths, mode='edge')

            batch = {k: (_pad_arr(v) if isinstance(v, np.ndarray) else v)
                     for k, v in batch.items()}
        return batch, mask

    def _device_batches(self, loader):
        """Pad + asynchronously place batches on the mesh one step ahead so
        host→device transfer overlaps compute (pipeline.prefetch_to_device).
        Yields (device_args_tuple, original_batch_size).

        Multi-process (multi-host) runs: each process's loader yields only
        its row-slice of the global batch (pipeline.BatchIterator
        process sharding); ``jax.make_array_from_process_local_data``
        assembles the global sharded array — no host ever materializes the
        full batch (SURVEY §2.2 'data input sharded per-host').
        """
        from ..data.pipeline import prefetch_to_device
        data = batch_sharding(self.mesh)
        n_proc = jax.process_count()

        def place(batch):
            bsz = batch['image'].shape[0]
            if n_proc > 1:
                # pad the LOCAL slice to a multiple of the local device
                # count (global batch then divides the full mesh); padded
                # rows are masked out of the loss/metrics as usual
                batch, mask = self._pad_batch(
                    batch, mult=jax.local_device_count())

                def put(x):
                    return jax.make_array_from_process_local_data(data, x)
                bsz = bsz * n_proc  # loaders slice the global batch evenly
            else:
                batch, mask = self._pad_batch(batch)
                put = lambda x: jax.device_put(x, data)  # noqa: E731
            args = tuple(put(np.asarray(batch[k]))
                         for k in ('image', 'label', 'weather_id',
                                   'sample_id')) + (put(mask),)
            return args, bsz

        yield from prefetch_to_device(loader, place, lookahead=1)

    def _progress(self, iterable, desc: str, total=None):
        """tqdm-style in-epoch progress (reference trainer.py:295,399).

        Enabled by ``logging.progress_bar`` (default: only on a tty, so
        logs/CI stay clean). Postfix values are updated only when metrics
        are fetched anyway (the tb_interval cadence) — per-step fetches
        would stall the dispatch pipeline.
        """
        enabled = (self.config.get('logging') or {}).get(
            'progress_bar', sys.stderr.isatty())
        if not enabled or _tqdm is None:
            return iterable, None
        bar = _tqdm(iterable, desc=desc, total=total, unit='batch',
                    leave=False)
        return bar, bar

    # ------------------------------------------------------------ public API

    def train_epoch(self) -> Dict[str, float]:
        """One training epoch (reference trainer.py:280-375).

        Loss sums ride on device in the jitted step's carry (one fetch per
        epoch); per-step TensorBoard scalars are fetched only every
        ``tb_interval`` steps (reference logs every 10, trainer.py:362-366)
        so dispatch stays pipelined.
        """
        lr = (self.scheduler.current_lr if self.scheduler else self.base_lr)
        meter = ThroughputMeter()
        meter.start()

        metric_sums = jax.device_put(jnp.zeros((4,), jnp.float32),
                                     replicated_sharding(self.mesh))
        tb_interval = (self.config.get('logging') or {}).get(
            'tb_interval_steps', 10)

        try:
            total = len(self.train_loader)
        except TypeError:
            total = None
        batches, bar = self._progress(
            self._device_batches(self.train_loader),
            f'Epoch {self.current_epoch + 1}/{self.epochs}', total)
        for args, bsz in batches:
            step_key = self.rngs.fold('weather', self.global_step)
            self.state, metrics, metric_sums = self._train_step(
                self.state, *args, step_key, metric_sums)

            if self.global_step % tb_interval == 0 and (self.writer or bar):
                m = jax.device_get(metrics)
                if self.writer:
                    self.writer.add_scalar('Train/Loss', float(m['loss']),
                                           self.global_step)
                    self.writer.add_scalar('Train/SegLoss',
                                           float(m['seg_loss']),
                                           self.global_step)
                    self.writer.add_scalar('Train/LR', lr, self.global_step)
                if bar:
                    bar.set_postfix(loss=f"{float(m['loss']):.4f}",
                                    lr=f'{lr:.2e}')

            meter.update(bsz)
            self.global_step += 1
        if bar:
            bar.close()

        sums = np.asarray(metric_sums)  # single host fetch = sync barrier
        meter.stop()
        n_samples = float(sums[3])
        out = {
            'train_loss': float(sums[0]) / max(n_samples, 1),
            'train_seg_loss': float(sums[1]) / max(n_samples, 1),
            'train_depth_loss': float(sums[2]) / max(n_samples, 1),
            'train_samples': int(n_samples),
            'train_images_per_sec': meter.images_per_sec,
        }
        if self.writer:
            self.writer.add_scalar('Train/ImagesPerSec',
                                   meter.images_per_sec, self.current_epoch)
        return out

    def validate_epoch(self) -> Dict[str, float]:
        """One validation epoch (reference trainer.py:377-478) with
        on-device confusion + loss accumulation (one host fetch)."""
        c = self.num_classes
        acc = {
            'cm': jnp.zeros((1 + len(WEATHER_CONDITIONS), c, c), jnp.float32),
            'sums': jnp.zeros((4,), jnp.float32),
        }
        acc = jax.device_put(acc, replicated_sharding(self.mesh))

        step_offset = 1_000_000_000 + self.current_epoch * 1_000_000
        try:
            total = len(self.val_loader)
        except TypeError:
            total = None
        batches, bar = self._progress(
            self._device_batches(self.val_loader), 'Validation', total)
        for i, (args, _bsz) in enumerate(batches):
            step_key = self.rngs.fold('weather', step_offset + i)
            acc = self._eval_step(self.state, *args, step_key, acc)
        if bar:
            bar.close()

        acc = jax.device_get(acc)  # single host fetch = sync barrier
        sums = np.asarray(acc['sums'])
        n_samples = float(sums[3])
        out = {
            'val_loss': float(sums[0]) / max(n_samples, 1),
            'val_seg_loss': float(sums[1]) / max(n_samples, 1),
            'val_depth_loss': float(sums[2]) / max(n_samples, 1),
            'val_samples': int(n_samples),
        }

        cms = acc['cm']
        out['val_miou'] = float(iou_from_confusion(jnp.asarray(cms[0]))['mean_iou'])
        for wid, weather in enumerate(WEATHER_CONDITIONS):
            if cms[1 + wid].sum() > 0:
                out[f'val_miou_{weather}'] = float(
                    iou_from_confusion(jnp.asarray(cms[1 + wid]))['mean_iou'])
        return out

    def train(self) -> Dict[str, Any]:
        """Main training loop (reference trainer.py:513-604).

        Optional observability (SURVEY.md §5 rebuild requirements): set
        ``logging.profile_dir`` to capture a jax.profiler trace of the first
        epoch; set ``debug.nan_checks`` to enable jax NaN debugging.
        """
        if (self.config.get('debug') or {}).get('nan_checks'):
            from ..utils.profiling import enable_nan_checks
            enable_nan_checks(True)
        profile_dir = (self.config.get('logging') or {}).get('profile_dir')

        history = {'train': [], 'val': []}
        logger.info(f"Starting training for {self.epochs} epochs")

        for epoch in range(self.epochs):
            self.current_epoch = epoch
            start_time = time.time()

            if profile_dir and epoch == 0:
                with trace(profile_dir):
                    train_metrics = self.train_epoch()
            else:
                train_metrics = self.train_epoch()
            history['train'].append(train_metrics)

            val_metrics = self.validate_epoch()
            history['val'].append(val_metrics)

            # scheduler steps per epoch; plateau consumes val loss
            if self.scheduler is not None:
                new_lr = self.scheduler.step(val_metrics['val_loss'])
                self.state = self.state.replace(
                    opt_state=set_learning_rate(self.state.opt_state, new_lr))

            epoch_time = time.time() - start_time
            logger.info(
                f"Epoch {epoch + 1}/{self.epochs} - "
                f"Train Loss: {train_metrics['train_loss']:.4f}, "
                f"Val Loss: {val_metrics['val_loss']:.4f}, "
                f"Val mIoU: {val_metrics['val_miou']:.4f}, "
                f"Time: {epoch_time:.1f}s")

            if self.writer:
                self.writer.add_scalar('Epoch/TrainLoss',
                                       train_metrics['train_loss'], epoch)
                self.writer.add_scalar('Epoch/ValLoss',
                                       val_metrics['val_loss'], epoch)
                self.writer.add_scalar('Epoch/ValMIoU',
                                       val_metrics['val_miou'], epoch)

            if MLFLOW_AVAILABLE:
                try:
                    mlflow.log_metrics({
                        'train_loss': train_metrics['train_loss'],
                        'val_loss': val_metrics['val_loss'],
                        'val_miou': val_metrics['val_miou'],
                    }, step=epoch)
                except Exception as e:  # pragma: no cover
                    logger.warning(f"Failed to log to MLflow: {e}")

            is_best = val_metrics['val_miou'] > self.best_val_miou
            if is_best:
                self.best_val_miou = val_metrics['val_miou']
                self.best_val_loss = val_metrics['val_loss']

            self.save_checkpoint(epoch=epoch, metrics=val_metrics,
                                 is_best=is_best)

            should_stop, self.state = self.early_stopping(
                val_metrics['val_loss'], self.state)
            if should_stop:
                logger.info(f"Early stopping triggered at epoch {epoch + 1}")
                break

        if self.writer:
            self.writer.close()
        if MLFLOW_AVAILABLE:
            try:
                mlflow.end_run()
            except Exception:
                pass

        logger.info("Training completed")
        return {
            'history': history,
            'best_val_miou': self.best_val_miou,
            'best_val_loss': self.best_val_loss,
            'total_epochs': self.current_epoch + 1,
        }

    # ---------------------------------------------------------- checkpoints

    def _model_tree(self) -> Dict[str, Any]:
        return {
            'epoch': np.asarray(self.current_epoch),
            'step': np.asarray(self.state.step),
            'params': self.state.params,
            'batch_stats': self.state.batch_stats,
        }

    def _opt_tree(self) -> Dict[str, Any]:
        return {'opt_state': self.state.opt_state}

    def save_checkpoint(self, epoch: int, metrics: Dict[str, float],
                        is_best: bool = False) -> None:
        sched_state = self.scheduler.state_dict() if self.scheduler else None
        self.ckpt.save(epoch, self._model_tree(), self._opt_tree(),
                       {**metrics, 'scheduler': sched_state},
                       self.config, is_best=is_best)

    def load_checkpoint(self, checkpoint_path: str) -> None:
        model_tree, opt_tree, meta = self.ckpt.restore(
            checkpoint_path, self._model_tree(), self._opt_tree())
        self.state = self.state.replace(
            params=model_tree['params'],
            batch_stats=model_tree['batch_stats'],
            step=int(model_tree['step']))
        if opt_tree is not None:
            self.state = self.state.replace(opt_state=opt_tree['opt_state'])
        if has_model_axis(self.mesh):
            tp_min = (self.config.get('tpu') or {}).get('tp_min_features', 64)
            ps = tp_param_shardings(self.state.params, self.mesh,
                                    min_features=tp_min)
            params = jax.device_put(self.state.params, ps)
            opt_sh = opt_state_shardings(self.state.opt_state,
                                         self.state.params, ps, self.mesh)
            rep = replicated_sharding(self.mesh)
            self.state = self.state.replace(
                params=params,
                opt_state=jax.device_put(self.state.opt_state, opt_sh),
                batch_stats=jax.device_put(self.state.batch_stats, rep))
        else:
            self.state = jax.device_put(self.state,
                                        replicated_sharding(self.mesh))
        self.current_epoch = int(model_tree['epoch'])
        if self.scheduler and meta.get('metrics', {}).get('scheduler'):
            self.scheduler.load_state_dict(meta['metrics']['scheduler'])
        logger.info(f"Loaded checkpoint from epoch {self.current_epoch + 1}")

    def resume_training(self, checkpoint_path: str) -> Dict[str, Any]:
        self.load_checkpoint(checkpoint_path)
        return self.train()
