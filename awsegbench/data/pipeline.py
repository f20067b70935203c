"""Host-side batching iterator + device-side batch preparation.

Replaces torch ``DataLoader``/``create_dataloader`` (loader.py:390-420) with
a lightweight threaded prefetch iterator producing stacked numpy batches,
and a jittable ``prepare_batch`` that performs — ON DEVICE — everything the
reference did per-sample on CPU (loader.py:256-293): weather corruption,
depth estimation, train-time augmentation (hflip, brightness/contrast) and
ImageNet normalization.

DataLoader contract preserved: ``drop_last = True`` iff shuffling
(loader.py:418).

Reference quirk preserved: the depth target is estimated from the corrupted
image BEFORE the horizontal flip, so depth is not flipped with the image —
exactly like loader.py:270-278 where albumentations transforms only
image+mask.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..weather.corruption import corrupt_batch
from ..weather.depth import estimate_depth_batch

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _stack(items, num_threads: int) -> np.ndarray:
    """Batch-stack via the native threaded packer when available (memcpy
    released from the GIL, one thread per stripe); np.stack fallback."""
    if num_threads > 1 and len(items) > 1:
        from .. import native as _native
        if _native.available():
            out = _native.pack_batch(items, n_threads=min(num_threads,
                                                          len(items)))
            if out is not None:
                return out
    return np.stack(items)


class BatchIterator:
    """Shuffled, threaded-prefetch batch iterator over a map-style dataset.

    Yields dicts of stacked numpy arrays:
    ``{image: uint8 [B,H,W,3], label: int32 [B,H,W], weather_id: int32 [B],
       sample_id: int32 [B]}`` plus the per-sample weather names.
    """

    def __init__(self, dataset, batch_size: int = 8, shuffle: bool = True,
                 seed: int = 0, drop_last: Optional[bool] = None,
                 prefetch: int = 2, num_threads: int = 4,
                 process_index: int = 0, process_count: int = 1) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = shuffle if drop_last is None else drop_last
        self.prefetch = prefetch
        self.num_threads = max(1, num_threads)
        # Multi-host data input sharding (SURVEY §2.2): every process
        # builds the same global shuffle (shared seed), then loads only its
        # contiguous row-slice of each global batch — the slice that
        # jax.make_array_from_process_local_data expects for a batch
        # sharded over a process-major device order. batch_size stays the
        # GLOBAL batch size.
        self.process_index = process_index
        self.process_count = max(1, process_count)
        if self.process_count > 1:
            if batch_size % self.process_count:
                raise ValueError(
                    f'global batch_size {batch_size} must divide over '
                    f'{self.process_count} processes')
            if not self.drop_last and len(dataset) % batch_size:
                raise ValueError(
                    'process-sharded loading requires drop_last=True or a '
                    'dataset length divisible by the global batch size '
                    '(uneven final batches cannot shard across hosts)')
        self._epoch = 0
        self._pool = None  # lazy decode ThreadPoolExecutor

    def _decode_pool(self):
        if self._pool is None and self.num_threads > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                max_workers=self.num_threads,
                thread_name_prefix='awseg-decode')
        return self._pool

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> list[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        batches = []
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            if self.process_count > 1:
                local = len(idx) // self.process_count
                idx = idx[self.process_index * local:
                          (self.process_index + 1) * local]
            batches.append(idx)
        return batches

    def _collate(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        ds = self.dataset
        pool = self._decode_pool()
        if (pool is not None and hasattr(ds, 'load_arrays')
                and hasattr(ds, 'finish_item')):
            # Parallel decode (RNG-free, releases the GIL in cv2/native
            # decode), then the RNG tail sequentially in index order — the
            # sample stream is bit-identical to the single-threaded path.
            # Replaces the reference's DataLoader(num_workers=4) worker
            # processes (loader.py:394, :412-420).
            decoded = list(pool.map(ds.load_arrays, (int(i) for i in idx)))
            items = [ds.finish_item(int(i), im, lb)
                     for i, (im, lb) in zip(idx, decoded)]
        else:
            items = [ds[int(i)] for i in idx]
        return {
            'image': _stack([it['image'] for it in items], self.num_threads),
            'label': _stack([np.asarray(it['label'], np.int32)
                             for it in items], self.num_threads),
            'weather_id': np.asarray([it['weather_id'] for it in items], np.int32),
            'weather_condition': [it['weather_condition'] for it in items],
            'sample_id': idx.astype(np.int32),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batch_indices()
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for idx in batches:
                    q.put(self._collate(idx))
                q.put(stop)
            except BaseException as e:  # propagate instead of deadlocking
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def prefetch_to_device(batch_iter, place_fn, lookahead: int = 1):
    """Overlap host→device transfer with compute: yield device batches while
    the NEXT batch's ``jax.device_put`` is already in flight (device_put is
    async). ``place_fn(host_batch) -> device_batch``.
    """
    pending = []
    for batch in batch_iter:
        pending.append(place_fn(batch))
        if len(pending) > lookahead:
            yield pending.pop(0)
    yield from pending


def create_dataloader(dataset, batch_size: int = 8, shuffle: bool = True,
                      num_workers: int = 4, pin_memory: bool = True,
                      **kwargs) -> BatchIterator:
    """Reference-compatible loader factory (loader.py:390-420).

    ``pin_memory`` is accepted for drop-in compatibility and ignored — JAX
    manages host→device transfer; ``drop_last`` defaults to ``shuffle``.
    Under multi-process JAX (multi-host training) the loader automatically
    shards each global batch per process unless ``process_count`` is
    passed explicitly.
    """
    if 'process_count' not in kwargs:
        import jax as _jax
        try:
            if _jax.process_count() > 1:
                kwargs['process_index'] = _jax.process_index()
                kwargs['process_count'] = _jax.process_count()
        except Exception:
            pass
    return BatchIterator(dataset, batch_size=batch_size, shuffle=shuffle,
                         num_threads=num_workers,
                         drop_last=kwargs.pop('drop_last', None),
                         **kwargs)


def normalize_imagenet(images_u8: jax.Array) -> jax.Array:
    """albumentations Normalize(ImageNet) : (x/255 − mean)/std, NHWC float32."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (images_u8.astype(jnp.float32) / 255.0 - mean) / std


def _train_augment(images_u8: jax.Array, labels: jax.Array,
                   key: jax.Array) -> tuple[jax.Array, jax.Array]:
    """HorizontalFlip(p=.5) + RandomBrightnessContrast(.2, .2, p=.3)
    matching the albumentations train pipeline (loader.py:185-193),
    vectorized per-sample on device.
    """
    b = images_u8.shape[0]
    k_flip, k_do_bc, k_alpha, k_beta = jax.random.split(key, 4)

    do_flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    flipped_img = images_u8[:, :, ::-1, :]
    flipped_lbl = labels[:, :, ::-1]
    images_u8 = jnp.where(do_flip[:, None, None, None], flipped_img, images_u8)
    labels = jnp.where(do_flip[:, None, None], flipped_lbl, labels)

    do_bc = jax.random.bernoulli(k_do_bc, 0.3, (b,))
    alpha = 1.0 + jax.random.uniform(k_alpha, (b,), minval=-0.2, maxval=0.2)
    beta = jax.random.uniform(k_beta, (b,), minval=-0.2, maxval=0.2)
    adjusted = images_u8.astype(jnp.float32) * alpha[:, None, None, None] + \
        (beta * 255.0)[:, None, None, None]
    adjusted = jnp.clip(jnp.round(adjusted), 0, 255).astype(jnp.uint8)
    images_u8 = jnp.where(do_bc[:, None, None, None], adjusted, images_u8)
    return images_u8, labels


def prepare_batch(images_u8: jax.Array, labels: jax.Array,
                  weather_ids: jax.Array, keys: jax.Array,
                  aug_key: Optional[jax.Array] = None,
                  train: bool = False,
                  include_depth: bool = True,
                  apply_augmentation: bool = True) -> Dict[str, jax.Array]:
    """Jittable device-side analog of the reference __getitem__ tail
    (loader.py:256-293): corrupt → estimate depth → augment → normalize.

    Args:
        images_u8: [B, H, W, 3] uint8 clean images.
        labels: [B, H, W] int labels.
        weather_ids: [B] int32 per WEATHER_IDS.
        keys: [B] per-sample PRNG keys for the corruption.
        aug_key: PRNG key for train-time augmentation.
    Returns dict {image: float32 NHWC normalized, label, depth?, weather_id}.
    """
    corrupted = corrupt_batch(images_u8, weather_ids, keys)

    depth = None
    if include_depth:
        depth = estimate_depth_batch(corrupted)   # pre-flip, like the reference

    if train and apply_augmentation and aug_key is not None:
        corrupted, labels = _train_augment(corrupted, labels, aug_key)

    out = {
        'image': normalize_imagenet(corrupted),
        'label': labels,
        'weather_id': weather_ids,
    }
    if depth is not None:
        out['depth'] = depth
    return out
