"""Dataset + device-feeding loaders.

Replaces the reference's torch DataLoader worker pool
(reference: src/optimized_dataset.py:264-286) with a TPU-native input
pipeline: host threads decode/augment (RAM cache optional, like the
reference's ``cache_images``), batches are assembled as NHWC numpy and
pushed to device asynchronously with double buffering so the accelerator
never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .augment import heavy_augment, optimized_augment
from .pipeline import decode_triptych, list_image_paths, seeded_split


class GlareRemovalDataset:
    """SD1 triptych dataset with optional in-memory cache and deterministic
    per-index augmentation (reference: src/optimized_dataset.py:14-144)."""

    def __init__(self, image_paths: list[str], *, image_size: int = 512,
                 seed: int | None = None, augment: str = "none",
                 cache_images: bool = False, num_workers: int = 8,
                 normalize: bool = False):
        """``normalize=True`` maps the input image to mean-0.5/std-0.5
        ([-1, 1]) like the reference's full (non-optimized) transform stack
        (reference: src/dataset.py:114). Targets stay in [0, 1] — the
        reference's albumentations Normalize never touched the mask."""
        self.image_paths = sorted(image_paths)
        self.image_size = image_size
        self.seed = seed
        self.augment = augment
        self.normalize = normalize
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        if cache_images:
            # num_workers=0 (synchronous loading) still warms the cache
            with ThreadPoolExecutor(max_workers=max(num_workers, 1)) as pool:
                for i, pair in enumerate(
                    pool.map(lambda p: decode_triptych(p, image_size), self.image_paths)
                ):
                    self._cache[i] = pair

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, index: int) -> tuple[np.ndarray, np.ndarray]:
        """Returns (glared, ground_truth) as (H, W, 1) float32 NHWC slices."""
        if index in self._cache:
            glared, gt = self._cache[index]
        else:
            glared, gt = decode_triptych(self.image_paths[index], self.image_size)
        if self.augment != "none":
            rng = np.random.default_rng(
                self.seed + index if self.seed is not None else None
            )
            fn = optimized_augment if self.augment == "optimized" else heavy_augment
            glared, gt = fn(glared, gt, rng)
        if self.normalize:
            glared = (glared - 0.5) / 0.5
        return glared[..., None], gt[..., None]


def sliced_batch_count(num_samples: int, batch_size: int, world: int,
                       drop_last: bool) -> int:
    """Number of batches a ``world``-way sliced iteration yields.

    THE single source of truth for the multi-host skip rule: a batch with
    fewer rows than ``world`` is skipped entirely (each host's share would
    be empty), and a ragged tail only survives if it still has >= ``world``
    rows. Both ``_Loader.__len__`` and
    ``parallel.distributed.LocalSliceLoader.__len__`` must delegate here —
    a drifted copy produces a len>0/iterate-empty loader that crashes
    ``train_model``'s conditional init peek."""
    nb_full, tail = divmod(num_samples, batch_size)
    count = nb_full if batch_size >= world else 0
    if not drop_last and tail >= world:
        count += 1
    return count


class _Loader:
    """Epoch iterator yielding fixed-shape NHWC numpy batches."""

    def __init__(self, dataset: GlareRemovalDataset, batch_size: int, *,
                 shuffle: bool, drop_last: bool, seed: int | None,
                 num_workers: int = 8):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self._epoch = 0
        self._batch_slice: tuple[int, int] | None = None
        self._skip_batches = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self._batch_slice is not None:
            # mirror _iter_batches exactly (see sliced_batch_count)
            _, world = self._batch_slice
            count = sliced_batch_count(n, self.batch_size, world,
                                       self.drop_last)
        else:
            nb_full, tail = divmod(n, self.batch_size)
            count = nb_full if self.drop_last else nb_full + (1 if tail else 0)
        return max(0, count - self._skip_batches)

    @property
    def num_samples(self) -> int:
        return len(self.dataset)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def set_skip_batches(self, k: int) -> None:
        """Skip the first ``k`` batches of the next iterations WITHOUT
        decoding them — mid-epoch preemption resume's fast-forward. The
        index order is per-epoch seeded and augmentation seeds are
        per-INDEX, so dropping the leading batch windows from the plan
        yields exactly what iterate-and-discard would, minus the decode
        and host->device work (minutes on a large epoch through a slow
        link). Persists until reset with ``set_skip_batches(0)``.

        Contract for third-party loaders implementing this hook (the train
        loop duck-types on the method name, ``train/loop.py``):

        * ``__len__`` returns the REDUCED count — full epoch plan minus
          ``k`` — so progress bars and step accounting see what will
          actually be yielded;
        * ``__iter__`` walks the FULL per-epoch plan (same seeded order as
          with no skip) and drops the first ``k`` yields — it must NOT
          derive its iteration bound from the reduced ``__len__``, or the
          skip applies twice and one batch per epoch is silently lost.

        The train loop cross-checks steps-trained against ``len(loader)``
        after every completed epoch and fails loudly on a mismatch, so a
        loader that violates this contract cannot silently drop data."""
        if k < 0:
            raise ValueError(f"skip_batches must be >= 0, got {k}")
        self._skip_batches = k

    def set_batch_slice(self, rank: int, world: int) -> None:
        """Decode only rows ``[rank*per, (rank+1)*per)`` of every batch —
        the multi-host pre-decode fast path used by
        ``parallel.distributed.LocalSliceLoader``. Yields samples identical
        to slicing the decoded global batch: the index order is already
        seeded and augmentation seeds are per-INDEX, so skipping the other
        hosts' rows changes nothing but the decode work (1/world of it per
        host instead of all of it). A ragged final batch truncates to a
        multiple of ``world`` first, matching the post-decode slicer."""
        if not (0 <= rank < world):
            raise ValueError(f"rank {rank} outside world {world}")
        self._batch_slice = (rank, world)

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(
                None if self.seed is None else self.seed + self._epoch
            )
            rng.shuffle(order)
        limit = (n // self.batch_size) * self.batch_size if self.drop_last else n
        order = order[:limit]

        # num_workers=0: decode synchronously in-process (reference
        # DataLoader semantics, reference: optimized_train.py num_workers)
        if self.num_workers > 0:
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                yield from self._iter_batches(order, pool.map)
        else:
            yield from self._iter_batches(order, map)

    def _iter_batches(self, order, mapper):
        skip = self._skip_batches
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self._batch_slice is not None:
                rank, world = self._batch_slice
                per = len(idx) // world
                if per == 0:
                    continue
                idx = idx[rank * per : (rank + 1) * per]
            if skip > 0:  # counted in YIELDED batches (after slice skips)
                skip -= 1
                continue
            samples = list(mapper(self.dataset.__getitem__, idx))
            x = np.stack([s[0] for s in samples])
            y = np.stack([s[1] for s in samples])
            yield x, y


class DevicePrefetcher:
    """Wraps a loader: decodes/augments ahead on a background thread and
    transfers batches to device (sharded if given a Sharding) so step N+1's
    data is already in HBM while step N computes.

    ``input_dtype``: optional numpy/ml_dtypes dtype to cast the INPUT
    (first element of each batch) to before transfer. Casting to bfloat16
    on host halves host->device bytes with zero semantic change when the
    model's first op is a cast to the same dtype; targets stay f32 so loss
    math is untouched."""

    _clamp_noted = False  # class-level: the train loop builds one of these
    # per epoch per loader — a per-instance note would repeat every epoch

    def __init__(self, loader, *, sharding=None, prefetch: int = 2,
                 input_dtype=None):
        self.loader = loader
        self.sharding = sharding
        # clamp: queue.Queue(maxsize<=0) is UNBOUNDED — a user passing
        # --prefetch_factor 0 ("disable prefetch") would have the worker
        # eagerly ship the whole epoch to HBM
        if prefetch < 1 and not DevicePrefetcher._clamp_noted:
            DevicePrefetcher._clamp_noted = True
            print(f"DevicePrefetcher: prefetch={prefetch} clamped to 1 "
                  "(prefetching cannot be fully disabled; depth 1 is the "
                  "minimum pipeline)")
        self.prefetch = max(1, prefetch)
        self.input_dtype = input_dtype

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import jax

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        error: list[BaseException] = []

        def worker():
            try:
                for batch in self.loader:
                    if self.input_dtype is not None and isinstance(batch, tuple):
                        batch = (np.asarray(batch[0]).astype(self.input_dtype),
                                 *batch[1:])
                    if self.sharding is not None:
                        # multi-host aware: assembles the global array from
                        # this process's slice when jax.process_count() > 1
                        from ..parallel.mesh import put_global_batch

                        batch = put_global_batch(batch, self.sharding)
                    else:
                        batch = jax.device_put(batch)
                    # bounded put with a stop check: if the consumer
                    # abandons iteration (train-step exception, break,
                    # generator GC) a plain q.put would block forever,
                    # leaking the thread AND the device-resident batches
                    # already in the queue
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surface in the consumer, don't
                error.append(e)        # silently truncate the epoch
            finally:
                # the sentinel put needs the same stop-checked bound as the
                # batch puts: with prefetch=1 an abandoning consumer can
                # drain once and refill the queue before this line runs, and
                # a plain q.put would then block this thread forever
                while True:
                    try:
                        q.put(sentinel, timeout=0.2)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()
            # drain so a blocked final put can't outlive us, then join
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)
        if error:
            raise error[0]


def make_dataloaders(data_dir: str, *, batch_size: int = 32, val_split: float = 0.2,
                     seed: int | None = 42, image_size: int = 512,
                     cache_images: bool = False, num_workers: int = 8,
                     augment: str = "optimized"):
    """Train/val loaders with the reference's split semantics
    (reference: src/optimized_dataset.py:177-288)."""
    paths = list_image_paths(data_dir)
    if not paths:
        raise ValueError(f"No images found in {data_dir}")
    train_paths, val_paths = seeded_split(paths, val_split, seed)

    train_ds = GlareRemovalDataset(
        train_paths, image_size=image_size, seed=seed, augment=augment,
        cache_images=cache_images, num_workers=num_workers,
    )
    val_ds = GlareRemovalDataset(
        val_paths, image_size=image_size, seed=seed, augment="none",
        cache_images=cache_images, num_workers=num_workers,
    )
    if len(train_ds) < batch_size:
        # drop_last would yield ZERO training batches: every epoch would run
        # 0 steps and the init-weight model would be saved as "best" with no
        # error — fail here, where the cause is visible
        raise ValueError(
            f"train split has {len(train_ds)} images but batch_size is "
            f"{batch_size}; drop_last training would run zero steps per "
            "epoch. Lower --batch_size or provide more data.")
    train_loader = _Loader(train_ds, batch_size, shuffle=True, drop_last=True,
                           seed=seed, num_workers=num_workers)
    # num_workers=0 means SYNCHRONOUS decode (reference DataLoader
    # semantics) — that contract must hold for both loaders, so only a
    # threaded train loader gets a (smaller) threaded val loader
    val_loader = _Loader(val_ds, batch_size, shuffle=False, drop_last=False,
                         seed=seed,
                         num_workers=max(2, num_workers // 2)
                         if num_workers > 0 else 0)
    return train_loader, val_loader


def make_eval_loader(data_dir: str, *, batch_size: int = 16,
                     image_size: int = 512, seed: int | None = 42,
                     num_workers: int = 8, cache_images: bool = False):
    """Evaluation-only loader over EVERY image under ``data_dir`` (no
    split, no shuffle, no augmentation, ragged final batch kept).

    This replaces the old ``make_dataloaders(val_split=1.0)`` idiom, which
    the zero-train-batch guard now (correctly) rejects."""
    paths = list_image_paths(data_dir)
    if not paths:
        raise ValueError(f"No images found in {data_dir}")
    ds = GlareRemovalDataset(paths, image_size=image_size, seed=seed,
                             augment="none", cache_images=cache_images,
                             num_workers=num_workers)
    return _Loader(ds, batch_size, shuffle=False, drop_last=False, seed=seed,
                   num_workers=num_workers)
