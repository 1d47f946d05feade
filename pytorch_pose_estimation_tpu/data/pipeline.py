"""Host-side batch loader: the TPU framework's replacement for the
reference's 32-process torch DataLoader pool
(reference: dataset/sbp_coco_dataset.py:259-277).

Design: samples are light on this side of the boundary (the heavy
augmentation/target work runs inside the jitted device step), so a thread
pool + one background prefetch thread keeps the accelerator fed without
process-pool serialization costs.  cv2/libjpeg release the GIL, so threads
parallelize the actual decode work.

Determinism contract (replaces torch's DistributedSampler):
* ``shuffle`` permutes with a PRNG seeded by (seed, epoch) -- same epoch,
  same order, any process count;
* multi-host sharding is an interleaved index slice
  ``indices[process_index::process_count]`` so shards are disjoint and
  cover the dataset.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence

import numpy as np


def collate(samples: Sequence[dict]) -> dict:
    """Stack a list of per-sample dicts into one batch dict of arrays
    (the torch default-collate behavior the reference's target dicts rely
    on, SURVEY.md section 3.5)."""
    out = {}
    for key in samples[0]:
        out[key] = np.stack([np.asarray(s[key]) for s in samples], axis=0)
    return out


def pad_batch(batch: dict, size: int) -> dict:
    """Zero-pad every batch array up to ``size`` rows and attach a
    ``pad_mask`` (1 = real row).  Keeps eval shapes static for XLA."""
    n = len(next(iter(batch.values())))
    out = {}
    for key, value in batch.items():
        value = np.asarray(value)
        if n < size:
            pad = np.zeros((size - n,) + value.shape[1:], value.dtype)
            value = np.concatenate([value, pad], axis=0)
        out[key] = value
    mask = np.zeros((size,), np.int32)
    mask[:n] = 1
    out["pad_mask"] = mask
    return out


class HostLoader:
    """Iterable batch loader over a record list.

    sample_fn(record, index, epoch) -> dict of arrays builds one sample;
    alternatively ``batch_fn(records, indices, epoch) -> batch dict``
    builds a whole batch at once (the native C++ loader path uses this to
    amortize one FFI call over the batch).
    """

    def __init__(self, db: Sequence, sample_fn: Optional[Callable],
                 batch_size: int, shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, workers: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 batch_fn: Optional[Callable] = None,
                 prefetch: int = 2):
        assert sample_fn is not None or batch_fn is not None
        self.db = db
        self.sample_fn = sample_fn
        self.batch_fn = batch_fn
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = int(seed or 0)
        self.drop_last = drop_last
        self.workers = max(int(workers), 0)
        self.process_index = int(process_index)
        self.process_count = max(int(process_count), 1)
        self.prefetch = max(int(prefetch), 1)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    # ------------------------------------------------------------------
    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.db))
        if self.shuffle:
            rng = np.random.RandomState(
                (self.seed * 1000003 + self.epoch) % (2 ** 32))
            idx = rng.permutation(idx)
        if self.process_count > 1 and len(idx):
            # DistributedSampler semantics: pad with wraparound so every
            # process gets the SAME number of samples (and therefore runs
            # the same number of steps -- unequal shard lengths would
            # desynchronize the SPMD collectives in the jitted train step)
            target = -(-len(idx) // self.process_count) * self.process_count
            if target > len(idx):
                idx = np.concatenate([idx, idx[:target - len(idx)]])
        return idx[self.process_index::self.process_count]

    def _batches(self) -> List[np.ndarray]:
        idx = self._indices()
        out = []
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            out.append(chunk)
        return out

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    # ------------------------------------------------------------------
    def _build(self, chunk: np.ndarray, epoch: int, pool) -> dict:
        records = [self.db[i] for i in chunk]
        if self.batch_fn is not None:
            return self.batch_fn(records, chunk, epoch)
        if pool is not None:
            samples = list(pool.map(
                lambda args: self.sample_fn(*args),
                [(r, int(i), epoch) for r, i in zip(records, chunk)]))
        else:
            samples = [self.sample_fn(r, int(i), epoch)
                       for r, i in zip(records, chunk)]
        return collate(samples)

    def __iter__(self):
        batches = self._batches()
        epoch = self.epoch
        if not batches:
            return iter(())

        pool = ThreadPoolExecutor(self.workers) if self.workers > 1 and \
            self.batch_fn is None else None
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        abandoned = threading.Event()

        def _put(item) -> bool:
            # bounded-blocking put so an abandoned consumer (early break /
            # GC'd generator) never leaves the producer stuck on a full
            # queue
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for chunk in batches:
                    if abandoned.is_set():
                        return
                    if not _put(self._build(chunk, epoch, pool)):
                        return
            except BaseException as exc:  # surfaced in the consumer
                _put(exc)
            finally:
                _put(_SENTINEL)

        thread = threading.Thread(target=producer, daemon=True)

        def gen():
            # start the producer lazily on first next(): if the returned
            # iterator is never consumed, no thread (or stuck put-loop) is
            # ever created to leak
            thread.start()
            try:
                while True:
                    item = q.get()
                    if item is _SENTINEL:
                        break
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                abandoned.set()
                thread.join()
                if pool is not None:
                    pool.shutdown(wait=False)

        return gen()
