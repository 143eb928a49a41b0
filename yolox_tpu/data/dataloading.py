"""Data loading — re-design of `/root/reference/yolox/data/dataloading.py`
plus the DataPrefetcher (`yolox/data/data_prefetcher.py`), torch-free.

`DataLoader` runs batch assembly in forked worker processes (batch-level
parallelism: each worker builds a whole batch — mosaic, affine, letterbox —
and ships the stacked numpy arrays back; prefetch depth = num_workers).
Per-sample seeds come from the batch sampler, so results are deterministic
for a given seed regardless of worker count — an improvement over the
reference's per-worker uuid reseeding (`dataloading.py:107-111`).

`DevicePrefetcher` is the host->device double-buffering analog of the
reference's CUDA-stream DataPrefetcher: it keeps one batch in flight with
`jax.device_put` (async) while the previous one is being consumed.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from typing import Iterator

import numpy as np


def get_yolox_datadir() -> str:
    """Dataset root: $YOLOX_DATADIR, else ./datasets (`dataloading.py:16-27`)."""
    yolox_datadir = os.getenv("YOLOX_DATADIR", None)
    if yolox_datadir is None:
        yolox_datadir = os.path.join(os.getcwd(), "datasets")
    return yolox_datadir


_WORKER_DATASET = None


def _worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    # cv2 must not spawn threads inside data workers (`setup_env.py:59-75`)
    try:
        import cv2

        cv2.setNumThreads(0)
    except Exception:
        pass


def _build_batch(args):
    dataset, batch = args if args[0] is not None else (_WORKER_DATASET,
                                                       args[1])
    items = [dataset[b] for b in batch]
    return _collate(items)


def _collate(items):
    """Stack (img, labels, info, id) tuples into batch arrays."""
    imgs = np.stack([np.asarray(it[0]) for it in items])
    targets = np.stack([np.asarray(it[1]) for it in items])
    infos = [it[2] for it in items]
    ids = [it[3] for it in items]
    return imgs, targets, infos, ids


class DataLoader:
    """Iterates (imgs, targets, infos, ids) batches.

    num_workers == 0: synchronous in-process assembly.
    num_workers  > 0: a fork-based pool maps over batches with ordered
    results and `num_workers` batches of prefetch.
    """

    def __init__(self, dataset, batch_sampler, num_workers: int = 0,
                 deterministic: bool = False):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = num_workers
        self.deterministic = deterministic
        self._pool = None

    def _get_pool(self):
        if self._pool is None:
            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_worker_init,
                initargs=(self.dataset,))
        return self._pool

    def __iter__(self) -> Iterator:
        if self.num_workers <= 0:
            for batch in self.batch_sampler:
                yield _build_batch((self.dataset, batch))
            return

        # Bounded prefetch with ordered results. NOT pool.imap: imap has
        # no backpressure — it submits the whole sampler and buffers every
        # finished batch in the result queue, so whenever the consumer is
        # momentarily slower than the workers (e.g. the first eval batch
        # compiling for minutes) host RSS grows by an epoch of decoded
        # batches (measured: 24 GB at 5 000 images x batch 64 before the
        # reference-scale eval run caught it; scripts/eval_at_scale.py).
        from collections import deque

        pool = self._get_pool()
        depth = self.num_workers + 2
        pending = deque()
        for batch in self.batch_sampler:
            pending.append(
                pool.apply_async(_build_batch, ((None, batch),)))
            if len(pending) >= depth:
                yield pending.popleft().get()
        while pending:
            yield pending.popleft().get()

    def __len__(self):
        return len(self.batch_sampler)

    def close_mosaic(self):
        """Turn off mosaic for subsequent batches (`dataloading.py:84-88`).

        Worker processes are restarted so the dataset's enable_mosaic state
        can't leak from forked copies.
        """
        self.batch_sampler.mosaic = False
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class DevicePrefetcher:
    """Double-buffered host->device transfer (DataPrefetcher analog).

    jax.device_put is asynchronous: issuing the next batch's transfer while
    the current one is consumed overlaps H2D with compute, like the
    reference's side CUDA stream (`data_prefetcher.py:6-49`).
    """

    def __init__(self, loader, sharding=None):
        self.loader = iter(loader)
        self.sharding = sharding
        self._next = None
        self._preload()

    def _put(self, arr):
        import jax

        if self.sharding is not None:
            from yolox_tpu.parallel.mesh import put_process_local

            # under multi-process the loader batch is this host's shard
            # of the global batch (sampler rank striding)
            return put_process_local(arr, self.sharding)
        return jax.device_put(arr)

    def _preload(self):
        try:
            imgs, targets, infos, ids = next(self.loader)
        except StopIteration:
            self._next = None
            return
        self._next = (self._put(imgs), self._put(targets), infos, ids)

    def next(self):
        batch = self._next
        if batch is None:
            return None
        self._preload()
        return batch

    def __iter__(self):
        while True:
            batch = self.next()
            if batch is None:
                return
            yield batch
