"""Torch-free data loading: threaded batch loader + device prefetcher.

Replaces torch DataLoader / the reference's prefetchers
(``basicsr/data/prefetch_dataloader.py:40-125``) with a thread-pool loader
(cv2/numpy release the GIL in the hot paths) and a double-buffering device
prefetcher (`jax.device_put` of batch N+1 overlapping compute on batch N —
the ``CUDAPrefetcher`` analog without streams: JAX's async dispatch provides
the overlap).
"""

from __future__ import annotations

import itertools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterable

import numpy as np


def _process_worker(dataset, index_q, result_q, worker_id, num_workers, rank, seed):
    """Worker-process loop.  Seeded with the reference's rule
    ``worker_seed = num_workers * rank + worker_id + seed``
    (reference: data/__init__.py:121-125)."""
    import random as _random

    try:
        import cv2

        cv2.setNumThreads(0)
    except Exception:  # noqa: BLE001
        pass
    worker_seed = num_workers * rank + worker_id + (seed or 0)
    np.random.seed(worker_seed)
    _random.seed(worker_seed)
    while True:
        job = index_q.get()
        if job is None:
            return
        seq, chunk = job
        result_q.put((seq, [dataset[i] for i in chunk]))


def default_collate(samples: list[dict]) -> dict[str, Any]:
    """Stack ndarray fields into (B, …) batches; everything else into lists."""
    batch: dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            batch[key] = np.stack(vals, axis=0)
        elif isinstance(first, (int, float, np.integer, np.floating)):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = vals
    return batch


class DataLoader:
    """Minimal map-style dataset loader.

    Args mirror the subset of torch.utils.data.DataLoader the reference uses:
    batch_size, shuffle, sampler (index iterable), drop_last, num_workers
    (0 = synchronous).  ``worker_mode`` selects the concurrency substrate:

    * ``"thread"`` (default) — a thread pool; cv2/numpy release the GIL in
      the decode/degrade hot paths, and it shares memory with the consumer.
    * ``"process"`` — forked worker processes like the reference's torch
      DataLoader (data/__init__.py:50-118): GIL-free for Python-heavy
      synthesis (stroke drawing, kernel sampling) at DCPT pre-train scale.
      Each worker is seeded with the reference's rule
      ``num_workers * rank + worker_id + seed`` and batches are re-ordered
      to the deterministic index order.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        sampler: Iterable[int] | None = None,
        drop_last: bool = False,
        num_workers: int = 0,
        collate_fn=default_collate,
        seed: int | None = None,
        prefetch_batches: int = 2,
        worker_mode: str = "thread",
        rank: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sampler = sampler
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.collate_fn = collate_fn
        self.seed = seed
        self.prefetch_batches = max(1, prefetch_batches)
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be 'thread' or 'process', got {worker_mode!r}")
        self.worker_mode = worker_mode
        self.rank = rank
        self._epoch = itertools.count()

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        if self.sampler is not None:
            indices = list(self.sampler)
        elif self.shuffle:
            rng = np.random.default_rng(None if self.seed is None else self.seed + next(self._epoch))
            indices = rng.permutation(len(self.dataset)).tolist()
        else:
            indices = list(range(len(self.dataset)))
        for i in range(0, len(indices), self.batch_size):
            chunk = indices[i : i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            yield chunk

    def _iter_processes(self):
        import multiprocessing as mp

        ctx = mp.get_context("fork")
        jobs = list(enumerate(self._index_batches()))
        # Static round-robin batch→worker assignment (torch semantics): batch i
        # is ALWAYS fetched by worker i % num_workers, so each worker's seeded
        # RNG stream sees a deterministic sample sequence — augmentations are
        # reproducible run-to-run, which a dynamic shared queue cannot give.
        index_qs = [ctx.Queue() for _ in range(self.num_workers)]
        # bounded results = backpressure: workers block once the consumer lags
        result_q = ctx.Queue(maxsize=self.prefetch_batches + self.num_workers)
        procs = [
            ctx.Process(
                target=_process_worker,
                args=(self.dataset, index_qs[w], result_q, w, self.num_workers, self.rank, self.seed),
                daemon=True,
            )
            for w in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        for seq, chunk in jobs:
            index_qs[seq % self.num_workers].put((seq, chunk))
        for q in index_qs:
            q.put(None)
        try:
            buffered: dict[int, list] = {}
            for want in range(len(jobs)):
                while want not in buffered:
                    seq, samples = result_q.get()
                    buffered[seq] = samples
                yield self.collate_fn(buffered.pop(want))
            for p in procs:
                p.join(timeout=10)
        finally:
            for p in procs:
                if p.is_alive():
                    p.terminate()
                    p.join(timeout=5)

    def __iter__(self):
        if self.num_workers <= 0:
            for chunk in self._index_batches():
                yield self.collate_fn([self.dataset[i] for i in chunk])
            return
        if self.worker_mode == "process":
            yield from self._iter_processes()
            return

        executor = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            pending: queue.Queue = queue.Queue()
            batches = self._index_batches()

            def submit(chunk):
                futures = [executor.submit(self.dataset.__getitem__, i) for i in chunk]
                pending.put(futures)

            # prime the pipeline
            primed = list(itertools.islice(batches, self.prefetch_batches))
            for chunk in primed:
                submit(chunk)
            if not primed:
                return
            for chunk in batches:
                futures = pending.get()
                submit(chunk)
                yield self.collate_fn([f.result() for f in futures])
            while not pending.empty():
                futures = pending.get()
                yield self.collate_fn([f.result() for f in futures])
        finally:
            executor.shutdown(wait=False, cancel_futures=True)


class CPUPrefetcher:
    """Iterator wrapper with reset (reference: prefetch_dataloader.py:62-80)."""

    def __init__(self, loader):
        self.ori_loader = loader
        self.loader = iter(loader)

    def next(self):
        try:
            return next(self.loader)
        except StopIteration:
            return None

    def reset(self):
        self.loader = iter(self.ori_loader)


class DevicePrefetcher:
    """Double-buffering host→device prefetcher (the CUDAPrefetcher analog,
    reference: prefetch_dataloader.py:83-125).

    A background thread stages the next batch onto device (sharded when a
    ``sharding`` is given) while the current batch is being consumed; JAX's
    async dispatch overlaps the copy with compute.
    """

    def __init__(self, loader, device_keys=("lq", "gt"), sharding=None):
        import jax

        self.ori_loader = loader
        self.device_keys = device_keys
        self.sharding = sharding
        if sharding is not None and jax.process_count() > 1:
            # multi-host: each host's batch is its local shard of the global
            # array (EnlargedSampler already stride-shards indices per host)
            self._put = lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x))
        elif sharding is not None:
            self._put = lambda x: jax.device_put(x, sharding)
        else:
            self._put = jax.device_put
        self.reset()

    def _stage(self, batch):
        import jax

        if batch is None:
            return None

        def put(x):
            x = np.asarray(x)
            if self.sharding is not None and x.shape[0] % max(1, len(self.sharding.device_set)) != 0:
                return jax.device_put(x)  # indivisible batch: replicate-free plain put
            return self._put(x)

        staged = dict(batch)
        for k in self.device_keys:
            if k in staged:
                staged[k] = put(staged[k])
        if "dataset_idx" in staged:
            staged["dataset_idx"] = put(staged["dataset_idx"])
        return staged

    def _worker(self):
        for batch in self.ori_loader:
            self._queue.put(self._stage(batch))
        self._queue.put(None)

    def next(self):
        out = self._queue.get()
        if out is None:
            self._thread.join()
        return out

    def reset(self):
        self._queue: queue.Queue = queue.Queue(maxsize=2)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
