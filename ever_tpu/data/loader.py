"""Host-side data loader (torch-DataLoader replacement).

The reference relies on ``torch.utils.data.DataLoader`` (worker processes +
pin_memory).  For a JAX/TPU stack the loader's job is simpler: produce
*numpy* batches on the host; device transfer and sharding are handled by the
double-buffered prefetcher (``ever_tpu/core/prefetch.py``), which replaces
``pin_memory``/``non_blocking`` copies (SURVEY.md §7 step 4).

Items are fetched by a thread pool (datasets here are numpy/PIL-bound and
release the GIL in I/O + decode), collated by stacking, and yielded in order.
``worker_type='process'`` swaps in OS worker processes (the reference's
``torch.utils.data.DataLoader`` ``num_workers`` model,
``ever/interface/dataloader.py:44-52``) for datasets whose ``__getitem__``
is pure-Python CPU-bound and would serialize on the GIL — each worker
fork-inherits the dataset once and fetches whole batches by index.
"""

from __future__ import annotations

import itertools
import multiprocessing
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Any, Callable, Iterator, Optional

import numpy as np

__all__ = ['DataLoader', 'default_collate']


def default_collate(items):
    """Stack a list of samples into a batch, recursing over dict/tuple/list."""
    first = items[0]
    if isinstance(first, dict):
        return {k: default_collate([it[k] for it in items]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(default_collate(list(group)) for group in zip(*items))
    if isinstance(first, np.ndarray):
        return np.stack(items)
    if isinstance(first, (int, float, bool, np.generic)):
        return np.asarray(items)
    if first is None:
        return None
    # jax arrays / anything array-like
    return np.stack([np.asarray(it) for it in items])


# -- process-worker plumbing ---------------------------------------------------
# One (dataset, collate_fn) pair is installed per worker process at pool
# startup (fork start method: the initargs pickle once per worker, numpy
# payloads ride copy-on-write pages).  Batch fetches then ship only the
# index list over the pipe and the collated numpy batch back — the torch
# DataLoader worker model without the per-item Tensor IPC.
_worker_state: dict = {}


def _process_worker_init(dataset, collate_fn):
    _worker_state['dataset'] = dataset
    _worker_state['collate_fn'] = collate_fn


def _process_worker_fetch(indices):
    dataset = _worker_state['dataset']
    collate_fn = _worker_state['collate_fn']
    rb = getattr(dataset, 'read_batch', None)
    if rb is not None and collate_fn is default_collate:
        out = rb(indices)
        if out is not NotImplemented:
            return out
    return collate_fn([dataset[i] for i in indices])


class DataLoader:
    """Minimal ordered batch loader over an indexable dataset.

    Args mirror the reference surface (``ever/interface/dataloader.py:10-31``):
    ``dataset`` (supports ``len``/``[]``), ``sampler`` (iterable of indices;
    defaults to sequential), ``batch_size``, ``num_workers`` (0 = synchronous),
    ``collate_fn``, ``drop_last``, ``prefetch_factor`` (batches in flight).
    """

    def __init__(self,
                 dataset,
                 sampler=None,
                 batch_size: int = 1,
                 num_workers: int = 0,
                 collate_fn: Callable = default_collate,
                 drop_last: bool = False,
                 prefetch_factor: int = 2,
                 persistent_workers: bool = False,
                 pin_memory: bool = False,  # accepted for surface parity; no-op
                 shuffle: bool = False,
                 worker_type: str = 'thread',
                 ):
        from ever_tpu.data.distributed import RandomSampler, SequentialSampler
        if shuffle and sampler is not None:
            raise ValueError('shuffle=True is mutually exclusive with an '
                             'explicit sampler (torch DataLoader semantics)')
        self.dataset = dataset
        if sampler is not None:
            self.sampler = sampler
        elif shuffle:
            self.sampler = RandomSampler(dataset)
        else:
            self.sampler = SequentialSampler(dataset)
        self.batch_size = int(batch_size)
        self.num_workers = int(num_workers)
        self.collate_fn = collate_fn
        self.drop_last = bool(drop_last)
        self.prefetch_factor = max(int(prefetch_factor), 1)
        self.persistent_workers = persistent_workers
        self.pin_memory = pin_memory
        if worker_type not in ('thread', 'process'):
            raise ValueError(f"worker_type must be 'thread' or 'process', "
                             f'got {worker_type!r}')
        self.worker_type = worker_type
        self._pool = None

    # -- iteration ----------------------------------------------------------
    def _index_batches(self) -> Iterator[list]:
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def _fetch(self, indices: list) -> Any:
        # datasets may expose a batched fast path (e.g. GeoTileDataset's
        # native tile gather); NotImplemented falls back to per-item fetch.
        # A user-supplied collate_fn must win over the fast path — read_batch
        # returns default-collated batches, which would silently bypass it.
        rb = getattr(self.dataset, 'read_batch', None)
        if rb is not None and self.collate_fn is default_collate:
            out = rb(indices)
            if out is not NotImplemented:
                return out
        return self.collate_fn([self.dataset[i] for i in indices])

    def __iter__(self):
        if self.num_workers <= 0:
            for indices in self._index_batches():
                yield self._fetch(indices)
            return

        pool = self._get_pool()
        # process workers hold their own dataset copy: ship only the index
        # list each way (the thread path closes over self normally)
        fetch = (_process_worker_fetch if self.worker_type == 'process'
                 else self._fetch)
        batches = self._index_batches()
        # torch semantics: num_workers * prefetch_factor batches in flight —
        # each in-flight batch occupies ONE pool worker here, so capping at
        # prefetch_factor alone would leave most workers permanently idle
        depth = self.num_workers * self.prefetch_factor
        in_flight = [
            pool.submit(fetch, b)
            for b in itertools.islice(batches, depth)
        ]
        try:
            while in_flight:
                fut = in_flight.pop(0)
                nxt = next(batches, None)
                if nxt is not None:
                    in_flight.append(pool.submit(self._fetch, nxt))
                yield fut.result()
        finally:
            for fut in in_flight:
                fut.cancel()
            if not self.persistent_workers:
                self._shutdown_pool()

    def _get_pool(self):
        if self._pool is None:
            if self.worker_type == 'process':
                # fork: workers inherit the parent's pages; initargs install
                # the dataset once per worker, not once per batch
                self._pool = ProcessPoolExecutor(
                    max_workers=self.num_workers,
                    mp_context=multiprocessing.get_context('fork'),
                    initializer=_process_worker_init,
                    initargs=(self.dataset, self.collate_fn))
            else:
                self._pool = ThreadPoolExecutor(
                    max_workers=self.num_workers,
                    thread_name_prefix='ever_tpu_loader')
        return self._pool

    def _shutdown_pool(self) -> None:
        if self._pool is not None:
            if self.worker_type == 'process':
                # reap worker processes; cancel_futures prevents a pending
                # batch from pinning a worker past interpreter exit
                self._pool.shutdown(wait=True, cancel_futures=True)
            else:
                self._pool.shutdown(wait=False)
            self._pool = None

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # -- utilities -----------------------------------------------------------
    def clone(self, **overrides) -> 'DataLoader':
        kwargs = dict(
            dataset=self.dataset, sampler=self.sampler, batch_size=self.batch_size,
            num_workers=self.num_workers, collate_fn=self.collate_fn,
            drop_last=self.drop_last, prefetch_factor=self.prefetch_factor,
            persistent_workers=self.persistent_workers, pin_memory=self.pin_memory,
            worker_type=self.worker_type,
        )
        kwargs.update(overrides)
        return DataLoader(**kwargs)
