"""Epoch-agnostic infinite iterator over a DataLoader.

Parity: ``ever/core/iterator.py:21-103`` — auto-reset on exhaustion,
``next(forward_times)`` returning a *list* of batches for gradient
accumulation, once-per-epoch callback firing, and per-step sampler reseeding
(``set_seed_for_dist_sampler``) for exact mid-epoch resume.
"""

from __future__ import annotations

import warnings
from typing import List, Optional

from ever_tpu.core.dist import is_main_process, synchronize
from ever_tpu.interface.callback import Callback

__all__ = ['get_iterator', 'Iterator', 'run_callbacks', 'ITERATOR_TYPE']


def run_callbacks(callbacks, current_epoch: int, is_master: bool) -> None:
    """Fire callbacks due at this epoch (parity: ``iterator.py:21-39``)."""
    if callbacks is None:
        return
    for f in callbacks:
        if not isinstance(f, Callback):
            raise TypeError('callbacks must be ever_tpu Callback objects')
        if f.interval <= 0:
            # <= 0 means "never on an epoch boundary" (0 would otherwise
            # ZeroDivisionError below; before/after_train flags still apply)
            continue
        if (current_epoch - 1) % f.interval != 0 or current_epoch == 1:
            continue
        if f.only_master:
            if is_master:
                f.func()
            synchronize()
        else:
            f.func()
            synchronize()


class Iterator:
    def __init__(self, data_loader):
        self._data_loader = data_loader
        self._iterator = iter(self._data_loader)
        self._step = 0
        self._start_step = 0
        self._look_up = {}
        self._ds_epoch = None

    def epoch(self, forward_times: int) -> int:
        # include the resume offset: the callback clock must track the same
        # dataset epochs ds_epoch does, or post-resume save/eval callbacks
        # fire mid-epoch forever (len(loader) local steps after resume rather
        # than at true epoch boundaries)
        return (forward_times * (self._start_step + self._step)
                // max(len(self._data_loader), 1) + 1)

    def _get_one(self):
        try:
            return next(self._iterator)
        except StopIteration:
            self.reset()
            return next(self._iterator)

    def next(self, forward_times: int = 1, call_backs=None,
             is_master: Optional[bool] = None) -> List:
        if is_master is None:
            is_master = is_main_process()
        self._step += 1
        ep = self.epoch(forward_times)
        # forward the epoch to datasets with deterministic per-epoch
        # augmentation RNGs (e.g. LoveDA's crop rng) — samplers are reseeded
        # per step separately (set_seed_for_dist_sampler), but nothing else
        # ever told the DATASET which epoch it is in.  The dataset epoch is
        # that of the batch ABOUT TO BE DRAWN (first of this step's list),
        # not `ep`, which flips one step early at epoch boundaries.
        ds = getattr(self._data_loader, 'dataset', None)
        if hasattr(ds, 'set_epoch'):
            ds_ep = ((self._start_step + self._step - 1) * forward_times
                     ) // max(len(self._data_loader), 1)
            if ds_ep != self._ds_epoch:
                ds.set_epoch(ds_ep)
                self._ds_epoch = ds_ep
        if ep not in self._look_up:
            # mark-but-don't-fire on a RESUMED run's first draw: its first ep
            # is generally mid-epoch, and saving/evaluating immediately after
            # restore would duplicate the checkpoint it just resumed from.
            # Fresh runs keep the fire-on-first-step-of-new-epoch semantics.
            if self._step > 1 or self._start_step == 0:
                run_callbacks(call_backs, ep, is_master)
            self._look_up[ep] = True
        return [self._get_one() for _ in range(forward_times)]

    def reset(self) -> None:
        self._iterator = iter(self._data_loader)

    def set_start_step(self, global_step: int) -> None:
        """Offset the dataset-epoch computation by the resumed checkpoint's
        global step, so ``ds.set_epoch`` continues from the epoch an unbroken
        run would be at (a fresh Iterator's local ``_step`` restarts at 0 on
        resume and on staged ``train_iters`` calls; samplers get the same
        treatment via per-step ``set_seed_for_dist_sampler``)."""
        self._start_step = int(global_step)

    def set_seed_for_dist_sampler(self, seed: int) -> None:
        """Reseed the sampler with the current step (duck-typed ``set_step``/
        ``set_epoch``, parity: ``iterator.py:78-95``)."""
        sampler = getattr(self._data_loader, 'sampler', None)
        if sampler is None:
            warnings.warn('data_loader has no sampler; no shuffle reseeding.')
            return
        if hasattr(sampler, 'set_step'):
            sampler.set_step(seed)
        elif hasattr(sampler, 'set_epoch'):
            sampler.set_epoch(seed)


class PrefetchedIterator(Iterator):
    """Iterator whose batches are already in device memory.

    Parity: the reference's ``iterator_type='prefetched'`` extension point
    (``docs/DEFAULT_SETTING.md``, ``iterator.py:101-103``).  Wraps the host
    loader with :func:`ever_tpu.core.prefetch.prefetch_to_device` so H2D
    transfer runs a batch ahead of the hot loop.
    """

    def __init__(self, data_loader, prefetch_size: int = 2, sharding=None):
        super().__init__(data_loader)
        self._prefetch_size = prefetch_size
        self._sharding = sharding
        self.reset()

    def reset(self) -> None:
        from ever_tpu.core.prefetch import prefetch_to_device
        if not hasattr(self, '_prefetch_size'):
            # parent __init__ calls reset before our fields exist
            self._iterator = iter(self._data_loader)
            return
        self._iterator = prefetch_to_device(iter(self._data_loader),
                                            size=self._prefetch_size,
                                            sharding=self._sharding)


ITERATOR_TYPE = dict(normal=Iterator, prefetched=PrefetchedIterator)


def get_iterator(type_name: str):
    if type_name in ITERATOR_TYPE:
        return ITERATOR_TYPE[type_name]
    raise KeyError(f'{type_name} is not supported.')
