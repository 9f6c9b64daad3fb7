"""`ERDataLoader` / `ERDataset` — configurable data sources.

Parity: ``ever/interface/dataloader.py:10-83``.  Datasets produce *numpy*
samples (dict or tuple); the loader batches them on the host and the trainer's
prefetcher moves batches into HBM.  ``total_batch_size`` keeps its reference
semantics: the *global* batch divided by the number of host processes with a
divisibility assert (``dataloader.py:61-67``).
"""

from __future__ import annotations

from ever_tpu.core import dist
from ever_tpu.core.config import AttrDict
from ever_tpu.data.distributed import (
    DistributedInfiniteSampler,
    RandomSampler,
    SequentialSampler,
    StepDistributedSampler,
)
from ever_tpu.data.loader import DataLoader, default_collate
from ever_tpu.interface.configurable import ConfigurableMixin

__all__ = ['ERDataLoader', 'ERDataset']


class ERDataLoader(DataLoader, ConfigurableMixin):
    """A DataLoader configured via a ``dataloader_params`` property.

    Subclasses override :meth:`set_default_config` and
    :attr:`dataloader_params` (parity: ``ever/interface/dataloader.py:10-31``).
    """

    def __init__(self, config=None):
        ConfigurableMixin.__init__(self, config)
        DataLoader.__init__(self, **self.dataloader_params)

    @property
    def dataloader_params(self) -> dict:
        return dict(dataset=[],
                    sampler=None,
                    batch_size=1,
                    num_workers=0,
                    collate_fn=default_collate,
                    drop_last=False)


class ERDataset(ConfigurableMixin):
    """Configurable dataset with ``to_dataloader()``.

    Supported sampler types (parity: ``ever/interface/dataloader.py:35-40``):
    ``StepDistributedSampler`` (default), ``RandomSampler``,
    ``SequentialSampler``, ``DistributedInfiniteSampler``.
    """

    SUPPORT_SAMPLERS = {
        'StepDistributedSampler': StepDistributedSampler,
        'RandomSampler': RandomSampler,
        'SequentialSampler': SequentialSampler,
        'DistributedInfiniteSampler': DistributedInfiniteSampler,
    }

    def __init__(self, config=None):
        ConfigurableMixin.__init__(self, config)
        base = AttrDict(dict(
            total_batch_size=-1,
            batch_size=1,
            num_workers=0,
            # 'thread' (GIL-releasing decode) | 'process' (torch-style
            # worker processes for pure-Python CPU-bound __getitem__,
            # parity: ever/interface/dataloader.py:44-52)
            worker_type='thread',
            prefetch_factor=2,
            persistent_workers=False,
            # None = auto: drop the ragged tail batch for training samplers.
            # SPMD training shards every batch over the device mesh, so a
            # short last batch (len(dataset) % batch_size) cannot be laid
            # out and would fail mid-epoch; the torch reference tolerates
            # ragged tails because DDP batches are per-process.  Explicit
            # True/False is honored as given.
            drop_last=None,
            sampler_type='StepDistributedSampler',
        ))
        base.update(self._config)
        self._config = base

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        raise NotImplementedError

    def to_dataloader(self, batch_size=None, num_workers=None, prefetch_factor=None,
                      persistent_workers=None) -> DataLoader:
        sampler = self.SUPPORT_SAMPLERS[self.config.sampler_type](self)

        if self.config.total_batch_size > 0:
            world = dist.get_world_size()
            if self.config.total_batch_size % world != 0:
                raise ValueError(
                    f'total_batch_size ({self.config.total_batch_size}) must be '
                    f'divisible by the number of host processes ({world})')
            self.config.batch_size = self.config.total_batch_size // world

        bs = batch_size or self.config.batch_size
        drop_last = self.config.drop_last
        if drop_last is None:
            # auto: uniform batches are a hard requirement for SPMD training
            # (see the config comment); eval's SequentialSampler keeps the
            # tail — the distributed eval path pads it to the mesh itself
            drop_last = self.config.sampler_type in (
                'StepDistributedSampler', 'DistributedInfiniteSampler',
                'RandomSampler')
        # the PER-PROCESS epoch length is what drop_last truncates — with a
        # distributed sampler, len(dataset) can exceed the batch while
        # ceil(len/world) is still shorter than it (silent empty epochs)
        try:
            n_local = len(sampler)
        except TypeError:
            n_local = len(self)
        if drop_last and n_local < bs:
            raise ValueError(
                f'{n_local} samples per process ({len(self)} total), fewer '
                f'than one batch ({bs}); every training batch would be '
                'dropped — lower batch_size or grow the dataset')
        return DataLoader(
            dataset=self,
            sampler=sampler,
            batch_size=bs,
            num_workers=num_workers if num_workers is not None else self.config.num_workers,
            prefetch_factor=prefetch_factor or self.config.prefetch_factor,
            persistent_workers=(persistent_workers if persistent_workers is not None
                                else self.config.persistent_workers),
            drop_last=drop_last,
            worker_type=self.config.worker_type,
        )
