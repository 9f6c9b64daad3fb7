import pytest
import itertools

import numpy as np

from ever_tpu.data.cross_validation import CrossValSamplerGenerator
from ever_tpu.data.distributed import (
    DistributedInfiniteSampler,
    DistributedNonOverlapSeqSampler,
    StepDistributedSampler,
)
from ever_tpu.data.loader import DataLoader, default_collate


class _DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return dict(x=np.full((4, 4), i, np.float32), y=np.int32(i))


def test_step_sampler_covers_all_and_is_step_deterministic():
    ds = _DS(10)
    world = 4
    samplers = [StepDistributedSampler(ds, num_replicas=world, rank=r, seed=7)
                for r in range(world)]
    for s in samplers:
        s.set_step(3)
    all_idx = list(itertools.chain.from_iterable(samplers))
    # padded to divisible: 12 indices total, every dataset index present
    assert len(all_idx) == 12
    assert set(all_idx) == set(range(10))
    # per-rank length equal
    assert all(len(s) == 3 for s in samplers)
    # same step → same order; different step → different order
    again = list(samplers[0])
    samplers[0].set_step(3)
    assert list(samplers[0]) == again
    samplers[0].set_step(4)
    assert list(samplers[0]) != again


def test_nonoverlap_seq_sampler_exact_partition():
    ds = _DS(10)
    world = 4
    samplers = [DistributedNonOverlapSeqSampler(ds, num_replicas=world, rank=r)
                for r in range(world)]
    chunks = [list(s) for s in samplers]
    flat = list(itertools.chain.from_iterable(chunks))
    assert flat == list(range(10))  # disjoint, ordered, no padding
    assert [len(c) for c in chunks] == [3, 3, 2, 2]


def test_infinite_sampler_streams():
    ds = _DS(5)
    s = DistributedInfiniteSampler(ds, num_replicas=2, rank=0, seed=1)
    first = list(itertools.islice(iter(s), 20))
    assert len(first) == 20
    assert set(first) <= set(range(5))


def test_cross_validation_folds():
    ds = _DS(23)
    cv = CrossValSamplerGenerator(ds, distributed=False, seed=1)
    pairs = cv.k_fold(5)
    assert len(pairs) == 5
    train, val = pairs[0]
    assert len(list(train)) + len(list(val)) == 25  # padded to divisible


def test_dataloader_collate_and_order():
    ds = _DS(7)
    dl = DataLoader(ds, batch_size=3, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]['x'].shape == (3, 4, 4)
    assert batches[0]['y'].tolist() == [0, 1, 2]
    assert batches[2]['y'].tolist() == [6]
    dl2 = DataLoader(ds, batch_size=3, drop_last=True)
    assert len(list(dl2)) == 2


def test_dataloader_process_workers_match_sync():
    """worker_type='process' (torch-style OS worker processes, parity:
    ever/interface/dataloader.py:44-52) yields the SAME ordered batches as
    the synchronous path; workers are reaped after iteration unless
    persistent_workers."""
    ds = _DS(10)
    sync = list(DataLoader(ds, batch_size=3))
    dl = DataLoader(ds, batch_size=3, num_workers=2, worker_type='process')
    procs = list(dl)
    assert dl._pool is None  # reaped (persistent_workers=False)
    assert len(procs) == len(sync) == 4
    for a, b in zip(procs, sync):
        np.testing.assert_array_equal(a['x'], b['x'])
        np.testing.assert_array_equal(a['y'], b['y'])

    # persistent: pool survives an epoch and a second epoch reuses it
    dlp = DataLoader(ds, batch_size=5, num_workers=2, worker_type='process',
                     persistent_workers=True)
    e1, e2 = list(dlp), list(dlp)
    assert dlp._pool is not None
    np.testing.assert_array_equal(e1[0]['x'], e2[0]['x'])
    dlp._shutdown_pool()

    import pytest
    with pytest.raises(ValueError):
        DataLoader(ds, worker_type='greenlet')


def test_default_collate_nested():
    items = [dict(a=(np.zeros(2), 1.5), b=None) for _ in range(3)]
    out = default_collate(items)
    assert out['a'][0].shape == (3, 2)
    assert out['a'][1].shape == (3,)
    assert out['b'] is None


def test_iterator_forwards_epoch_to_dataset():
    """Datasets with deterministic per-epoch augmentation RNGs (LoveDA crop)
    must actually be told the epoch — nothing called set_epoch before."""
    from ever_tpu.core.iterator import Iterator
    from ever_tpu.data.loader import DataLoader

    class _DS(list):
        epoch_calls = []

        def set_epoch(self, e):
            self.epoch_calls.append(e)

    ds = _DS(range(4))
    loader = DataLoader(ds, batch_size=2)
    it = Iterator(loader)
    for _ in range(5):   # 2 batches/epoch -> crosses epoch boundaries
        it.next(1, call_backs=None)
    assert ds.epoch_calls[:2] == [0, 1]


def test_scene_cache_thread_safe():
    import threading
    from ever_tpu.data import geotile

    calls = []
    orig = geotile.read_raster

    def fake_read(path):
        calls.append(path)
        import time as _t
        _t.sleep(0.01)
        return np.full((4, 4), hash(path) % 97, np.uint8)

    geotile.read_raster, restore = fake_read, orig
    try:
        cache = geotile._SceneCache(max_items=2)
        errs = []

        def worker(k):
            try:
                for i in range(50):
                    p = f's{(k + i) % 5}'
                    a = cache.get(p)
                    assert a[0, 0] == hash(p) % 97
            except Exception as e:   # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=worker, args=(k,)) for k in range(8)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs, errs
    finally:
        geotile.read_raster = restore


def test_dataloader_shuffle_kwarg():
    """torch DataLoader surface: shuffle=True selects a RandomSampler;
    mutually exclusive with an explicit sampler."""
    from ever_tpu.data.loader import DataLoader
    from ever_tpu.data.distributed import RandomSampler, SequentialSampler
    ds = list(range(10))
    dl = DataLoader(ds, batch_size=2, shuffle=True)
    assert isinstance(dl.sampler, RandomSampler)
    seen = sorted(int(v) for b in dl for v in np.asarray(b).ravel())
    assert seen == list(range(10))
    assert isinstance(DataLoader(ds).sampler, SequentialSampler)
    with pytest.raises(ValueError):
        DataLoader(ds, sampler=SequentialSampler(ds), shuffle=True)


def test_random_sampler_fresh_permutation_per_pass():
    """RandomSampler/SubsetRandomSampler must not repeat the identical
    permutation every epoch (torch parity: generator state advances);
    explicit set_epoch still pins it for deterministic resume."""
    from ever_tpu.data.distributed import RandomSampler, SubsetRandomSampler
    ds = list(range(32))
    s = RandomSampler(ds)
    p1, p2 = list(s), list(s)
    assert sorted(p1) == sorted(p2) == list(range(32))
    assert p1 != p2
    s.set_epoch(0)
    assert list(s) == p1   # resume determinism
    ss = SubsetRandomSampler(list(range(16)))
    q1, q2 = list(ss), list(ss)
    assert sorted(q1) == sorted(q2) and q1 != q2


def test_dataset_epoch_advances_with_first_drawn_batch():
    """set_epoch must fire when the NEW epoch's first batch is drawn, not one
    step early (the last batch of epoch e must be fetched under epoch e)."""
    from ever_tpu.core.iterator import Iterator
    from ever_tpu.data.loader import DataLoader

    fetched_under = []

    class _DS:
        epoch = 0

        def set_epoch(self, e):
            self.epoch = e

        def __len__(self):
            return 6

        def __getitem__(self, i):
            fetched_under.append((i, self.epoch))
            return np.zeros(2, np.float32)

    ds = _DS()
    it = Iterator(DataLoader(ds, batch_size=2))
    for _ in range(7):   # 3 batches/epoch -> 2 full epochs + 1 batch
        it.next(1, call_backs=None)
    for idx, ep_seen in fetched_under[:6]:
        assert ep_seen == 0, fetched_under
    for idx, ep_seen in fetched_under[6:12]:
        assert ep_seen == 1, fetched_under
    for idx, ep_seen in fetched_under[12:14]:
        assert ep_seen == 2, fetched_under


def test_iterator_dataset_epoch_resumes_from_global_step():
    """On resume a fresh Iterator must continue the dataset epoch from the
    checkpoint step, not replay epoch 0 (launcher calls set_start_step)."""
    from ever_tpu.core.iterator import Iterator
    from ever_tpu.data.loader import DataLoader

    class _DS(list):
        epochs = []

        def set_epoch(self, e):
            self.epochs.append(e)

    ds = _DS(range(4))          # 2 batches/epoch
    it = Iterator(DataLoader(ds, batch_size=2))
    it.set_start_step(4)        # resumed at step 4 -> epoch 2
    it.next(1, call_backs=None)
    assert ds.epochs[0] == 2


def test_bootstrap_probe_does_not_shift_shuffle(tmp_path):
    """The non-indexable bootstrap fallback must not advance the sampler's
    per-pass RNG (RandomSampler auto-advances in __iter__): resume and
    no-resume runs must see the same first-epoch permutation."""
    from ever_tpu.core.launcher import Launcher
    from ever_tpu.core import builder
    from ever_tpu.data.distributed import RandomSampler

    class FakeLoader:
        """Sampler-driven loader with no indexable dataset (custom loaders
        over streaming datasets hit the consume-one bootstrap fallback)."""
        dataset = None
        collate_fn = None

        def __init__(self, sampler):
            self.sampler = sampler

        def __iter__(self):
            for _ in self.sampler:   # consumes the sampler's pass
                yield (np.zeros((2, 32, 32, 3), np.float32),
                       np.zeros((2, 32, 32), np.int32))

        def __len__(self):
            return 4

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet18'), classes=7)})
    schedule = builder.make_learningrate(
        {'type': 'constant', 'params': dict(base_lr=0.01)})
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': {}})
    sampler = RandomSampler(list(range(8)))
    tl = Launcher(str(tmp_path / 'run'), model, factory.build(schedule),
                  schedule)
    tl._bootstrap_state(FakeLoader(sampler))
    assert sampler.epoch == 0   # probe consumed a pass; epoch restored
