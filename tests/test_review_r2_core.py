"""Regression tests for the round-2 core-runtime/parallel review findings."""

import numpy as np
import pytest

import ever_tpu  # noqa: F401 — registrations


# -- checkpoint ---------------------------------------------------------------

def test_remove_optimizer_in_ckpt_msgpack(tmp_path):
    from flax import serialization
    from ever_tpu.core.checkpoint import CheckPoint, remove_optimizer_in_ckpt

    ckpt = {'model': {'params': {'w': np.ones((2, 2), np.float32)}},
            'opt': {'m': np.zeros((2, 2), np.float32)},
            'global_step': 5}
    fp = tmp_path / 'checkpoint-5.ckpt'
    fp.write_bytes(serialization.msgpack_serialize(ckpt))
    remove_optimizer_in_ckpt(str(fp))
    out = CheckPoint.load(str(fp))
    assert 'opt' not in out and 'model' in out and int(out['global_step']) == 5


def test_remove_optimizer_in_ckpt_orbax_dir(tmp_path):
    """An orbax checkpoint is a DIRECTORY: stripping the optimizer must
    rewrite it in the same format, not open() the dir for binary write."""
    ocp = pytest.importorskip('orbax.checkpoint')
    from ever_tpu.core.checkpoint import CheckPoint, remove_optimizer_in_ckpt

    ckpt = {'model': {'params': {'w': np.ones((2, 2), np.float32)}},
            'opt': {'m': np.zeros((2, 2), np.float32)},
            'global_step': 5}
    dp = tmp_path / 'checkpoint-5'
    ocp.PyTreeCheckpointer().save(str(dp), ckpt)
    remove_optimizer_in_ckpt(str(dp))
    out = CheckPoint.load(str(dp))
    assert 'opt' not in out and 'model' in out and int(out['global_step']) == 5
    np.testing.assert_array_equal(out['model']['params']['w'],
                                  ckpt['model']['params']['w'])


def test_save_callback_collective_for_orbax_multiprocess(monkeypatch):
    """orbax saves are multi-host collectives: SaveCheckpointCallback must
    report only_master=False there (or rank 0 deadlocks in orbax's barrier
    while the gated ranks skip the save)."""
    from ever_tpu.core import dist
    from ever_tpu.interface.callback import SaveCheckpointCallback

    class _Ckpt:
        backend = 'orbax'

    class _Launcher:
        checkpoint = _Ckpt()

    cb = SaveCheckpointCallback(1)
    assert cb.only_master  # unwired: default posture
    cb.set_launcher(_Launcher())
    monkeypatch.setattr(dist, 'get_world_size', lambda: 4)
    assert not cb.only_master
    _Ckpt.backend = 'orbax_async'
    assert not cb.only_master
    _Ckpt.backend = 'msgpack'
    assert cb.only_master  # msgpack gates its own write on is_main_process
    _Ckpt.backend = 'orbax'
    monkeypatch.setattr(dist, 'get_world_size', lambda: 1)
    assert cb.only_master  # single process: nothing to deadlock


# -- registry -----------------------------------------------------------------

def test_register_file_retry_after_failed_import(tmp_path):
    """A file whose import fails must be retryable — marking it registered
    before exec_module permanently skips it (and leaves a broken module in
    sys.modules)."""
    import sys
    from ever_tpu.core import registry

    f = tmp_path / 'flaky_mod.py'
    f.write_text('raise ImportError("transient")\n')
    with pytest.raises(ImportError):
        registry.register_file(str(f))
    assert not any('flaky_mod' in name for name in sys.modules)

    f.write_text(
        'from ever_tpu.core import registry\n'
        "@registry.MODEL.register('retry_after_failure_model')\n"
        'class M:\n    pass\n')
    registry.register_file(str(f))
    assert 'retry_after_failure_model' in registry.MODEL
    del registry.MODEL['retry_after_failure_model']


# -- iterator / callbacks -----------------------------------------------------

class _CountingCallback:
    pass


def _counting_cb(interval, fired):
    from ever_tpu.interface.callback import Callback

    class CB(Callback):
        def __init__(self):
            super().__init__(epoch_interval=interval, only_master=False)

        def func(self):
            fired.append(True)

    return CB()


def test_run_callbacks_interval_zero_means_never():
    from ever_tpu.core.iterator import run_callbacks

    fired = []
    cb = _counting_cb(0, fired)
    run_callbacks([cb], current_epoch=3, is_master=True)  # was ZeroDivisionError
    assert fired == []
    run_callbacks([_counting_cb(-1, fired)], current_epoch=3, is_master=True)
    assert fired == []


def test_iterator_epoch_clock_respects_start_step():
    """After resume the callback clock must track TRUE dataset epochs (the
    same ones ds_epoch follows), not local steps — and must not re-fire
    immediately on the first post-resume draw."""
    from ever_tpu.core.iterator import Iterator
    from ever_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return np.zeros(2, np.float32)

    dl = DataLoader(DS(), batch_size=2)  # len(dl) == 4 steps/epoch
    fired_at = []

    class Rec:
        pass

    from ever_tpu.interface.callback import Callback

    class CB(Callback):
        def __init__(self):
            super().__init__(epoch_interval=1, only_master=False)

        def func(self):
            fired_at.append(it._start_step + it._step)

    # fresh run: the epoch clock flips at steps 4 and 8 (one step before the
    # boundary draw — the reference's iterator semantics; see the ds_epoch
    # comment in Iterator.next)
    it = Iterator(dl)
    for _ in range(9):
        it.next(1, call_backs=[CB()], is_master=True)
    assert fired_at == [4, 8]

    # resumed mid-epoch (global step 6 done): no immediate fire, next fire
    # exactly where the unbroken run fires (global step 8)
    fired_at.clear()
    it = Iterator(dl)
    it.set_start_step(6)
    for _ in range(4):   # global steps 7..10
        it.next(1, call_backs=[CB()], is_master=True)
    assert fired_at == [8]


def test_evaluate_last_ckpt_bootstraps_state(tmp_path):
    """evaluate_last_ckpt on a fresh Launcher (inference entry) must
    bootstrap state before try_resume dereferences it."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from ever_tpu.core import builder
    from ever_tpu.core.launcher import Launcher
    from ever_tpu.data.loader import DataLoader

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, y=None, train=False):
            out = nn.Dense(4)(x)
            if train:
                return {'cls_loss': jnp.mean((out - y) ** 2)}
            return out

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return (np.ones(6, np.float32) * i,
                    np.zeros(4, np.float32))

    dl = DataLoader(DS(), batch_size=2)
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})

    # produce a checkpoint at step 3
    tl = Launcher(str(tmp_path / 'run'), M(), factory.build(0.01), None)
    tl.init_state(next(iter(dl)))
    tl.checkpoint.set_global_step(3)
    tl.checkpoint.save()

    # fresh launcher, no state: the crash path was state=None in try_resume
    tl2 = Launcher(str(tmp_path / 'run'), M(), factory.build(0.01), None)
    seen = {}

    def eval_fn(self, loader, config=None):
        seen['step'] = int(self.global_step)
        return None

    tl2.override_evaluate(eval_fn)
    tl2.evaluate_last_ckpt(dl)
    assert seen['step'] == 3


def test_k_loop_logs_per_step_time(monkeypatch, tmp_path):
    """_train_loop_k logs PER-STEP time/data_time, not per-dispatch: with a
    fake clock ticking 1.0 per call, a K=2 dispatch must report 1/K each."""
    import jax.numpy as jnp
    import flax.linen as nn
    from ever_tpu.core import builder, launcher as launcher_mod
    from ever_tpu.core.launcher import Launcher
    from ever_tpu.data.loader import DataLoader

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, y=None, train=False):
            out = nn.Dense(4)(x)
            if train:
                return {'cls_loss': jnp.mean((out - y) ** 2)}
            return out

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return (np.ones(6, np.float32), np.zeros(4, np.float32))

    dl = DataLoader(DS(), batch_size=4)
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
    tl = Launcher(str(tmp_path / 'run'), M(), factory.build(0.01), None)

    logged = []
    tl.logger.train_log = (lambda step, num_iters, metrics, data_time,
                           time_cost, lr: logged.append((step, data_time,
                                                         time_cost)))

    class FakeTime:
        """Stands in for launcher.py's `time` module binding only — patching
        the global time module would feed ticks to the logger and jax too."""
        t = 0.0

        @staticmethod
        def time():
            FakeTime.t += 1.0
            return FakeTime.t

    monkeypatch.setattr(launcher_mod, 'time', FakeTime)
    tl.train_iters(dl, num_iters=4, steps_per_loop=2, distributed=False,
                   save_ckpt_interval_epoch=-1, log_interval_step=1)
    assert logged, 'expected at least one log call'
    for step, data_time, time_cost in logged:
        # fake clock: t0..end spans exactly 2 ticks (t0 and the pending
        # stamp), i.e. 2.0 wall per dispatch of K=2 steps → 1.0 per step
        assert time_cost == pytest.approx(1.0)
        assert data_time == pytest.approx(0.5)


# -- spatial halo -------------------------------------------------------------

def test_halo_exchange_halo0_identity():
    """halo=0 must be the identity — `x[:, -0:]` slices the WHOLE strip and
    used to return a doubled-height corrupted tensor."""
    import jax
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    from ever_tpu.parallel.spatial import halo_exchange, halo_exchange_exact

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ('data',))
    x = np.arange(8 * 16 * 4 * 3, dtype=np.float32).reshape(8, 16, 4, 3)

    def f(xl):
        return halo_exchange(xl, 0, 'data')

    out = jax.jit(shard_map(f, mesh=mesh, in_specs=P('data'),
                            out_specs=P('data')))(x)
    np.testing.assert_array_equal(np.asarray(out), x)

    def g(xl):
        padded, crop = halo_exchange_exact(xl, 0, 'data')
        return padded

    out2 = jax.jit(shard_map(g, mesh=mesh, in_specs=P('data'),
                             out_specs=P('data')))(x)
    np.testing.assert_array_equal(np.asarray(out2), x)


def test_evaluate_auto_injects_pixel_eval(tmp_path):
    """eval_after_train must work out of the box for segmentation models:
    when no evaluate fn was injected and the model config declares a class
    count, the standard pixel-prediction eval is auto-wired (the torch
    reference raises NotImplementedError until the user wires it)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from ever_tpu.core import builder
    from ever_tpu.core.launcher import Launcher
    from ever_tpu.data.loader import DataLoader
    from ever_tpu.interface import ERModule

    class Seg(ERModule):
        def set_default_config(self):
            self.config.update(dict(classes=4))

        @nn.compact
        def __call__(self, x, y=None, train=False):
            logits = nn.Conv(self.config.classes, (1, 1))(x)
            if train:
                onehot = jax.nn.one_hot(y, self.config.classes)
                return {'cls_loss': -jnp.mean(
                    jax.nn.log_softmax(logits) * onehot)}
            return logits

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return (rng.normal(size=(16, 16, 3)).astype(np.float32),
                    rng.integers(0, 4, size=(16, 16)).astype(np.int32))

    dl = DataLoader(DS(), batch_size=2)
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
    tl = Launcher(str(tmp_path / 'run'), Seg(), factory.build(0.01), None)
    tl.init_state(next(iter(dl)))
    acc = tl.evaluate(dl)
    assert acc is not None  # full metric table came back
    mean_iou = float(np.mean(acc.iou()))
    assert 0.0 <= mean_iou <= 1.0


def test_update_from_list_lowercase_bools():
    """'false' is not a Python literal: literal_eval left the TRUTHY string
    'false' in the config, silently ignoring every lowercase boolean
    override typed on the CLI."""
    from ever_tpu.core.config import AttrDict

    cfg = AttrDict(dict(train=dict(eval_after_train=True, thing=1)))
    cfg.update_from_list(['train.eval_after_train', 'false',
                          'train.flag', 'TRUE',
                          'train.opt', 'null',
                          'train.reduction', 'none',
                          'train.name', 'falsey_string_value',
                          'train.thing', '2'])
    assert cfg.train.eval_after_train is False
    assert cfg.train.flag is True
    assert cfg.train.opt is None
    # 'none' is a common literal string enum value (loss reduction) and
    # must SURVIVE as a string; None spells 'null' or Python 'None'
    assert cfg.train.reduction == 'none'
    assert cfg.train.name == 'falsey_string_value'
    assert cfg.train.thing == 2


def test_auto_eval_routes_structured_labels(tmp_path):
    """Auto-injected eval routes by label structure: dict labels with
    'change' run the binary change-detection eval; unrecognized dict labels
    skip with an actionable message instead of crashing."""
    import jax.numpy as jnp
    import flax.linen as nn
    from ever_tpu.core import builder
    from ever_tpu.core.launcher import Launcher
    from ever_tpu.data.loader import DataLoader
    from ever_tpu.interface import ERModule

    class CD(ERModule):
        def set_default_config(self):
            self.config.update(dict(classes=2))

        @nn.compact
        def __call__(self, x, y=None, train=False):
            logits = nn.Conv(2, (1, 1))(x)
            if train:
                return {'cls_loss': jnp.mean(logits ** 2)}
            return logits

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return (np.zeros((8, 8, 6), np.float32),
                    dict(masks=np.zeros((8, 8, 2), np.int32),
                         change=np.zeros((8, 8), np.int32)))

    dl = DataLoader(DS(), batch_size=2)
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
    tl = Launcher(str(tmp_path / 'run'), CD(), factory.build(0.01), None)
    tl.init_state(next(iter(dl)))
    acc = tl.evaluate(dl)           # change-detection eval auto-routes
    assert acc is not None
    assert 0.0 <= float(np.mean(acc.iou())) <= 1.0

    class Odd:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return (np.zeros((8, 8, 6), np.float32),
                    dict(masks=np.zeros((8, 8, 2), np.int32)))

    tl2 = Launcher(str(tmp_path / 'run2'), CD(), factory.build(0.01), None)
    dl2 = DataLoader(Odd(), batch_size=2)
    tl2.init_state(next(iter(dl2)))
    assert tl2.evaluate(dl2) is None  # unrecognized dict: skip, no crash


def test_unclipped_config_trains_unclipped_but_records_norm():
    """Reference parity: a config WITHOUT grad_clip trains unclipped
    (clipping used to default to max_norm=35); the grad_norm metric is
    still recorded via the record-only transform."""
    import jax
    import jax.numpy as jnp
    from ever_tpu.core import builder
    from ever_tpu.opt.optimizer import find_recorded_grad_norm

    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
    params = {'w': jnp.ones((4,)) * 1.0}
    grads = {'w': jnp.ones((4,)) * 100.0}   # global norm 200 >> 35

    tx = factory.build(1.0)                 # no grad_clip -> unclipped
    st = tx.init(params)
    upd, st = tx.update(grads, st, params)
    assert float(jnp.abs(upd['w'][0])) == 100.0
    assert float(find_recorded_grad_norm(st)) == 200.0

    tx = factory.build(1.0, grad_clip=dict(max_norm=35.0))
    st = tx.init(params)
    upd, st = tx.update(grads, st, params)
    assert abs(float(jnp.abs(upd['w'][0])) - 100.0 * 35.0 / 200.0) < 1e-4
    assert float(find_recorded_grad_norm(st)) == 200.0


def test_build_from_model_dir_orbax_checkpoints(tmp_path):
    """Orbax checkpoints are DIRECTORIES named checkpoint-N: discovery must
    go through checkpoint_info.json (the .ckpt glob never matches them)."""
    import jax.numpy as jnp
    import flax.linen as nn
    pytest.importorskip('orbax.checkpoint')
    from ever_tpu.api import infer_tool
    from ever_tpu.core import builder, registry
    from ever_tpu.core.config import AttrDict, save_pkl
    from ever_tpu.core.launcher import Launcher
    from ever_tpu.data.loader import DataLoader

    @registry.MODEL.register('orbax_infer_demo')
    class M(ever_tpu.ERModule):
        def set_default_config(self):
            self.config.update(dict(features=4))

        @nn.compact
        def __call__(self, x, y=None, train=False):
            out = nn.Dense(self.config.features)(x)
            if train:
                return {'cls_loss': jnp.mean((out - y) ** 2)}
            return out

    try:
        class DS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return (np.ones(6, np.float32), np.zeros(4, np.float32))

        mdir = str(tmp_path / 'run')
        factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
        tl = Launcher(mdir, builder.make_model(
            {'type': 'orbax_infer_demo', 'params': {}}),
            factory.build(0.01), None, checkpoint_backend='orbax')
        tl.init_state(next(iter(DataLoader(DS(), batch_size=2))))
        tl.checkpoint.set_global_step(7)
        tl.checkpoint.save()
        save_pkl(AttrDict(dict(model=dict(type='orbax_infer_demo',
                                          params=dict()))),
                 str(tmp_path / 'run' / 'config.pkl'))
        model, variables, step = infer_tool.build_from_model_dir(mdir)
        out = model.apply(variables, jnp.ones((1, 6)), train=False)
        assert out.shape == (1, 4)
    finally:
        del registry.MODEL['orbax_infer_demo']


def test_trainer_evaluate_requires_checkpoint(tmp_path):
    """The eval-only entry must FAIL on an untrained model_dir instead of
    silently scoring a randomly initialized model."""
    import argparse
    from ever_tpu.trainer.trainer import SPMDTrainer

    cfg = tmp_path / 'cfg.py'
    cfg.write_text("""
config = dict(
    model=dict(type='FarSeg', params=dict(
        encoder=dict(resnet_type='resnet18'), classes=7,
        dtype='float32')),
    data=dict(
        train=dict(type='loveda', params=dict(root='', batch_size=2)),
        test=dict(type='loveda', params=dict(root='', batch_size=2)),
    ),
    learning_rate=dict(type='constant', params=dict(base_lr=0.01)),
    optimizer=dict(type='sgd', params=dict()),
    train=dict(num_iters=1),
)
""")
    # synthesize a tiny loveda val tree so the dataloader constructs
    from tests.test_loveda import _make_loveda
    root = _make_loveda(tmp_path / 'data')
    args = argparse.Namespace(config_path=str(cfg),
                              model_dir=str(tmp_path / 'empty_run'),
                              trainer='spmd', mixed_precision='fp32',
                              use_wandb=False, use_tensorboard=False,
                              project=None, entity=None,
                              opts=['data.test.params.root', root,
                                    'data.test.params.crop_size', '32',
                                    'data.test.params.eval_crop', 'true'])
    t = SPMDTrainer(args)
    with pytest.raises(FileNotFoundError, match='no checkpoint'):
        t.evaluate()


def test_eval_interval_epoch_zero_rejected(tmp_path):
    """eval_per_epoch with interval 0 used to pass validation and then be
    silently skipped forever."""
    import jax.numpy as jnp
    import flax.linen as nn
    from ever_tpu.core import builder
    from ever_tpu.core.launcher import Launcher
    from ever_tpu.data.loader import DataLoader

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, y=None, train=False):
            out = nn.Dense(2)(x)
            if train:
                return {'cls_loss': jnp.mean(out ** 2)}
            return out

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return (np.ones(3, np.float32), np.zeros(2, np.float32))

    dl = DataLoader(DS(), batch_size=2)
    factory, _ = builder.make_optimizer({'type': 'sgd', 'params': dict()})
    tl = Launcher(str(tmp_path / 'run'), M(), factory.build(0.01), None)
    with pytest.raises(ValueError, match='eval_interval_epoch'):
        tl.train_iters(dl, test_data_loader=dl, num_iters=2,
                       eval_per_epoch=True, eval_interval_epoch=0,
                       save_ckpt_interval_epoch=-1)
