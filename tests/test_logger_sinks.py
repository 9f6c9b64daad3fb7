"""TensorBoard / wandb sink coverage via stub modules.

The real packages are not installed in this image; the sinks are
import-gated (``core/logger.py``).  These tests monkeypatch stub modules so
the scalar / histogram / eval code paths actually execute
(parity: ``ever/core/logger.py:124-195``).
"""

import sys
import types

import numpy as np
import pytest


class _StubWriter:
    instances = []

    def __init__(self, log_dir=None):
        self.log_dir = log_dir
        self.scalars = []
        self.histograms = []
        self.closed = False
        _StubWriter.instances.append(self)

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, float(value), int(step)))

    def add_histogram(self, tag, values, step):
        self.histograms.append((tag, np.asarray(values), int(step)))

    def close(self):
        self.closed = True


class _StubWandb(types.ModuleType):
    def __init__(self):
        super().__init__('wandb')
        self.inits = []
        self.logs = []
        self.finished = False

    def init(self, **kwargs):
        self.inits.append(kwargs)

    def log(self, payload, step=None):
        self.logs.append((dict(payload), step))

    def finish(self):
        self.finished = True


@pytest.fixture
def stub_sinks(monkeypatch):
    tb_mod = types.ModuleType('torch.utils.tensorboard')
    tb_mod.SummaryWriter = _StubWriter
    _StubWriter.instances = []
    wandb_mod = _StubWandb()
    monkeypatch.setitem(sys.modules, 'torch.utils.tensorboard', tb_mod)
    monkeypatch.setitem(sys.modules, 'wandb', wandb_mod)
    return wandb_mod


def test_train_log_flows_to_tb_and_wandb(tmp_path, stub_sinks):
    from ever_tpu.core.logger import Logger

    logger = Logger('t', use_tensorboard=True, tensorboard_logdir=str(tmp_path),
                    use_wandb=True, wandb_config={'project': 'p'})
    assert stub_sinks.inits == [{'project': 'p'}]
    writer = _StubWriter.instances[-1]

    logger.train_log(step=3, num_iters=10,
                     loss_dict={'cls_loss': 1.5, 'aux_loss': 0.25},
                     data_time=0.01, time_cost=0.05, learning_rate=0.01)
    tags = {t for t, _, _ in writer.scalars}
    assert {'train/cls_loss', 'train/aux_loss', 'train/lr',
            'train/time_per_step'} <= tags
    assert ('train/cls_loss', 1.5, 3) in writer.scalars
    (payload, step), = stub_sinks.logs
    assert step == 3 and payload['train/cls_loss'] == 1.5
    assert payload['train/lr'] == 0.01

    logger.close()
    assert writer.closed and stub_sinks.finished


def test_histograms_and_eval_summaries(tmp_path, stub_sinks):
    from ever_tpu.core.logger import Logger

    logger = Logger('t2', use_tensorboard=True,
                    tensorboard_logdir=str(tmp_path), use_wandb=True)
    writer = _StubWriter.instances[-1]

    tree = {'encoder': {'conv': np.arange(4.0)}, 'head': np.ones((2, 2))}
    logger.log_histograms(tree, step=7)
    names = {t for t, _, _ in writer.histograms}
    assert names == {'weights/encoder/conv', 'weights/head'}
    np.testing.assert_array_equal(
        dict((t, v) for t, v, _ in writer.histograms)['weights/encoder/conv'],
        np.arange(4.0))

    logger.eval_log({'miou': 0.61, 'oa': 0.9, 'note': 'x'}, step=7)
    assert ('eval/miou', pytest.approx(0.61), 7) in [
        (t, v, s) for t, v, s in writer.scalars]
    (payload, step), = stub_sinks.logs
    assert step == 7 and payload == {'eval/miou': 0.61, 'eval/oa': 0.9}


def test_sinks_degrade_gracefully_when_missing(tmp_path, monkeypatch):
    """Without the packages the Logger warns and keeps console logging."""
    import builtins
    real_import = builtins.__import__

    def deny(name, *a, **kw):
        if name in ('torch.utils.tensorboard', 'wandb') or \
                name.startswith('torch.utils.tensorboard'):
            raise ImportError(name)
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, '__import__', deny)
    monkeypatch.delitem(sys.modules, 'torch.utils.tensorboard', raising=False)
    monkeypatch.delitem(sys.modules, 'wandb', raising=False)
    from ever_tpu.core.logger import Logger
    logger = Logger('t3', use_tensorboard=True,
                    tensorboard_logdir=str(tmp_path), use_wandb=True)
    assert logger._tb is None and logger._wandb is None
    logger.train_log(1, 2, {'loss': 1.0}, 0.0, 0.0, 0.1)  # must not raise


def test_console_file_logger_no_duplicate_handlers(tmp_path):
    """Repeated construction for the same logdir (PixelMetric per eval) must
    not duplicate FileHandlers / log lines."""
    import logging
    from ever_tpu.core.logger import get_console_file_logger
    lg1 = get_console_file_logger('_t_dedup', str(tmp_path))
    lg2 = get_console_file_logger('_t_dedup', str(tmp_path))
    assert lg1 is lg2
    fhs = [h for h in lg1.handlers if isinstance(h, logging.FileHandler)]
    assert len(fhs) == 1


def test_console_file_logger_new_logdir_replaces_handler(tmp_path):
    import os
    """A second run in one process (different logdir) must move file logging
    to the new dir, not duplicate lines into both files forever."""
    import logging
    from ever_tpu.core.logger import get_console_file_logger
    d1, d2 = tmp_path / 'run_a', tmp_path / 'run_b'
    lg = get_console_file_logger('_t_relog', str(d1))
    lg = get_console_file_logger('_t_relog', str(d2))
    fhs = [h for h in lg.handlers if isinstance(h, logging.FileHandler)]
    assert len(fhs) == 1
    assert os.path.dirname(fhs[0].baseFilename) == str(d2)
