"""Console/file/TensorBoard/wandb logging with smoothing and ETA.

Parity: ``ever/core/logger.py:22-341`` — timestamped per-run file logging
under the model dir, ``SmoothedValue`` 100-window running means, ``train_log``
with data-time/step-time decomposition and ETA, ``eval_log``/``eval_summary``,
``save_log``/``restore_log`` one-liners, and the ``TrainLogHook`` extension
point (used by the LR finder, ``ever/util/lr_search.py``).  TensorBoard and
wandb sinks are optional and import-gated.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from collections import deque
from typing import Dict, Optional

from ever_tpu.core.dist import is_main_process

__all__ = ['Logger', 'SmoothedValue', 'TrainLogHook', 'get_console_file_logger',
           'get_logger', 'info']

_FORMAT = '%(asctime)s %(name)s %(levelname)s: %(message)s'


def get_logger(name: str = 'ever_tpu') -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def get_console_file_logger(name: str, logdir: str) -> logging.Logger:
    """Console + timestamped file logging (parity: ``logger.py:22-73``)."""
    logger = get_logger(name)
    if is_main_process() and logdir:
        # ONE FileHandler per logger: repeated construction (e.g. PixelMetric
        # once per eval) must not duplicate every line into every previously
        # opened log file or leak descriptors.  Same logdir -> reuse; a NEW
        # logdir (second run in one process) replaces the old handler so
        # lines land only in the active run's file.
        logdir = os.path.abspath(logdir)
        for h in list(logger.handlers):
            if isinstance(h, logging.FileHandler):
                if os.path.dirname(h.baseFilename) == logdir:
                    return logger
                logger.removeHandler(h)
                h.close()
        os.makedirs(logdir, exist_ok=True)
        fname = time.strftime('%Y-%m-%d-%H-%M-%S', time.localtime()) + '.log'
        fh = logging.FileHandler(os.path.join(logdir, fname))
        fh.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(fh)
    return logger


def info(msg: str) -> None:
    if is_main_process():
        get_logger().info(msg)


class SmoothedValue:
    """Windowed running mean (parity: ``logger.py:317-341``)."""

    def __init__(self, window_size: int = 100):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float) -> None:
        self.deque.append(float(value))
        self.count += 1
        self.total += float(value)

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / self.count if self.count else 0.0


class TrainLogHook:
    """After-iter/after-train hook interface (parity: ``logger.py:76-108``)."""

    def after_iter(self, global_step: int, loss_dict: Dict[str, float],
                   learning_rate: float) -> None:
        pass

    def after_train(self) -> None:
        pass


class Logger:
    """Training logger feeding console/file, TensorBoard and wandb
    (parity: ``logger.py:111-314``)."""

    def __init__(self, name: str = 'ever_tpu', use_tensorboard: bool = False,
                 tensorboard_logdir: Optional[str] = None,
                 use_wandb: bool = False, wandb_config: Optional[dict] = None):
        self._logger = (get_console_file_logger(name, tensorboard_logdir)
                        if tensorboard_logdir else get_logger(name))
        self._smoothers: Dict[str, SmoothedValue] = {}
        self._hooks = []
        self._tb = None
        self._wandb = None
        if use_tensorboard and tensorboard_logdir and is_main_process():
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=tensorboard_logdir)
            except Exception:
                self._logger.warning('tensorboard unavailable; skipping TB sink')
        if use_wandb and is_main_process():
            try:
                import wandb
                wandb.init(**(wandb_config or {}))
                self._wandb = wandb
            except Exception:
                self._logger.warning('wandb unavailable; skipping wandb sink')

    # -- plumbing ------------------------------------------------------------
    def register_train_log_hook(self, hook: TrainLogHook) -> None:
        self._hooks.append(hook)

    def on(self) -> bool:
        return is_main_process()

    def info(self, msg: str) -> None:
        if self.on():
            self._logger.info(msg)

    def _smooth(self, key: str, value: float) -> SmoothedValue:
        sm = self._smoothers.setdefault(key, SmoothedValue())
        sm.update(value)
        return sm

    # -- training ------------------------------------------------------------
    def train_log(self, step: int, num_iters: int, loss_dict: Dict[str, float],
                  data_time: float, time_cost: float, learning_rate: float) -> None:
        """Per-step console/TB/wandb line with smoothing + ETA
        (parity: ``logger.py:197-250``)."""
        for hook in self._hooks:
            hook.after_iter(step, loss_dict, learning_rate)
        if not self.on():
            return
        t = self._smooth('time_cost', time_cost)
        d = self._smooth('data_time', data_time)
        parts = [f'step: {step}/{num_iters}', f'lr: {learning_rate:.6f}']
        for k, v in loss_dict.items():
            sm = self._smooth(k, float(v))
            parts.append(f'{k}: {sm.median:.4f}')
            if self._tb:
                self._tb.add_scalar(f'train/{k}', float(v), step)
        eta_sec = t.avg * max(num_iters - step, 0)
        h, rem = divmod(int(eta_sec), 3600)
        m, s = divmod(rem, 60)
        parts.append(f'data_time: {d.avg * 1000:.1f}ms')
        parts.append(f'time: {t.avg * 1000:.1f}ms/step')
        parts.append(f'eta: {h}:{m:02d}:{s:02d}')
        self._logger.info(', '.join(parts))
        if self._tb:
            self._tb.add_scalar('train/lr', learning_rate, step)
            self._tb.add_scalar('train/time_per_step', t.avg, step)
        if self._wandb:
            payload = {f'train/{k}': float(v) for k, v in loss_dict.items()}
            payload['train/lr'] = learning_rate
            self._wandb.log(payload, step=step)

    def after_train(self) -> None:
        for hook in self._hooks:
            hook.after_train()

    def log_histograms(self, tree, step: int, prefix: str = 'weights') -> None:
        """Param histogram summaries (parity: ``logger.py:183-195``,
        ``summary_weights``).  TensorBoard sink only; no-op without it."""
        if not (self.on() and self._tb):
            return
        import jax
        import numpy as np
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        for path, leaf in flat:
            name = '/'.join(str(getattr(k, 'key', k)) for k in path)
            self._tb.add_histogram(f'{prefix}/{name}',
                                   np.asarray(jax.device_get(leaf)), step)

    # -- evaluation ----------------------------------------------------------
    def eval_log(self, metrics: Dict[str, float], step: int = 0) -> None:
        """Eval scalar logging (parity: ``logger.py:264-279``)."""
        if not self.on():
            return
        line = ', '.join(f'{k}: {v:.4f}' if isinstance(v, float) else f'{k}: {v}'
                         for k, v in metrics.items())
        self._logger.info(f'[eval @ step {step}] {line}')
        if self._tb:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f'eval/{k}', v, step)
        if self._wandb:
            self._wandb.log({f'eval/{k}': v for k, v in metrics.items()
                             if isinstance(v, (int, float))}, step=step)

    def eval_summary(self, table) -> None:
        if self.on():
            self._logger.info('\n%s' % table)

    # -- one-liners (parity: save_log/restore_log) ---------------------------
    def save_log(self, filename: str) -> None:
        self.info(f'checkpoint saved: {filename}')

    def restore_log(self, filepath: str) -> None:
        self.info(f'resumed from: {filepath}')

    def forward_times_log(self, forward_times: int) -> None:
        if forward_times > 1:
            self.info(f'gradient accumulation: forward_times = {forward_times}')

    def approx_equal_log(self, total_batch: int) -> None:
        self.info(f'effective global batch size = {total_batch}')

    def close(self) -> None:
        if self._tb:
            self._tb.close()
        if self._wandb:
            self._wandb.finish()


def eval_start(logger: logging.Logger) -> None:
    """Parity: ``ever/core/logger.py:303-304``."""
    import time
    logger.info('Start evaluation at {}'.format(
        time.strftime('%Y-%m-%d %H:%M:%S', time.localtime())))


def eval_progress(logger: logging.Logger, cur: int, total: int) -> None:
    """Parity: ``ever/core/logger.py:307-308``."""
    logger.info('[Eval] {}/{}'.format(cur, total))


def speed(logger: logging.Logger, sec: float, unit: str = 'im') -> None:
    """Parity: ``ever/core/logger.py:311-312``."""
    logger.info('[Speed] {} s/{}'.format(sec, unit))


def save_log(logger, checkpoint_name):
    """Parity: ``ever/core/logger.py:295-296``."""
    logger.info('{} has been saved.'.format(checkpoint_name))


def restore_log(logger, checkpoint_name):
    """Parity: ``ever/core/logger.py:299-300``."""
    logger.info('{} has been restored.'.format(checkpoint_name))
