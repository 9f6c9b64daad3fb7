"""Evaluation closures for ``Launcher.override_evaluate``.

Parity: ``ever/metric/evaluate_fn.py:10-127``.  The inner loop uses the
launcher's jitted eval step (bf16 forward on device, on-device argmax + CM),
and the distributed variant rewraps the loader with a non-overlapping
sequential sampler so ranks cover disjoint samples, then host-gathers +
sums the tiny CMs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ever_tpu.data.distributed import DistributedNonOverlapSeqSampler
from ever_tpu.metric.pixel import PixelMetric

__all__ = ['evaluate_pixel_prediction_task',
           'distributed_evaluate_pixel_prediction_task',
           'evaluate_change_detection_task',
           'evaluate_damage_assessment_task']


def _data_parse_fn(data):
    x, y_blob = data
    return x, y_blob, {}


def _tune_model_fn(eval_step):
    return eval_step


def _process_prediction_fn(y_true, y_pred, data_info, model_dir, checkpoint):
    return y_true, y_pred


def _progress(iterable, desc: str):
    try:
        from tqdm import tqdm
        return tqdm(iterable, desc=desc)
    except ImportError:
        return iterable


def _make_eval_loop(num_classes, data_parse_fn, tune_model_fn, prediction_fn,
                    desc, acc_table_based_callback, distributed):
    def _evaluate_fn(self, test_dataloader, config=None):
        loader = test_dataloader
        if distributed:
            sampler = getattr(loader, 'sampler', None)
            if not isinstance(sampler, DistributedNonOverlapSeqSampler):
                loader = loader.clone(
                    sampler=DistributedNonOverlapSeqSampler(loader.dataset))
        pm = PixelMetric(num_classes, self.model_dir, logger=self.logger)
        # multi-process disjoint partitions give ranks DIFFERENT batch counts;
        # a global-mesh SPMD step would deadlock the rank with fewer batches
        # and would treat each rank's local x as the global batch — evaluate
        # on this process's devices only (reference semantics: independent
        # per-rank forward, evaluate_fn.py:70-115), CMs host-gathered below
        multiproc = distributed and jax.process_count() > 1
        eval_step = tune_model_fn(self.get_eval_step(local=multiproc))
        state = self.local_state() if multiproc else self.state
        it = _progress(loader, desc) if (not distributed or
                                         jax.process_index() == 0) else loader
        n_dev = 1
        if multiproc:
            n_dev = len(jax.local_devices())
        elif getattr(self, 'mesh', None) is not None:
            n_dev = int(np.prod(list(self.mesh.shape.values())))
        for data in it:
            x, y_true, other_info = data_parse_fn(data)
            x = jnp.asarray(x)
            # tail batches need not divide the mesh: pad with repeats of the
            # last sample and drop the padded predictions after the step
            n = x.shape[0]
            pad = (-n) % n_dev
            if pad:
                x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
            y_pred = eval_step(state, (x,))
            if pad:
                y_pred = jax.tree.map(lambda p: p[:n], y_pred)
            y_true, y_pred = prediction_fn(y_true, y_pred, other_info,
                                           self.model_dir, self.checkpoint)
            pm.forward(y_true, y_pred)
        # summary_all already host-gathers CMs across processes
        acc_tb = pm.summary_all()
        if acc_table_based_callback is not None:
            acc_table_based_callback(self, acc_tb)
        return acc_tb

    return _evaluate_fn


def evaluate_pixel_prediction_task(num_classes: int,
                                   data_parse_fn: Callable = _data_parse_fn,
                                   tune_model_fn: Callable = _tune_model_fn,
                                   prediction_fn: Callable = _process_prediction_fn,
                                   desc: str = '',
                                   acc_table_based_callback: Optional[Callable] = None,
                                   cuda_empty_cache: bool = True):
    """Single-process eval closure (parity: ``evaluate_fn.py:22-59``).
    ``cuda_empty_cache`` accepted for surface parity (no-op)."""
    return _make_eval_loop(num_classes, data_parse_fn, tune_model_fn,
                           prediction_fn, desc, acc_table_based_callback,
                           distributed=False)


def evaluate_change_detection_task(threshold: float = 0.5,
                                   desc: str = '',
                                   acc_table_based_callback: Optional[Callable] = None,
                                   distributed: bool = False):
    """Binary change-detection eval (additive — the reference ships only the
    pixel task, ``evaluate_fn.py:22-127``; change models live in downstream
    projects there).

    Scores the CHANGE head of a bi-temporal model: labels are
    ``batch[1]['change']`` (or the plain mask), predictions the last element
    of the model's eval output — ``(s1, s2, change_prob)`` for
    ChangeStar/ChangeMask (``module/change.py``) — thresholded at
    ``threshold``.  Class 1's f1/iou row is the LEVIR-CD headline metric.
    """

    def parse(d):
        x, y = d[0], d[1]
        return x, (y['change'] if isinstance(y, dict) else y), {}

    def pred(y_true, y_pred, data_info, model_dir, checkpoint):
        p = y_pred[-1] if isinstance(y_pred, (tuple, list)) else y_pred
        if p.ndim == 4:          # [N,H,W,1] probability map
            p = p[..., -1]
        return y_true, (p > threshold).astype('int32')

    return _make_eval_loop(2, parse, _tune_model_fn, pred, desc,
                           acc_table_based_callback, distributed=distributed)


def evaluate_damage_assessment_task(damage_classes: int = 5,
                                    loc_threshold: float = 0.5,
                                    desc: str = '',
                                    acc_table_based_callback: Optional[Callable] = None,
                                    distributed: bool = False):
    """Building-damage eval (additive; see evaluate_change_detection_task).

    Labels are ``batch[1]['damage']``; predictions compose ChangeOS's two
    heads the way its deployment does (``module/change.py``): per-pixel
    damage argmax gated by the localization probability — pixels the loc
    head rejects score background (0).
    """

    def parse(d):
        x, y = d[0], d[1]
        return x, (y['damage'] if isinstance(y, dict) else y), {}

    def pred(y_true, y_pred, data_info, model_dir, checkpoint):
        loc, dam = y_pred
        lab = jnp.argmax(dam, axis=-1)
        gate = loc[..., 0] if loc.ndim == lab.ndim + 1 else loc
        return y_true, jnp.where(gate > loc_threshold, lab, 0).astype('int32')

    return _make_eval_loop(damage_classes, parse, _tune_model_fn, pred, desc,
                           acc_table_based_callback, distributed=distributed)


def distributed_evaluate_pixel_prediction_task(
        num_classes: int,
        data_parse_fn: Callable = _data_parse_fn,
        tune_model_fn: Callable = _tune_model_fn,
        prediction_fn: Callable = _process_prediction_fn,
        desc: str = '',
        acc_table_based_callback: Optional[Callable] = None,
        cuda_empty_cache: bool = True):
    """Exact distributed eval: disjoint per-process partitions, CM gather+sum
    (parity: ``evaluate_fn.py:62-127``)."""
    return _make_eval_loop(num_classes, data_parse_fn, tune_model_fn,
                           prediction_fn, desc, acc_table_based_callback,
                           distributed=True)
