"""On-device metric functions (jnp).

Parity target: ``ever/metric/function.py:4-80`` (torch sparse CM, OA/AA/
kappa/IoU/mIoU).  TPU-native formulation: the confusion matrix is ONE
``bincount`` over ``y_true * C + y_pred`` — dense ``[C, C]``, tiny, computed
on device, differentiable-free, and cross-device reduction is a single
``psum``/global sum (replaces the scipy-sparse + gloo-object-gather detour,
``ever/metric/confusion_matrix.py:6-40`` + ``core/dist.py:63-115``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-7

__all__ = [
    'confusion_matrix', 'overall_accuracy_score', 'average_accuracy_score',
    'cohen_kappa_score', 'iou_per_class', 'mean_iou', 'EPS',
]


@partial(jax.jit, static_argnames=('num_classes',))
def confusion_matrix(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                     num_classes: int, ignore_index: int = 255) -> jnp.ndarray:
    """Dense [C, C] confusion matrix (row = gt, col = pred), ignore-aware."""
    y_true = y_true.reshape(-1)
    y_pred = y_pred.reshape(-1)
    valid = (y_true != ignore_index) & (y_true >= 0) & (y_true < num_classes)
    t = jnp.where(valid, y_true, 0)
    idx = t * num_classes + jnp.clip(y_pred, 0, num_classes - 1)
    # integer counts: a float32-weighted bincount silently stops counting
    # past 2^24 per cell (one stitched 12k x 12k scene overflows it); route
    # invalid pixels to an overflow bucket instead of weighting them out
    idx = jnp.where(valid, idx, num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


def overall_accuracy_score(cm: jnp.ndarray) -> jnp.ndarray:
    return jnp.trace(cm) / (jnp.sum(cm) + EPS)


def average_accuracy_score(cm: jnp.ndarray,
                           return_accuracys: bool = False):
    accs = jnp.diag(cm) / (jnp.sum(cm, axis=1) + EPS)
    if return_accuracys:
        return jnp.mean(accs), accs
    return jnp.mean(accs)


def cohen_kappa_score(cm: jnp.ndarray) -> jnp.ndarray:
    cm = cm.astype(jnp.float32)
    n = cm.shape[0]
    sum0 = jnp.sum(cm, axis=0)
    sum1 = jnp.sum(cm, axis=1)
    expected = jnp.outer(sum0, sum1) / (jnp.sum(sum0) + EPS)
    w = jnp.ones((n, n)).at[jnp.arange(n), jnp.arange(n)].set(0.0)
    k = jnp.sum(w * cm) / (jnp.sum(w * expected) + EPS)
    return 1.0 - k


def iou_per_class(cm: jnp.ndarray) -> jnp.ndarray:
    sum_over_row = jnp.sum(cm, axis=0)
    sum_over_col = jnp.sum(cm, axis=1)
    diag = jnp.diag(cm)
    return diag / (sum_over_row + sum_over_col - diag + EPS)


def mean_iou(cm: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(iou_per_class(cm))


# -- reference spellings ------------------------------------------------------
# The reference keeps two families — numpy/scipy and ``th_``-prefixed torch
# variants (``ever/metric/function.py:4-81``).  On TPU there is one device
# family; the th_ spellings alias it so ported code runs unchanged.

intersection_over_union_per_class = iou_per_class
mean_intersection_over_union = mean_iou


def th_confusion_matrix(y_true, y_pred, num_classes=None, to_dense=True):
    """Signature parity with ``ever/metric/function.py:4-26``: the 4th
    positional is ``to_dense`` (a dense CM is always returned here — there
    is no sparse detour), NOT ignore_index; counts EVERY in-range pixel
    like the reference (no 255 filtering at this level)."""
    del to_dense
    y_true = jnp.asarray(y_true)
    y_pred = jnp.asarray(y_pred)
    if num_classes is None:
        num_classes = int(jnp.maximum(jnp.max(y_true), jnp.max(y_pred))) + 1
    return confusion_matrix(y_true, y_pred, int(num_classes), ignore_index=-1)


th_overall_accuracy_score = overall_accuracy_score
th_average_accuracy_score = average_accuracy_score
th_cohen_kappa_score = cohen_kappa_score
th_intersection_over_union_per_class = iou_per_class
th_mean_intersection_over_union = mean_iou

__all__ += [
    'intersection_over_union_per_class', 'mean_intersection_over_union',
    'th_confusion_matrix', 'th_overall_accuracy_score',
    'th_average_accuracy_score', 'th_cohen_kappa_score',
    'th_intersection_over_union_per_class', 'th_mean_intersection_over_union',
]
