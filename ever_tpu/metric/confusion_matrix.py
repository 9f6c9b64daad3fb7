"""Streaming confusion-matrix accumulator.

Parity: ``ever/metric/confusion_matrix.py:6-40``.  Where the reference builds
scipy sparse COO matrices on the CPU per batch, here the per-batch CM is a
dense on-device ``bincount`` (``metric/function.py``) and only the tiny
``[C, C]`` result crosses to the host for accumulation.
"""

from __future__ import annotations

import numpy as np

from ever_tpu.metric.function import confusion_matrix as _cm

__all__ = ['ConfusionMatrix']


class ConfusionMatrix:
    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self._total = np.zeros((num_classes, num_classes), np.float64)

    def forward(self, y_true, y_pred) -> np.ndarray:
        """Accumulate one batch; accepts device or host arrays of labels.
        ``y_pred`` may be [..., C] probabilities/logits (argmax taken) or
        integer predictions."""
        import jax.numpy as jnp
        y_true = jnp.asarray(y_true)
        y_pred = jnp.asarray(y_pred)
        if y_pred.ndim == y_true.ndim + 1:
            y_pred = jnp.argmax(y_pred, axis=-1)
        cm = np.asarray(_cm(y_true, y_pred, self.num_classes, self.ignore_index))
        self._total += cm
        return cm

    update = forward

    @property
    def dense_cm(self) -> np.ndarray:
        return self._total.copy()

    # reference-surface alias (there is no sparse detour any more)
    @property
    def sparse_cm(self) -> np.ndarray:
        return self._total.copy()

    def reset(self) -> None:
        self._total = np.zeros((self.num_classes, self.num_classes), np.float64)

    @staticmethod
    def plot(confusion_matrix):
        raise NotImplementedError
