"""Invertible batch-transform contract (used by test-time augmentation).

Parity: ``ever/interface/transform_base.py:5-65``.  Layout note: the TPU
stack is NHWC-native, so transforms operate on 4-D ``[batch, height, width,
channel]`` arrays (the reference is NCHW).  The built-in round-trip harness
``Transform.unit_test`` is preserved — it is also the model for our pytest
suite (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


class Transform:
    """Invertible transform over NHWC batches."""

    def transform(self, inputs):
        """Args: 4-D array ``[batch, height, width, channel]``."""
        raise NotImplementedError

    def inv_transform(self, transformed_inputs):
        """Inverse transformation back to the original frame."""
        raise NotImplementedError

    @staticmethod
    def unit_test(transform: 'Transform') -> None:
        """Assert ``inv_transform(transform(x)) == x`` (parity:
        ``transform_base.py:31-36``)."""
        import jax.numpy as jnp
        inputs = jnp.broadcast_to(
            jnp.arange(128 * 128, dtype=jnp.float32).reshape(1, 128, 128, 1),
            (2, 128, 128, 32)).copy()
        out = transform.inv_transform(transform.transform(inputs))
        np.testing.assert_almost_equal(np.asarray(out), np.asarray(inputs))


class MultiTransform(list):
    """Apply a list of invertible transforms and invert element-wise
    (parity: ``transform_base.py:39-65``)."""

    def __init__(self, *transforms):
        super().__init__()
        if not all(isinstance(t, Transform) for t in transforms):
            raise TypeError('MultiTransform accepts Transform instances only')
        self._trans_list = transforms
        self.extend(transforms)

    def transform(self, inputs):
        return [t.transform(inputs) for t in self._trans_list]

    def inv_transform(self, transformed_inputs):
        return [t.inv_transform(ti) for ti, t in zip(transformed_inputs, self._trans_list)]


__all__ = ['Transform', 'MultiTransform']
