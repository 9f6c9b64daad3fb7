"""Tensor-pipeline compatibility spellings (reference ``preprocess/thcomm.py``).

The reference keeps a second transform family operating on torch tensors
(``thcomm.py``/``thsegm.py``, re-used by dataset pipelines after collation).
Here the device-array analog operates on jax/numpy arrays in the framework's
native **HWC** layout; spellings and the tuple-splat ``Pipeline`` contract
match the reference so ported pipelines run with an import rename.  The
performance path for on-device batch augmentation is
``ever_tpu.preprocess.device.batch_augment`` (fused, PRNG-keyed).
"""

from __future__ import annotations

import jax.numpy as jnp

from ever_tpu.core.to import to_tensor
from ever_tpu.preprocess import function as pF

__all__ = ['Pipeline', 'FuncWrapper', 'ToTensor', 'THChannelFirst',
           'THChannelFirst2', 'THMeanStdNormalize', 'THMeanStdNormalize2',
           'THDivisiblePad']


class Pipeline:
    """Sequential transform container (parity: ``thcomm.py:7-14`` — modules
    consuming/returning tuples are splatted into the next stage)."""

    def __init__(self, modules):
        self.modules = list(modules)

    def __call__(self, *inputs):
        for module in self.modules:
            if isinstance(inputs, tuple):
                inputs = module(*inputs)
            else:
                inputs = module(inputs)
        return inputs


class FuncWrapper:
    """Wrap a plain callable (parity: ``thcomm.py:17-23``)."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, *inputs):
        return self.fn(*inputs)


class ToTensor:
    """Convert inputs to device arrays (parity: ``thcomm.py:26-28``)."""

    def __call__(self, *inputs):
        return to_tensor(inputs)


class THChannelFirst:
    """Layout normalizer (parity: ``thcomm.py:31-39``).

    The reference forces CHW because torch convs want channel-first; the TPU
    framework's native layout is channel-LAST, so this adapter ensures HWC —
    ported pipelines keep working and end up in the layout the models expect.
    Exact dual of the reference heuristic: the reference classifies an input
    as already-CHW iff ``size(0) <= 8`` — we transpose exactly those inputs
    (CHW → HWC) and pass everything else through as HWC, so >8-band
    hyperspectral HWC stacks are NOT scrambled.
    """

    @staticmethod
    def _is_channel_last(x) -> bool:
        return x.shape[0] > 8

    def __call__(self, image):
        if THChannelFirst._is_channel_last(image):
            return image
        return jnp.transpose(image, (1, 2, 0))


class THChannelFirst2(THChannelFirst):
    """Image+aux variant (parity: ``thcomm.py:42-44``)."""

    def __call__(self, image, other):
        return super().__call__(image), other


class THMeanStdNormalize:
    """0-255-space normalize (parity: ``thcomm.py:47-57``)."""

    def __init__(self, mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375)):
        self._m = mean
        self._s = std

    def __call__(self, image):
        return pF.mean_std_normalize(jnp.asarray(image, jnp.float32),
                                     self._m, self._s)


class THMeanStdNormalize2(THMeanStdNormalize):
    """Image+aux variant (parity: ``thcomm.py:60-66``)."""

    def __call__(self, image, other):
        return super().__call__(image), other


class THDivisiblePad:
    """Bottom/right pad image+mask to a size multiple (parity:
    ``thcomm.py:69-90``)."""

    def __init__(self, size_divisor: int, mask_pad_value: int = 255,
                 pad_to_size=None):
        self.size_divisor = size_divisor
        self.mask_pad_value = mask_pad_value
        self.pad_to_size = pad_to_size

    def __call__(self, image, mask=None):
        image = pF.divisible_pad(image, self.size_divisor)
        if self.pad_to_size is not None:
            image = pF.pad_to_size(image, self.pad_to_size)
        if mask is not None:
            m = jnp.asarray(mask)[..., None]        # HW → HWC for the padders
            m = pF.divisible_pad(m, self.size_divisor,
                                 value=self.mask_pad_value)
            if self.pad_to_size is not None:
                m = pF.pad_to_size(m, self.pad_to_size,
                                   value=self.mask_pad_value)
            mask = m[..., 0]
        return image, mask
