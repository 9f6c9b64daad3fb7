"""Invertible NHWC batch transforms + test-time augmentation.

Parity: ``ever/magic/transform/segm.py:8-88`` (Identity/Rotate90k/
HorizontalFlip/VerticalFlip/Transpose/Scale) and ``tta.py:11-42``.  NHWC:
spatial axes are (1, 2).  TTA additionally offers a vmapped dihedral-group
fast path (``d4_tta``) that compiles the 8 variants into one program.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ever_tpu.interface.transform_base import MultiTransform, Transform
from ever_tpu.module.ops import resize

__all__ = ['Identity', 'Rotate90k', 'HorizontalFlip', 'VerticalFlip',
           'Transpose', 'Scale', 'tta', 'TestTimeAugmentation', 'd4_tta']


class Identity(Transform):
    def transform(self, inputs):
        return inputs

    def inv_transform(self, transformed_inputs):
        return transformed_inputs


class Rotate90k(Transform):
    def __init__(self, k: int = 1):
        if k not in (1, 2, 3):
            raise ValueError('k must be 1, 2 or 3')
        self.k = k

    def transform(self, inputs):
        return jnp.rot90(inputs, self.k, axes=(1, 2))

    def inv_transform(self, transformed_inputs):
        return jnp.rot90(transformed_inputs, 4 - self.k, axes=(1, 2))


class HorizontalFlip(Transform):
    def transform(self, inputs):
        return jnp.flip(inputs, axis=2)

    inv_transform = transform


class VerticalFlip(Transform):
    def transform(self, inputs):
        return jnp.flip(inputs, axis=1)

    inv_transform = transform


class Transpose(Transform):
    def transform(self, inputs):
        return jnp.swapaxes(inputs, 1, 2)

    inv_transform = transform


class Scale(Transform):
    """Bilinear rescale whose inverse restores the LAST transformed shape.

    Stateful by reference design (``ever/magic/transform/segm.py:71-88``
    stores ``input_shape`` on the instance the same way): do not share one
    instance across interleaved transform/inv_transform sequences or
    threads — construct one per pipeline.
    """

    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 scale_factor: Optional[float] = None):
        if (size is None) == (scale_factor is None):
            # fail here, not as a TypeError deep inside resize()
            raise ValueError('Scale needs exactly one of size or '
                             f'scale_factor (got size={size!r}, '
                             f'scale_factor={scale_factor!r})')
        self.size = size
        self.scale_factor = scale_factor
        self.input_shape = None

    def transform(self, inputs):
        self.input_shape = inputs.shape
        if self.size is not None:
            return resize(inputs, shape=self.size, method='bilinear')
        return resize(inputs, scale=self.scale_factor, method='bilinear')

    def inv_transform(self, transformed_inputs):
        return resize(transformed_inputs, shape=self.input_shape[1:3],
                      method='bilinear')


def tta(model: Callable, image, tta_config: Sequence[Transform]):
    """Apply each transform, forward, invert, average
    (parity: ``tta.py:11-23``)."""
    trans = MultiTransform(*tta_config)
    images = trans.transform(image)
    outs = [model(im) for im in images]
    outs = trans.inv_transform(outs)
    return sum(outs) / len(outs)


class TestTimeAugmentation:
    """Callable module wrapper (parity: ``tta.py:26-42``)."""

    def __init__(self, module: Callable, tta_config: Sequence[Transform]):
        self.module = module
        self.trans = MultiTransform(*tta_config)

    def __call__(self, image):
        images = self.trans.transform(image)
        outs = [self.module(im) for im in images]
        outs = self.trans.inv_transform(outs)
        return sum(outs) / len(outs)


def d4_tta(model: Callable, image: jnp.ndarray) -> jnp.ndarray:
    """Full dihedral-group TTA in one compiled program.

    The 8 symmetries of the square (4 rotations × optional flip) are stacked
    on a new leading axis and predicted with one batched call — on TPU this
    keeps the MXU busy instead of running 8 separate forwards.
    ``image``: [N, H, W, C] with H == W.
    """
    variants = []
    for flip in (False, True):
        base = jnp.flip(image, axis=2) if flip else image
        for k in range(4):
            variants.append(jnp.rot90(base, k, axes=(1, 2)))
    stacked = jnp.concatenate(variants, axis=0)          # [8N, H, W, C]
    preds = model(stacked)
    outs = jnp.split(preds, 8, axis=0)
    restored = []
    i = 0
    for flip in (False, True):
        for k in range(4):
            y = jnp.rot90(outs[i], 4 - k, axes=(1, 2))
            if flip:
                y = jnp.flip(y, axis=2)
            restored.append(y)
            i += 1
    return sum(restored) / 8.0
