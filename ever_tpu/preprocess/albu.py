"""Albumentations-style compatibility spellings.

The reference exposes three albumentations extensions
(``ever/preprocess/albu.py``, re-exported at ``ever/preprocess/__init__.py:1-4``):
``ToTensor`` (joint image/mask/masks tensor conversion, ``albu.py:22-28``),
``ConstantPad`` (bottom-right pad to a minimum size, ``albu.py:31-78``) and
``RandomDiscreteScale`` (``albu.py:81-95``).  This module maps those
spellings onto the NHWC numpy transform family in
``ever_tpu.preprocess.segm`` so reference configs port by renaming the
import only.  No albumentations dependency: the transforms here are plain
``(image, mask) -> (image, mask)`` callables like the rest of the family.
"""

from __future__ import annotations

from ever_tpu.preprocess.segm import FixedPad, RandomDiscreteScale, ToArray

__all__ = ['ToTensor', 'ConstantPad', 'RandomDiscreteScale']


class ToTensor(ToArray):
    """Reference spelling of :class:`ToArray` (parity: ``albu.py:22-28``).

    The torch version emits CHW tensors; the NHWC framework keeps HWC float32
    images / int32 masks (single mask or list of masks both supported).
    """


class ConstantPad(FixedPad):
    """Pad bottom/right to at least ``(min_height, min_width)`` (parity:
    ``albu.py:31-78`` — the reference pads only bottom/right too)."""

    def __init__(self, min_height: int = 1024, min_width: int = 1024,
                 value=None, mask_value=None, always_apply: bool = False,
                 p: float = 1.0):
        del always_apply, p  # deterministic transform; accepted for parity
        super().__init__((min_height, min_width),
                         image_pad_value=0.0 if value is None else value,
                         mask_pad_value=255 if mask_value is None else mask_value)
