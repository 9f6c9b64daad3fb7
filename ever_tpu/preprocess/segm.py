"""Host-side joint image+mask transforms (numpy, HWC).

Parity: ``ever/preprocess/segm.py:16-177`` and ``thsegm.py``/``thcomm.py``
unified into one numpy family (the reference keeps three parallel families —
PIL, torch-tensor and albumentations; the TPU rebuild standardizes on numpy
host transforms feeding the on-device pipeline in ``preprocess/device.py``).

Every transform is ``t(image[H,W,C], mask[H,W]) -> (image, mask)`` with its
own ``np.random.Generator`` (seedable for determinism).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ['Compose', 'CustomOp', 'ToArray', 'RandomHorizontalFlip',
           'RandomVerticalFlip', 'RandomTranspose', 'RandomRotate90K',
           'RandomScale', 'RandomDiscreteScale', 'RandomCrop', 'DivisiblePad',
           'FixedPad', 'MeanStdNormalize', 'ChannelFirstToLast']



class _ForkSafeRNG:
    """``np.random.Generator`` facade that reseeds itself in forked children.

    Transforms are constructed in the parent process; a fork-based loader
    worker would otherwise inherit the parent's generator STATE and every
    worker would replay the identical augmentation stream.  In the creating
    process this is exactly ``default_rng(seed)``; a forked child draws from
    a deterministic per-(seed, pid) stream.
    """

    def __init__(self, seed=None):
        import os
        self._seed = seed
        self._pid = os.getpid()
        self._gen = np.random.default_rng(seed)

    def __getattr__(self, name):
        import os
        pid = os.getpid()
        if pid != self._pid:
            self._pid = pid
            self._gen = np.random.default_rng(
                np.random.SeedSequence(entropy=self._seed, spawn_key=(pid,)))
        return getattr(self._gen, name)


def _map_mask(mask, fn):
    """Apply ``fn`` to a single HW mask or each mask in a list/tuple
    (multi-task labels accepted by ``ToArray``)."""
    if mask is None:
        return None
    if isinstance(mask, (list, tuple)):
        return type(mask)(fn(m) for m in mask)
    return fn(mask)


class Compose:
    """Sequential pipeline (parity: ``preprocess/comm.py:4-20``): with no
    mask, transforms are called image-only and a bare image is returned."""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, image, mask=None):
        if mask is None:
            for t in self.transforms:
                out = t(image, mask)
                image = out[0] if isinstance(out, tuple) else out
            return image
        for t in self.transforms:
            image, mask = t(image, mask)
        return image, mask


class CustomOp:
    """Wrap a plain callable (parity: ``comm.py:23-34``): image-only fns
    are called ``fn(image)`` when there is no mask."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, image, mask=None):
        if mask is None:
            return self.fn(image)
        return self.fn(image, mask)


class ToArray:
    """float32 image / int32 mask(s) (parity: joint ``ToTensor``,
    ``segm.py:16-34`` and the multi-mask variant ``albu.py:22-28``; 255-keep
    is the default since masks stay integer).  ``mask`` may be a single HW
    array or a list of them (multi-task labels)."""

    def __call__(self, image, mask=None):
        image = np.asarray(image, np.float32)
        if mask is not None:
            if isinstance(mask, (list, tuple)):
                mask = type(mask)(np.asarray(m, np.int32) for m in mask)
            else:
                mask = np.asarray(mask, np.int32)
        return image, mask


class _RandomP:
    def __init__(self, p: float = 0.5, seed: Optional[int] = None):
        self.p = p
        self.rng = _ForkSafeRNG(seed)


class RandomHorizontalFlip(_RandomP):
    def __call__(self, image, mask=None):
        if self.rng.random() < self.p:
            image = np.ascontiguousarray(image[:, ::-1])
            mask = _map_mask(mask, lambda m: np.ascontiguousarray(m[:, ::-1]))
        return image, mask


class RandomVerticalFlip(_RandomP):
    def __call__(self, image, mask=None):
        if self.rng.random() < self.p:
            image = np.ascontiguousarray(image[::-1])
            mask = _map_mask(mask, lambda m: np.ascontiguousarray(m[::-1]))
        return image, mask


class RandomTranspose(_RandomP):
    def __call__(self, image, mask=None):
        if self.rng.random() < self.p:
            image = np.ascontiguousarray(np.swapaxes(image, 0, 1))
            mask = _map_mask(mask,
                             lambda m: np.ascontiguousarray(np.swapaxes(m, 0, 1)))
        return image, mask


class RandomRotate90K:
    """Rotate by k quarter turns with k drawn UNIFORMLY from ``k``
    (parity: ``segm.py:70-82``; the reference default (0,1,2,3) gives the
    identity probability 0.25).  ``p`` optionally gates applying any
    rotation (legacy surface): k=0 with prob 1-p, else uniform over the
    nonzero entries."""

    def __init__(self, k: Sequence[int] = (0, 1, 2, 3),
                 p: Optional[float] = None, seed: Optional[int] = None):
        self.k = tuple(int(x) for x in k)
        self.p = p
        self.rng = _ForkSafeRNG(seed)

    def __call__(self, image, mask=None):
        if self.p is not None:
            ks = [x for x in self.k if x] or [1, 2, 3]
            k = int(self.rng.choice(ks)) if self.rng.random() < self.p else 0
        else:
            k = int(self.rng.choice(self.k))
        if k:
            image = np.ascontiguousarray(np.rot90(image, k, axes=(0, 1)))
            mask = _map_mask(
                mask, lambda m: np.ascontiguousarray(np.rot90(m, k, axes=(0, 1))))
        return image, mask


def _resize_nearest(arr: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    ys = (np.arange(shape[0]) * arr.shape[0] / shape[0]).astype(np.int64)
    xs = (np.arange(shape[1]) * arr.shape[1] / shape[1]).astype(np.int64)
    return arr[ys][:, xs]


def _resize_bilinear(arr: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    h, w = arr.shape[:2]
    nh, nw = shape
    ys = np.linspace(0, h - 1, nh)
    xs = np.linspace(0, w - 1, nw)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    a = arr.astype(np.float32)
    if a.ndim == 2:
        a = a[..., None]
        squeeze = True
    else:
        squeeze = False
    out = (a[y0][:, x0] * (1 - wy) * (1 - wx) + a[y1][:, x0] * wy * (1 - wx)
           + a[y0][:, x1] * (1 - wy) * wx + a[y1][:, x1] * wy * wx)
    return out[..., 0] if squeeze else out


class RandomScale:
    """Scale jitter (parity: ``segm.py:85-101``).

    The reference draws from a DISCRETE ``scales`` list and floor-snaps to
    ``size_divisor`` (``int(h*s)//d*d``).  Pass ``scales=[...]`` for that
    exact behavior; ``scale_range=(lo, hi)`` keeps the continuous-uniform
    variant (additive surface).  Snapped sizes are floored like the
    reference but never below one divisor (a 0-sized image would crash)."""

    def __init__(self, scales: Optional[Sequence[float]] = None,
                 size_divisor: Optional[int] = 32,
                 seed: Optional[int] = None,
                 scale_range: Optional[Tuple[float, float]] = None):
        if scales is not None and scale_range is not None:
            raise ValueError('pass scales OR scale_range, not both')
        self.scales = list(scales) if scales is not None else None
        self.scale_range = scale_range or (0.5, 2.0)
        self.size_divisor = size_divisor
        self.rng = _ForkSafeRNG(seed)

    def _target(self, h, w, s):
        nh, nw = int(h * s), int(w * s)
        if self.size_divisor:
            d = self.size_divisor
            nh = max(nh // d * d, d)
            nw = max(nw // d * d, d)
        return nh, nw

    def __call__(self, image, mask=None):
        s = (float(self.rng.choice(self.scales)) if self.scales is not None
             else float(self.rng.uniform(*self.scale_range)))
        nh, nw = self._target(image.shape[0], image.shape[1], s)
        image = _resize_bilinear(image, (nh, nw))
        mask = _map_mask(mask, lambda m: _resize_nearest(m, (nh, nw)))
        return image, mask


class RandomDiscreteScale(RandomScale):
    """Pick from a discrete scale set (parity: ``preprocess/albu.py:13-19``)."""

    def __init__(self, scales: Sequence[float], p: float = 0.5,
                 size_divisor: Optional[int] = None, seed: Optional[int] = None):
        super().__init__(scales=list(scales), size_divisor=size_divisor,
                         seed=seed)
        self.p = p

    def __call__(self, image, mask=None):
        if self.rng.random() >= self.p:
            return image, mask
        s = float(self.rng.choice(self.scales))
        nh, nw = self._target(image.shape[0], image.shape[1], s)
        image = _resize_bilinear(image, (nh, nw))
        mask = _map_mask(mask, lambda m: _resize_nearest(m, (nh, nw)))
        return image, mask


class RandomCrop:
    """Fixed-size crop with pad-if-small (mask pad 255)
    (parity: ``segm.py:104-129``)."""

    def __init__(self, size: Tuple[int, int], image_pad_value: float = 0.0,
                 mask_pad_value: int = 255, seed: Optional[int] = None):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.image_pad_value = image_pad_value
        self.mask_pad_value = mask_pad_value
        self.rng = _ForkSafeRNG(seed)

    def __call__(self, image, mask=None):
        th, tw = self.size
        h, w = image.shape[:2]
        if h < th or w < tw:
            ph, pw = max(th - h, 0), max(tw - w, 0)
            image = np.pad(image, ((0, ph), (0, pw), (0, 0)),
                           constant_values=self.image_pad_value)
            mask = _map_mask(mask, lambda m: np.pad(
                m, ((0, ph), (0, pw)), constant_values=self.mask_pad_value))
            h, w = image.shape[:2]
        y = int(self.rng.integers(0, h - th + 1))
        x = int(self.rng.integers(0, w - tw + 1))
        image = image[y:y + th, x:x + tw]
        mask = _map_mask(mask, lambda m: m[y:y + th, x:x + tw])
        return image, mask


class DivisiblePad:
    """Pad to size multiples (parity: ``segm.py:132-155``)."""

    def __init__(self, size_divisor: int, image_pad_value: float = 0.0,
                 mask_pad_value: int = 255):
        self.size_divisor = size_divisor
        self.image_pad_value = image_pad_value
        self.mask_pad_value = mask_pad_value

    def __call__(self, image, mask=None):
        h, w = image.shape[:2]
        nh = math.ceil(h / self.size_divisor) * self.size_divisor
        nw = math.ceil(w / self.size_divisor) * self.size_divisor
        image = np.pad(image, ((0, nh - h), (0, nw - w), (0, 0)),
                       constant_values=self.image_pad_value)
        mask = _map_mask(mask, lambda m: np.pad(
            m, ((0, nh - h), (0, nw - w)), constant_values=self.mask_pad_value))
        return image, mask


class FixedPad:
    """Pad to an exact minimum size (parity: ``segm.py:158-177`` and
    ``albu.ConstantPad``, ``albu.py:31-78``)."""

    def __init__(self, size: Tuple[int, int], image_pad_value: float = 0.0,
                 mask_pad_value: int = 255):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.image_pad_value = image_pad_value
        self.mask_pad_value = mask_pad_value

    def __call__(self, image, mask=None):
        h, w = image.shape[:2]
        ph, pw = max(self.size[0] - h, 0), max(self.size[1] - w, 0)
        image = np.pad(image, ((0, ph), (0, pw), (0, 0)),
                       constant_values=self.image_pad_value)
        mask = _map_mask(mask, lambda m: np.pad(
            m, ((0, ph), (0, pw)), constant_values=self.mask_pad_value))
        return image, mask


class MeanStdNormalize:
    """0-255-space normalization (parity: ``thcomm.THMeanStdNormalize``).

    uint8 inputs take the native fused normalize+cast kernel
    (``ever_tpu.native.normalize_u8`` — one pass, GIL released, threads);
    other dtypes use numpy.  Identical outputs (``tests/test_native.py``).
    """

    def __init__(self, mean=None, std=None):
        from ever_tpu.preprocess.function import IMAGENET_MEAN, IMAGENET_STD
        self.mean = np.asarray(mean if mean is not None else IMAGENET_MEAN, np.float32)
        self.std = np.asarray(std if std is not None else IMAGENET_STD, np.float32)

    def __call__(self, image, mask=None):
        image = np.asarray(image)
        if image.dtype == np.uint8 and image.ndim >= 3 and image.shape[-1] <= 64:
            from ever_tpu.native import normalize_u8
            return normalize_u8(image, self.mean, self.std), mask
        return (image.astype(np.float32) - self.mean) / self.std, mask


class SpaceToDepth:
    """Host-side 2x2 space-to-depth: [H,W,C] → [H/2,W/2,4C].

    Feeds encoders configured with ``stem='s2d_input'`` — the MXU-friendly
    stem layout is produced for free during batch assembly instead of as a
    device-side transpose (~0.55 ms/step at 512² b8 on v5e).  The mask is
    untouched (labels stay at full resolution).
    """

    def __init__(self, block: int = 2):
        self.block = int(block)

    def __call__(self, image, mask=None):
        b = self.block
        image = np.asarray(image)
        h, w, c = image.shape
        image = image.reshape(h // b, b, w // b, b, c)
        image = np.ascontiguousarray(image.transpose(0, 2, 1, 3, 4))
        return image.reshape(h // b, w // b, b * b * c), mask


class ChannelFirstToLast:
    """CHW → HWC adapter for reading NCHW sources (the NHWC analog of
    ``thcomm.THChannelFirst``)."""

    def __call__(self, image, mask=None):
        return np.ascontiguousarray(np.moveaxis(image, 0, -1)), mask


def transpose(img):
    """H/W transpose of an HWC array (parity: ``segm.py:10-13``, which is
    PIL-only; arrays are the native currency here)."""
    img = np.asarray(img)
    axes = (1, 0) + tuple(range(2, img.ndim))
    return np.transpose(img, axes)


# Reference spelling (``ever/preprocess/segm.py:16-34``): the joint
# image+mask "to tensor" — here arrays stay NHWC numpy (255-keep default).
ToTensor = ToArray
__all__ += ['ToTensor']
