"""Tensor-space segmentation transforms (reference ``preprocess/thsegm.py``).

Device-array analogs of the reference's torch-tensor random transforms,
operating on HWC image / HW mask arrays (jnp or numpy).  Randomness comes
from ``np.random`` exactly like the reference (``thsegm.py:25,57,91``) — the
fused, PRNG-keyed on-device path is
``ever_tpu.preprocess.device.batch_augment``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ['THRandomRotate90k', 'THRandomHorizontalFlip',
           'THRandomVerticalFlip', 'THRandomCrop', 'THRandomScale']


def _ret(image, mask):
    return (image, mask) if mask is not None else image


class THRandomRotate90k:
    """Rotate image+mask by 90°·k (parity: ``thsegm.py:7-37``)."""

    def __init__(self, k=None):
        self.k = k

    def __call__(self, images, masks=None):
        k = int(np.random.choice([0, 1, 2, 3])) if self.k is None else self.k
        if k == 0:
            return _ret(images, masks)
        images = jnp.rot90(jnp.asarray(images), k, (0, 1))
        if masks is not None:
            masks = jnp.rot90(jnp.asarray(masks), k, (0, 1))
        return _ret(images, masks)


class _THRandomFlip:
    axis: int

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, images, masks=None):
        if self.p < np.random.uniform():
            return _ret(images, masks)
        images = jnp.flip(jnp.asarray(images), axis=self.axis)
        if masks is not None:
            masks = jnp.flip(jnp.asarray(masks), axis=self.axis)
        return _ret(images, masks)


class THRandomHorizontalFlip(_THRandomFlip):
    """Parity: ``thsegm.py:40-70``."""
    axis = 1


class THRandomVerticalFlip(_THRandomFlip):
    """Parity: ``thsegm.py:73-103``."""
    axis = 0


class THRandomCrop:
    """Pad-then-random-crop to ``crop_size`` (parity: ``thsegm.py:106-147``)."""

    def __init__(self, crop_size=(512, 512)):
        self.crop_size = crop_size

    def __call__(self, images, masks=None):
        images = jnp.asarray(images)
        c_h, c_w = self.crop_size
        im_h, im_w = images.shape[:2]
        ph, pw = max(c_h - im_h, 0), max(c_w - im_w, 0)
        if ph or pw:
            images = jnp.pad(images, ((0, ph), (0, pw), (0, 0)))
            if masks is not None:
                masks = jnp.pad(jnp.asarray(masks), ((0, ph), (0, pw)))
        im_h, im_w = images.shape[:2]
        ymin = int(np.random.randint(0, im_h - c_h + 1))
        xmin = int(np.random.randint(0, im_w - c_w + 1))
        images = images[ymin:ymin + c_h, xmin:xmin + c_w, :]
        if masks is not None:
            masks = jnp.asarray(masks)[ymin:ymin + c_h, xmin:xmin + c_w]
        return (images, masks) if masks is not None else (images,)


class THRandomScale:
    """Discrete-step random rescale (parity: ``thsegm.py:150-177`` —
    the scale is drawn once at construction, like the reference)."""

    def __init__(self, scale_range=(0.5, 2.0), scale_step=0.25):
        factors = np.linspace(
            scale_range[0], scale_range[1],
            int((scale_range[1] - scale_range[0]) / scale_step) + 1)
        self.scale_factor = float(np.random.choice(factors))

    def __call__(self, images, masks=None):
        from ever_tpu.module.ops import resize
        images = jnp.asarray(images, jnp.float32)
        out = resize(images[None], scale=self.scale_factor,
                     method='bilinear', align_corners=True)[0]
        ret = [out]
        if masks is not None:
            m = jnp.asarray(masks)[None, :, :, None].astype(jnp.float32)
            m = resize(m, scale=self.scale_factor, method='nearest')
            ret.append(m[0, :, :, 0].astype(jnp.asarray(masks).dtype))
        return tuple(ret)
