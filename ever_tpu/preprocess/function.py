"""Functional preprocessing kernels (jnp, NHWC).

Parity: ``ever/preprocess/function.py:9-83`` (``th_mean_std_normalize``,
``th_divisible_pad``, ``th_pad_to_size``; ImageNet mean/std in 0-255 space).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

# default ImageNet statistics in 0-255 space (parity: ``function.py:9``)
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)

__all__ = ['mean_std_normalize', 'divisible_pad', 'pad_to_size',
           'IMAGENET_MEAN', 'IMAGENET_STD']


def mean_std_normalize(image: jnp.ndarray,
                       mean: Sequence[float] = IMAGENET_MEAN,
                       std: Sequence[float] = IMAGENET_STD) -> jnp.ndarray:
    """(x - mean) / std over the channel dim (any leading dims)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (image.astype(jnp.float32) - mean) / std


def divisible_pad(image: jnp.ndarray, size_divisor: int,
                  value: float = 0.0) -> jnp.ndarray:
    """Bottom/right pad H and W to multiples of ``size_divisor``
    (parity: ``function.py:35-64``).  Works on [..., H, W, C] and bare
    [H, W] masks (the reference handles dim()==2 explicitly)."""
    if image.ndim == 2:
        h, w = image.shape
        nh = math.ceil(h / size_divisor) * size_divisor
        nw = math.ceil(w / size_divisor) * size_divisor
        return jnp.pad(image, [(0, nh - h), (0, nw - w)],
                       constant_values=value)
    h, w = image.shape[-3], image.shape[-2]
    nh = math.ceil(h / size_divisor) * size_divisor
    nw = math.ceil(w / size_divisor) * size_divisor
    pad = [(0, 0)] * (image.ndim - 3) + [(0, nh - h), (0, nw - w), (0, 0)]
    return jnp.pad(image, pad, constant_values=value)


def pad_to_size(image: jnp.ndarray, size: Tuple[int, int],
                value: float = 0.0) -> jnp.ndarray:
    """Bottom/right pad to at least ``size`` (parity: ``function.py:67-83``);
    accepts bare [H, W] masks like :func:`divisible_pad`."""
    if image.ndim == 2:
        h, w = image.shape
        nh, nw = max(size[0], h), max(size[1], w)
        return jnp.pad(image, [(0, nh - h), (0, nw - w)],
                       constant_values=value)
    h, w = image.shape[-3], image.shape[-2]
    nh, nw = max(size[0], h), max(size[1], w)
    pad = [(0, 0)] * (image.ndim - 3) + [(0, nh - h), (0, nw - w), (0, 0)]
    return jnp.pad(image, pad, constant_values=value)


# Reference th_ spellings (``ever/preprocess/function.py:9-83``): the torch
# tensor family maps onto the single device-array family here.
th_mean_std_normalize = mean_std_normalize
th_divisible_pad = divisible_pad
th_pad_to_size = pad_to_size

__all__ += ['th_mean_std_normalize', 'th_divisible_pad', 'th_pad_to_size']
