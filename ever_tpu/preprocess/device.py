"""Fused on-device augmentation (the TPU-native preprocessing path).

Reference augmentations run per-sample on CPU workers (albumentations / PIL /
torch-tensor families, SURVEY.md §2.5).  On TPU the winning layout is: host
loader does decode + crop to fixed shape, and the *random geometric/photo
ops run on device, batched, inside jit* — they are all gathers/slices/
arithmetic, which XLA fuses into the first conv's input pipeline
(BASELINE.json north star: "fused JAX/Pallas image kernels").

All ops are shape-preserving and vmapped over the batch with per-sample PRNG
keys, so the whole pipeline is one compiled program with zero host sync.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ever_tpu.preprocess.function import IMAGENET_MEAN, IMAGENET_STD

__all__ = ['dihedral_augment', 'random_crop', 'batch_augment']


def _apply_d4(image: jnp.ndarray, k: jnp.ndarray, flip: jnp.ndarray) -> jnp.ndarray:
    """Apply rot90^k then optional horizontal flip to one HWC/HW array.
    Requires H == W (square crops) so all branches share one shape."""
    rotated = jax.lax.switch(k, [
        lambda x: x,
        lambda x: jnp.rot90(x, 1, axes=(0, 1)),
        lambda x: jnp.rot90(x, 2, axes=(0, 1)),
        lambda x: jnp.rot90(x, 3, axes=(0, 1)),
    ], image)
    return jax.lax.cond(flip, lambda x: jnp.flip(x, axis=1), lambda x: x, rotated)


def dihedral_augment(key: jax.Array, image: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None):
    """Random symmetry of the square for one sample (image HWC, mask HW)."""
    k_key, f_key = jax.random.split(key)
    k = jax.random.randint(k_key, (), 0, 4)
    flip = jax.random.bernoulli(f_key)
    image = _apply_d4(image, k, flip)
    if mask is None:
        return image, None
    return image, _apply_d4(mask, k, flip)


def random_crop(key: jax.Array, image: jnp.ndarray, size: Tuple[int, int],
                mask: Optional[jnp.ndarray] = None):
    """Static-shape random crop of one HWC sample via dynamic_slice."""
    h, w = image.shape[:2]
    th, tw = size
    y = jax.random.randint(key, (), 0, max(h - th, 0) + 1)
    x = jax.random.randint(jax.random.fold_in(key, 1), (), 0, max(w - tw, 0) + 1)
    img = jax.lax.dynamic_slice(image, (y, x, 0), (th, tw, image.shape[2]))
    if mask is None:
        return img, None
    m = jax.lax.dynamic_slice(mask, (y, x), (th, tw))
    return img, m


@partial(jax.jit, static_argnames=('crop_size', 'dihedral', 'normalize'))
def batch_augment(key: jax.Array, images: jnp.ndarray,
                  masks: Optional[jnp.ndarray] = None,
                  crop_size: Optional[Tuple[int, int]] = None,
                  dihedral: bool = True,
                  normalize: bool = True,
                  mean: Sequence[float] = IMAGENET_MEAN,
                  std: Sequence[float] = IMAGENET_STD):
    """Fused batch pipeline: [random crop] → [D4 symmetry] → [normalize].

    ``images``: [N, H, W, C] (0-255 float or uint8); ``masks``: [N, H, W].
    Returns (images fp32 normalized, masks unchanged dtype).
    """
    n = images.shape[0]
    keys = jax.random.split(key, n)
    if crop_size is not None:
        crop = partial(random_crop, size=crop_size)
        if masks is not None:
            images, masks = jax.vmap(crop)(keys, images, mask=masks)
        else:
            images, _ = jax.vmap(lambda k, im: crop(k, im))(keys, images)
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys)
    if dihedral:
        if masks is not None:
            images, masks = jax.vmap(dihedral_augment)(keys, images, masks)
        else:
            images, _ = jax.vmap(lambda k, im: dihedral_augment(k, im))(keys, images)
    if normalize:
        images = (images.astype(jnp.float32) - jnp.asarray(mean, jnp.float32)) \
            / jnp.asarray(std, jnp.float32)
    return images, masks
