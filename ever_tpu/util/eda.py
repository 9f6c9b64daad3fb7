"""Exploratory data-analysis helpers for remote-sensing imagery.

Parity: ``ever/util/eda.py`` (thumbnail + multi-binary-mask rendering).
PIL/tifffile are imported lazily; tifffile falls back to PIL for non-tiff.
"""

from __future__ import annotations

import numpy as np

__all__ = ['thumbnail', 'render_multi_binary_mask']


def thumbnail(image_path: str, sample_ratio: float = 0.1):
    from PIL import Image
    img = Image.open(image_path)
    img.thumbnail((int(img.width * sample_ratio), int(img.height * sample_ratio)))
    return img


def _imread(fp: str) -> np.ndarray:
    try:
        import tifffile
        return tifffile.imread(fp)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(fp))


def render_multi_binary_mask(file_paths, indexes, palette):
    """Overlay binary masks into one indexed-color image
    (parity: ``eda.py:13-23``: first-hit-wins ordering)."""
    from PIL import Image
    imgs = [_imread(fp) for fp in file_paths]
    ret = np.zeros_like(imgs[0]).astype(np.uint8, copy=False)
    for img, index in zip(imgs, indexes):
        ret = np.where(ret == 0, index * (img / 255).astype(np.uint8, copy=False), ret)
    out = Image.fromarray(ret)
    out.putpalette(palette)
    return out
