"""Exploratory data-analysis helpers for remote-sensing imagery.

Behavior parity: ``ever/util/eda.py`` (thumbnail + multi-binary-mask
rendering).  PIL/tifffile are imported lazily; tifffile falls back to PIL
for non-tiff sources.
"""

from __future__ import annotations

import numpy as np

__all__ = ['thumbnail', 'render_multi_binary_mask']


def thumbnail(image_path: str, sample_ratio: float = 0.1):
    """Downscale an image on disk to ``sample_ratio`` of its size."""
    from PIL import Image
    img = Image.open(image_path)
    target = (int(img.width * sample_ratio), int(img.height * sample_ratio))
    img.thumbnail(target)
    return img


def _imread(fp: str) -> np.ndarray:
    # tifffile only for tiff sources; PIL for everything else (and as the
    # fallback when tifffile is absent) — routing PNG/JPG through
    # tifffile.imread raises TiffFileError, not ImportError
    if fp.lower().endswith(('.tif', '.tiff')):
        try:
            import tifffile
            return tifffile.imread(fp)
        except ImportError:
            pass
    from PIL import Image
    Image.MAX_IMAGE_PIXELS = None
    return np.asarray(Image.open(fp))


def render_multi_binary_mask(file_paths, indexes, palette):
    """Merge per-class binary mask files into one palettized index image.

    Each file is a 0/255 binary mask; pixel values are integer-divided by
    255 so a mask contributes its class ``index`` where it fires and 0
    elsewhere.  Earlier files win overlaps (a pixel already labeled is
    never overwritten).  Behavior parity: ``ever/util/eda.py:13-23``.
    """
    from PIL import Image
    canvas = None
    for fp, index in zip(file_paths, indexes):
        binary = _imread(fp)
        # integer division: 255 -> 1, anything below stays 0 (uint8 trunc)
        hit = (binary / 255).astype(np.uint8, copy=False) * index
        if canvas is None:
            canvas = np.zeros(binary.shape, np.uint8)
        unlabeled = canvas == 0
        canvas[unlabeled] = hit[unlabeled]
    indexed = Image.fromarray(canvas)
    indexed.putpalette(palette)
    return indexed
