"""Geo-tile patch sampling over large scenes.

The BASELINE north star names "geotile patch sampling" as the data-layer
core: datasets are folders of large rasters (scenes), and training samples
are fixed-size patches cut on a sliding-window grid (the same inward-shifted
box math as inference, ``ever_tpu/magic/sliding_window.py`` — every patch is
full-size, so the batch shape is static).

``GeoTileDataset`` indexes (scene, x, y) patches once at construction, keeps
an LRU of decoded scenes, and yields ``(image HWC float32, mask HW int32)``
numpy pairs ready for the host loader; pixel/geometric augmentation composes
via ``transforms`` (``ever_tpu.preprocess``) or runs fused on device.
Sources: PNG/JPG/TIF via PIL, ``.npy`` via numpy memory-mapping.
"""

from __future__ import annotations

import glob as _glob
import os
import threading
from collections import OrderedDict
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ever_tpu.core import registry
from ever_tpu.interface.dataloader import ERDataset
from ever_tpu.magic.sliding_window import sliding_window

__all__ = ['GeoTileDataset', 'read_raster']


def read_raster(path: str) -> np.ndarray:
    """Decode a scene to numpy (HWC for images, HW for single-band masks)."""
    if path.endswith('.npy'):
        return np.load(path, mmap_mode='r')
    try:
        import tifffile
        if path.endswith(('.tif', '.tiff')):
            return tifffile.imread(path)
    except ImportError:
        pass
    from PIL import Image
    Image.MAX_IMAGE_PIXELS = None   # remote-sensing scenes exceed the default
    return np.asarray(Image.open(path))


class _SceneCache:
    """LRU of decoded scenes.  Thread-safe: the threaded DataLoader fetches
    batches concurrently, so lookup must not race eviction (and a scene
    being decoded by one thread must not be decoded again by another)."""

    def __init__(self, max_items: int = 4):
        self.max_items = max_items
        self._cache: 'OrderedDict[str, np.ndarray]' = OrderedDict()
        self._lock = threading.Lock()
        self._pending: dict = {}   # path -> Event for in-flight decodes

    def get(self, path: str) -> np.ndarray:
        while True:
            with self._lock:
                if path in self._cache:
                    self._cache.move_to_end(path)
                    return self._cache[path]
                ev = self._pending.get(path)
                if ev is None:
                    self._pending[path] = threading.Event()
                    break
            ev.wait()   # another thread is decoding this scene
        try:
            arr = read_raster(path)
            with self._lock:
                self._cache[path] = arr
                if len(self._cache) > self.max_items:
                    self._cache.popitem(last=False)
            return arr
        finally:
            with self._lock:
                self._pending.pop(path).set()


@registry.DATASET.register('geotile')
class GeoTileDataset(ERDataset):
    """Patch-grid dataset over paired (image, mask) scene files.

    Config::

        dict(image_glob='…/images/*.png', mask_glob='…/masks/*.png',
             patch_size=512, stride=512, scene_pairs=None,  # or explicit list
             transforms=None,           # list of (img, mask)->(img, mask)
             cache_scenes=4, mask_dtype='int32')

    Scenes are paired by sorted glob order (or pass ``scene_pairs``
    explicitly).  ``len`` = total patches across scenes.
    """

    def set_default_config(self):
        self._config.update(dict(
            image_glob='',
            mask_glob='',
            scene_pairs=None,
            patch_size=512,
            stride=512,
            transforms=None,
            cache_scenes=4,
            layout='hwc',        # 'hwc' | 's2d' (stem='s2d_input' encoders)
            image_dtype='float32',   # 'uint8' keeps raw bytes for the
                                     # fused native normalize downstream
            mask_dtype='int32',
        ))

    def __init__(self, config=None):
        super().__init__(config)
        cfg = self.config
        if cfg.scene_pairs:
            pairs = [tuple(p) for p in cfg.scene_pairs]
        else:
            images = sorted(_glob.glob(cfg.image_glob)) if cfg.image_glob else []
            masks = sorted(_glob.glob(cfg.mask_glob)) if cfg.mask_glob else []
            if cfg.mask_glob and len(images) != len(masks):
                raise ValueError(
                    f'image/mask scene count mismatch: {len(images)} images vs '
                    f'{len(masks)} masks (mask_glob={cfg.mask_glob!r})')
            pairs = list(zip(images, masks)) if masks else [(i, None) for i in images]
        self.scene_pairs: List[Tuple[str, Optional[str]]] = pairs
        self._cache = _SceneCache(cfg.cache_scenes)

        # build the global patch index: (scene_idx, x0, y0)
        self._index: List[Tuple[int, int, int]] = []
        k, s = int(cfg.patch_size), int(cfg.stride)
        for si, (img_path, _) in enumerate(self.scene_pairs):
            h, w = self._scene_size(img_path)
            if h < k or w < k:
                # sliding_window would clamp the kernel and the fetch paths
                # would then return short patches (np.stack ValueError /
                # native bounds error mid-epoch) — reject up front instead
                raise ValueError(
                    f'scene {img_path!r} is {h}x{w}, smaller than '
                    f'patch_size={k}; pad the scene or lower patch_size')
            boxes = sliding_window((h, w), k, s)
            seen = set()
            for x0, y0, _, _ in boxes:
                key = (int(x0), int(y0))
                if key not in seen:      # edge shifts can duplicate boxes
                    seen.add(key)
                    self._index.append((si, int(x0), int(y0)))

    @staticmethod
    def _scene_size(path: str) -> Tuple[int, int]:
        if path.endswith('.npy'):
            arr = np.load(path, mmap_mode='r')
            return arr.shape[0], arr.shape[1]
        if path.endswith(('.tif', '.tiff')):
            # match read_raster's tifffile-first decode: PIL cannot even open
            # >4-band TIFFs that the fetch path fully supports
            try:
                import tifffile
                with tifffile.TiffFile(path) as tf:
                    shape = tf.pages[0].shape
                return int(shape[0]), int(shape[1])
            except ImportError:
                pass
        from PIL import Image
        Image.MAX_IMAGE_PIXELS = None
        with Image.open(path) as im:
            return im.height, im.width

    def __len__(self) -> int:
        return len(self._index)

    def read_batch(self, indices):
        """Batched fetch fast path (used by ``DataLoader`` when present).

        When every requested patch comes from uint8 scenes and there are no
        python transforms, the whole batch is gathered by ONE native call
        per scene (``ever_tpu.native.extract_tiles`` — parallel memcpy rows,
        GIL released), then converted vectorized.  Returns
        ``NotImplemented`` when the conditions don't hold, so the caller
        falls back to the per-item path (identical results).
        """
        if self.config.get('transforms', None):
            return NotImplemented
        s2d = self.config.get('layout', 'hwc') == 's2d'
        k = int(self.config.patch_size)
        items = [self._index[int(i)] for i in indices]
        by_scene = {}
        for pos, (si, x0, y0) in enumerate(items):
            by_scene.setdefault(si, []).append((pos, x0, y0))
        n = len(items)
        if len({self.scene_pairs[si][1] is not None for si in by_scene}) > 1:
            return NotImplemented   # mixed with/without-mask scenes
        masks = None
        img_out = None
        from ever_tpu.native import extract_tiles
        for si, entries in by_scene.items():
            img_path, mask_path = self.scene_pairs[si]
            scene = self._cache.get(img_path)
            if not (isinstance(scene, np.ndarray) and scene.dtype == np.uint8
                    and scene.flags['C_CONTIGUOUS']):
                return NotImplemented
            mask_scene = None
            if mask_path is not None:
                mask_scene = self._cache.get(mask_path)
                if not (isinstance(mask_scene, np.ndarray)
                        and mask_scene.dtype == np.uint8
                        and mask_scene.flags['C_CONTIGUOUS']):
                    return NotImplemented
            c_this = scene.shape[2] if scene.ndim == 3 else 1
            if img_out is None:
                c = c_this
                ishape = (n, k // 2, k // 2, 4 * c) if s2d else (n, k, k, c)
                img_out = np.empty(ishape, np.uint8)
            elif c_this != c:
                # numpy would silently BROADCAST a narrower scene into the
                # wider buffer (fabricating replicated channels) — a batch
                # spanning scenes with different channel counts is a broken
                # dataset; say which scene
                raise ValueError(
                    f'scene {img_path!r} has {c_this} channels; batch buffer '
                    f'was allocated for {c} — all scenes in a GeoTileDataset '
                    'must share a channel count')
            if mask_scene is not None and masks is None:
                mc = mask_scene.shape[2] if mask_scene.ndim == 3 else 1
                masks = np.empty((n, k, k, mc), np.uint8)
            if mask_scene is not None:
                mc_this = mask_scene.shape[2] if mask_scene.ndim == 3 else 1
                if mc_this != masks.shape[-1]:
                    raise ValueError(
                        f'mask scene {mask_path!r} has {mc_this} channels; '
                        f'batch buffer was allocated for {masks.shape[-1]}')
            boxes = np.asarray([(y0, x0) for _, x0, y0 in entries], np.int64)
            pos = [p for p, _, _ in entries]
            if s2d:
                from ever_tpu.native import extract_tiles_s2d
                img_out[pos] = extract_tiles_s2d(scene, boxes, (k, k))
            else:
                img_out[pos] = extract_tiles(scene, boxes, None, (k, k))
            if mask_scene is not None:
                masks[pos] = extract_tiles(mask_scene, boxes, None, (k, k))
        if self.config.get('image_dtype', 'float32') != 'uint8':
            img_out = img_out.astype(np.float32)
        if masks is None:
            return img_out
        # match the per-item path: single-channel masks squeeze to [n,k,k],
        # multi-channel (e.g. color-coded) masks keep their channels
        if masks.shape[-1] == 1:
            masks = masks[..., 0]
        return img_out, masks.astype(
            np.dtype(self.config.get('mask_dtype', 'int32')))

    def __getitem__(self, idx: int):
        si, x0, y0 = self._index[int(idx)]
        img_path, mask_path = self.scene_pairs[si]
        k = int(self.config.patch_size)
        dt = np.uint8 if self.config.get('image_dtype', 'float32') == 'uint8' \
            else np.float32
        image = np.asarray(self._cache.get(img_path)[y0:y0 + k, x0:x0 + k],
                           dtype=dt)
        if image.ndim == 2:
            image = image[..., None]
        mask = None
        if mask_path is not None:
            mask = np.asarray(self._cache.get(mask_path)[y0:y0 + k, x0:x0 + k],
                              dtype=np.dtype(self.config.get('mask_dtype',
                                                             'int32')))
        transforms = self.config.get('transforms', None)
        if transforms:
            for t in transforms:
                image, mask = t(image, mask)
        if self.config.get('layout', 'hwc') == 's2d':
            from ever_tpu.preprocess.segm import SpaceToDepth
            image, mask = SpaceToDepth()(image, mask)
        if mask is None:
            return image
        return image, mask
