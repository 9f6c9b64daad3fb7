"""LoveDA dataset (NeurIPS'21) — the benchmark dataset of BASELINE.json.

The reference keeps LoveDA loading in downstream projects (the framework
ships only the machinery, ``SURVEY.md §6``); here a ready dataset is
registered so ``project_template/configs/farseg_r50_loveda.py`` runs
against a standard LoveDA checkout:

    {root}/{Train|Val|Test}/{Urban|Rural}/images_png/NNNN.png
                                          masks_png/NNNN.png

Masks use the official encoding: 0 = no-data (mapped to ``ignore_index``
255), classes 1..7 mapped to 0..6 (background, building, road, water,
barren, forest, agricultural) — matching the ``classes=7`` /
``ignore_index=255`` FarSeg config.

Each 1024² scene is one sample; training crops to ``crop_size`` with a
seeded per-(epoch, index) RNG and applies optional hflip — further
augmentation composes via ``transforms`` or the fused on-device
``preprocess.device.batch_augment``.  Val/test splits return the FULL
scene by default (the official LoveDA protocol scores whole 1024² masks);
set ``eval_crop=True`` to deterministically center-crop eval samples to
``crop_size`` instead.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import List, Optional, Tuple

import numpy as np

from ever_tpu.core import registry
from ever_tpu.data._scene import CroppedSceneDataset, require_all_or_none

__all__ = ['LoveDA']

_SPLIT_DIR = {'train': 'Train', 'val': 'Val', 'test': 'Test'}


@registry.DATASET.register('loveda')
class LoveDA(CroppedSceneDataset):
    def set_default_config(self):
        super().set_default_config()
        self._config.update(dict(
            domains=('Urban', 'Rural'),
            layout='hwc',         # 'hwc' | 's2d' (stem='s2d_input')
        ))

    def __init__(self, config=None):
        super().__init__(config)
        cfg = self.config
        split = _SPLIT_DIR.get(str(cfg.split).lower(), cfg.split)
        pairs: List[Tuple[str, Optional[str]]] = []
        for dom in cfg.domains:
            imgs = sorted(_glob.glob(
                os.path.join(cfg.root, split, dom, 'images_png', '*.png')))
            for ip in imgs:
                # sibling dir built from components, not str.replace over the
                # whole path (a root containing 'images_png' would corrupt it)
                mp = os.path.join(cfg.root, split, dom, 'masks_png',
                                  os.path.basename(ip))
                pairs.append((ip, mp if os.path.exists(mp) else None))
        if not pairs and cfg.root:
            raise FileNotFoundError(
                f'no LoveDA images under {cfg.root}/{split} '
                f'(expected .../{{domain}}/images_png/*.png)')
        require_all_or_none(pairs, 'mask')
        self.pairs = pairs

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int):
        from PIL import Image
        img_path, mask_path = self.pairs[int(idx)]
        image = np.asarray(Image.open(img_path), np.uint8)
        if image.ndim == 2:
            image = image[..., None]
        mask = None
        if mask_path is not None:
            raw = np.asarray(Image.open(mask_path))
            # official encoding: 0 = no-data -> 255; 1..7 -> 0..6
            mask = np.where(raw == 0, 255, raw - 1).astype(np.int32)

        cfg = self.config
        # cropping applies to training (random) — eval keeps the FULL scene
        # (official protocol) unless eval_crop explicitly opts into the
        # deterministic center crop (shared crop/pad plumbing: _scene.py)
        image = self._pad_min(image, 0)
        mask = self._pad_min(mask, 255)
        p = self._crop_params(idx, image.shape[0], image.shape[1])
        image, mask = self._apply(image, p), self._apply(mask, p)

        image = np.ascontiguousarray(image).astype(np.float32)
        if mask is not None:
            mask = np.ascontiguousarray(mask)
        if cfg.get('transforms', None):
            for t in cfg.transforms:
                image, mask = t(image, mask)
        if cfg.get('layout', 'hwc') == 's2d':
            from ever_tpu.preprocess.segm import SpaceToDepth
            image, mask = SpaceToDepth()(image, mask)
        if mask is None:
            return image
        return image, mask
