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
from ever_tpu.interface.dataloader import ERDataset

__all__ = ['LoveDA']

_SPLIT_DIR = {'train': 'Train', 'val': 'Val', 'test': 'Test'}


@registry.DATASET.register('loveda')
class LoveDA(ERDataset):
    def set_default_config(self):
        self._config.update(dict(
            root='',
            split='train',
            domains=('Urban', 'Rural'),
            crop_size=512,
            random_crop=None,     # default: split == 'train'
            eval_crop=False,      # True: center-crop non-train splits too
            hflip=True,
            seed=0,
            transforms=None,
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
                mp = ip.replace('images_png', 'masks_png')
                pairs.append((ip, mp if os.path.exists(mp) else None))
        if not pairs and cfg.root:
            raise FileNotFoundError(
                f'no LoveDA images under {cfg.root}/{split} '
                f'(expected .../{{domain}}/images_png/*.png)')
        self.pairs = pairs
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:   # called by the iterator
        self._epoch = int(epoch)

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
        do_crop = cfg.random_crop
        if do_crop is None:
            do_crop = str(cfg.split).lower() == 'train'
        k = int(cfg.crop_size or 0)
        # cropping applies to training (random) — eval keeps the FULL scene
        # (official protocol) unless eval_crop explicitly opts into the
        # deterministic center crop.  Silently scoring mIoU on the center
        # quarter of every scene was a protocol divergence.
        crop_here = do_crop or bool(cfg.get('eval_crop', False))
        if crop_here and k and image.shape[0] >= k and image.shape[1] >= k:
            if do_crop:
                rng = np.random.default_rng(
                    (int(cfg.seed) * 1_000_003 + self._epoch) * 1_000_003 + idx)
                y0 = int(rng.integers(0, image.shape[0] - k + 1))
                x0 = int(rng.integers(0, image.shape[1] - k + 1))
                flip = bool(cfg.hflip) and bool(rng.integers(0, 2))
            else:
                y0 = (image.shape[0] - k) // 2
                x0 = (image.shape[1] - k) // 2
                flip = False
            image = image[y0:y0 + k, x0:x0 + k]
            if mask is not None:
                mask = mask[y0:y0 + k, x0:x0 + k]
            if flip:
                image = image[:, ::-1]
                if mask is not None:
                    mask = mask[:, ::-1]

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
