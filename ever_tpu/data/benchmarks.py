"""Built-in datasets for the remaining benchmark configs.

The reference keeps dataset loading in downstream projects (the framework
ships only machinery — ``SURVEY.md §6``); like ``data/loveda.py``, ready
datasets are registered here so every config under
``project_template/configs/`` runs against a standard checkout:

- ``levircd`` — LEVIR-CD building change detection
  (``{root}/{train|val|test}/{A,B,label}/*.png``, 1024² RGB pairs).
  Yields ``(x [H,W,6] t1‖t2, {'masks': [H,W,2], 'change': [H,W]})`` —
  the label contract of ChangeStar/ChangeMask (``module/change.py``).
  LEVIR-CD has no per-temporal semantic masks, so ``masks`` is filled
  with ``ignore_index`` (255): the semantic losses mask out and training
  is driven by the change branch (the honest treatment — fabricating
  per-frame masks from the change label would teach the semantic
  decoders wrong classes).
- ``xview2`` — xView2/xBD building damage assessment
  (``{root}/{split}/images/{id}_{pre,post}_disaster.png`` +
  ``targets/{id}_{pre,post}_disaster_target.png``).  Yields
  ``(x [H,W,6] pre‖post, {'loc': [H,W] 0/1, 'damage': [H,W] 0..4})`` —
  ChangeOS's contract; target value 5 ("un-classified") maps to 255.
- ``isaid`` — iSAID small-object instance segmentation, semantic flavor
  (``{root}/{split}/images/*.png`` with ``*_instance_color_RGB.png``
  masks alongside or under ``Semantic_masks/images/``).  Yields
  ``(image HWC float32, mask HW int32)`` with the official devkit
  palette decoded to class ids 0..15 (0 = background); unknown colors
  map to 255.

All three use the same seeded per-(epoch, index) random crop + hflip as
``loveda`` for training and return full scenes (or a deterministic center
crop via ``eval_crop=True``) for eval.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import List, Optional, Tuple

import numpy as np

from ever_tpu.core import registry
from ever_tpu.data._scene import CroppedSceneDataset, require_all_or_none

__all__ = ['LEVIRCD', 'XView2', 'ISAID', 'ISAID_PALETTE']


def _read_png(path: str) -> np.ndarray:
    from PIL import Image
    Image.MAX_IMAGE_PIXELS = None
    return np.asarray(Image.open(path))


def _hwc(img: np.ndarray) -> np.ndarray:
    """Ensure a channel dim: a 2D grayscale frame concatenated on axis=-1
    would silently produce (H, 2W) instead of (H, W, 2C)."""
    return img[..., None] if img.ndim == 2 else img


@registry.DATASET.register('levircd')
class LEVIRCD(CroppedSceneDataset):
    """LEVIR-CD (Chen & Shi 2020), ``{root}/{split}/{A,B,label}/*.png``."""

    def set_default_config(self):
        super().set_default_config()
        self._config.update(dict(ignore_index=255))

    def __init__(self, config=None):
        super().__init__(config)
        cfg = self.config
        split = str(cfg.split).lower()
        a = sorted(_glob.glob(os.path.join(cfg.root, split, 'A', '*.png')))
        self.triples: List[Tuple[str, str, Optional[str]]] = []
        for ap in a:
            # build siblings from the split dir, NOT str.replace('/A/','/B/')
            # — a root path containing '/A/' anywhere would corrupt them
            name = os.path.basename(ap)
            bp = os.path.join(cfg.root, split, 'B', name)
            lp = os.path.join(cfg.root, split, 'label', name)
            if os.path.exists(bp):
                self.triples.append((ap, bp, lp if os.path.exists(lp) else None))
        if not self.triples and cfg.root:
            raise FileNotFoundError(
                f'no LEVIR-CD pairs under {cfg.root}/{split} '
                '(expected .../A/*.png with matching B/ and label/)')
        require_all_or_none(
            [(ap, lp) for ap, _, lp in self.triples], 'label')

    def __len__(self) -> int:
        return len(self.triples)

    def __getitem__(self, idx: int):
        ap, bp, lp = self.triples[int(idx)]
        t1 = _hwc(_read_png(ap).astype(np.uint8))
        t2 = _hwc(_read_png(bp).astype(np.uint8))
        change = None
        if lp is not None:
            change = (np.asarray(_read_png(lp)) > 127)
            if change.ndim == 3:
                change = change[..., 0]
            change = change.astype(np.int32)
        ig = int(self.config.ignore_index)
        t1, t2 = self._pad_min(t1, 0), self._pad_min(t2, 0)
        change = self._pad_min(change, ig)
        p = self._crop_params(idx, t1.shape[0], t1.shape[1])
        t1, t2 = self._apply(t1, p), self._apply(t2, p)
        change = self._apply(change, p)
        x = np.concatenate([t1, t2], axis=-1).astype(np.float32)
        if self.config.get('transforms', None):
            for t in self.config.transforms:
                x, change = t(x, change)
        if change is None:
            return x
        masks = np.full(change.shape + (2,), ig, np.int32)  # see module doc
        return x, dict(masks=masks, change=change)


@registry.DATASET.register('xview2')
class XView2(CroppedSceneDataset):
    """xView2/xBD (Gupta et al. 2019), images/ + targets/ per split.

    Damage target encoding: 0 background, 1 no-damage, 2 minor, 3 major,
    4 destroyed, 5 un-classified → ``ignore_index``.
    """

    def set_default_config(self):
        super().set_default_config()
        self._config.update(dict(ignore_index=255))

    def __init__(self, config=None):
        super().__init__(config)
        cfg = self.config
        split = str(cfg.split)
        pres = sorted(_glob.glob(os.path.join(
            cfg.root, split, 'images', '*_pre_disaster.png')))
        self.pairs: List[Tuple[str, str, Optional[str], Optional[str]]] = []
        for pp in pres:
            post = pp.replace('_pre_disaster.png', '_post_disaster.png')
            if not os.path.exists(post):
                continue
            tdir = os.path.join(cfg.root, split, 'targets')
            base = os.path.basename(pp)
            lt = os.path.join(tdir, base.replace('.png', '_target.png'))
            dt = os.path.join(tdir, os.path.basename(post).replace(
                '.png', '_target.png'))
            self.pairs.append((pp, post,
                               lt if os.path.exists(lt) else None,
                               dt if os.path.exists(dt) else None))
        if not self.pairs and cfg.root:
            raise FileNotFoundError(
                f'no xView2 scenes under {cfg.root}/{split} '
                '(expected images/*_pre_disaster.png with _post_disaster '
                'twins; optional targets/*_target.png)')
        require_all_or_none([(pp, lt) for pp, _, lt, _ in self.pairs],
                             'pre_disaster_target')
        require_all_or_none([(pp, dt) for pp, _, _, dt in self.pairs],
                             'post_disaster_target')
        if cfg.get('transforms', None):
            # a geometric transform applied to (image, mask) pairs cannot
            # keep x/loc/damage in sync — fail at construction instead of
            # deep inside a loader worker thread after training started
            raise ValueError(
                'xview2 yields dict labels; per-pair transforms do not '
                'apply — use the dataset crop/hflip config or wrap samples')

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int):
        pp, post, lt, dt = self.pairs[int(idx)]
        pre_img = _hwc(_read_png(pp).astype(np.uint8))
        post_img = _hwc(_read_png(post).astype(np.uint8))
        ig = int(self.config.ignore_index)
        loc = damage = None
        if lt is not None:
            loc = (np.asarray(_read_png(lt)) > 0).astype(np.int32)
        if dt is not None:
            damage = np.asarray(_read_png(dt)).astype(np.int32)
            damage = np.where(damage == 5, ig, damage).astype(np.int32)
        pre_img, post_img = self._pad_min(pre_img, 0), self._pad_min(post_img, 0)
        loc, damage = self._pad_min(loc, ig), self._pad_min(damage, ig)
        p = self._crop_params(idx, pre_img.shape[0], pre_img.shape[1])
        pre_img, post_img = self._apply(pre_img, p), self._apply(post_img, p)
        loc, damage = self._apply(loc, p), self._apply(damage, p)
        x = np.concatenate([pre_img, post_img], axis=-1).astype(np.float32)
        if loc is None or damage is None:
            return x
        return x, dict(loc=loc, damage=damage)


# Official iSAID devkit palette: class ids 1..15 (0 = background black,
# anything else = 255 ignore).
ISAID_PALETTE = {
    (0, 0, 0): 0,
    (0, 0, 63): 1,       # ship
    (0, 191, 127): 2,    # storage tank
    (0, 63, 0): 3,       # baseball diamond
    (0, 63, 127): 4,     # tennis court
    (0, 63, 191): 5,     # basketball court
    (0, 63, 255): 6,     # ground track field
    (0, 127, 63): 7,     # bridge
    (0, 127, 127): 8,    # large vehicle
    (0, 0, 127): 9,      # small vehicle
    (0, 0, 191): 10,     # helicopter
    (0, 0, 255): 11,     # swimming pool
    (0, 63, 63): 12,     # roundabout
    (0, 127, 191): 13,   # soccer ball field
    (0, 127, 255): 14,   # plane
    (0, 100, 155): 15,   # harbor
}


# module-level sorted packed-int24 key/value arrays: one vectorized
# searchsorted pass decodes a whole mask (vs one equality pass per color)
_ISAID_KEYS, _ISAID_VALS = (lambda items: (
    np.asarray([k for k, _ in items], np.int64),
    np.asarray([v for _, v in items], np.int32)))(
    sorted(((r << 16) | (g << 8) | b, c)
           for (r, g, b), c in ISAID_PALETTE.items()))


@registry.DATASET.register('isaid')
class ISAID(CroppedSceneDataset):
    """iSAID (Waqas Zamir et al. 2019), semantic flavor.

    Images under ``{root}/{split}/images``; the color-coded semantic mask
    ``{stem}_instance_color_RGB.png`` is looked up alongside the image and
    under ``{root}/{split}/Semantic_masks/images``.  Pre-tiled "patches"
    checkouts work unchanged (every patch is one sample).
    """

    def set_default_config(self):
        super().set_default_config()
        self._config.update(dict(ignore_index=255))

    _MASK_SUFFIX = '_instance_color_RGB.png'

    def __init__(self, config=None):
        super().__init__(config)
        cfg = self.config
        split = str(cfg.split).lower()
        img_dir = os.path.join(cfg.root, split, 'images')
        imgs = [p for p in sorted(_glob.glob(os.path.join(img_dir, '*.png')))
                if not p.endswith(self._MASK_SUFFIX)]
        self.pairs: List[Tuple[str, Optional[str]]] = []
        for ip in imgs:
            stem = os.path.splitext(os.path.basename(ip))[0]
            cands = (
                os.path.join(img_dir, stem + self._MASK_SUFFIX),
                os.path.join(cfg.root, split, 'Semantic_masks', 'images',
                             stem + self._MASK_SUFFIX),
            )
            mp = next((c for c in cands if os.path.exists(c)), None)
            self.pairs.append((ip, mp))
        if not self.pairs and cfg.root:
            raise FileNotFoundError(
                f'no iSAID images under {img_dir} (expected *.png with '
                f'*{self._MASK_SUFFIX} masks)')
        require_all_or_none(self.pairs, 'semantic mask')

    def __len__(self) -> int:
        return len(self.pairs)

    def _decode_mask(self, raw: np.ndarray) -> np.ndarray:
        ig = int(self.config.ignore_index)
        if raw.ndim == 2:       # already class-coded
            return raw.astype(np.int32)
        rgb = raw[..., :3].astype(np.int64)
        packed = (rgb[..., 0] << 16) | (rgb[..., 1] << 8) | rgb[..., 2]
        pos = np.searchsorted(_ISAID_KEYS, packed)
        pos_c = np.clip(pos, 0, len(_ISAID_KEYS) - 1)
        hit = _ISAID_KEYS[pos_c] == packed
        return np.where(hit, _ISAID_VALS[pos_c], ig).astype(np.int32)

    def __getitem__(self, idx: int):
        ip, mp = self.pairs[int(idx)]
        image = _read_png(ip).astype(np.uint8)
        if image.ndim == 2:
            image = image[..., None]
        if image.shape[-1] == 1:
            image = np.repeat(image, 3, axis=-1)
        mask = self._decode_mask(np.asarray(_read_png(mp))) if mp else None
        image = self._pad_min(image, 0)
        mask = self._pad_min(mask, int(self.config.ignore_index))
        p = self._crop_params(idx, image.shape[0], image.shape[1])
        image, mask = self._apply(image, p), self._apply(mask, p)
        image = image.astype(np.float32)
        if self.config.get('transforms', None):
            for t in self.config.transforms:
                image, mask = t(image, mask)
        if mask is None:
            return image
        return image, mask
