"""Shared scene-dataset plumbing: seeded per-(epoch, index) random crop +
hflip for training, full scenes (or a deterministic center crop via
``eval_crop=True``) for eval, and minimum-size padding so scenes smaller
than ``crop_size`` train instead of crashing ``np.stack`` mid-epoch.

Used by ``data/loveda.py`` and every dataset in ``data/benchmarks.py`` —
ONE implementation of the RNG scheme ``(seed*1000003 + epoch)*1000003 +
idx`` so a fix here cannot silently miss a sibling.
"""

from __future__ import annotations

import numpy as np

from ever_tpu.interface.dataloader import ERDataset

__all__ = ['CroppedSceneDataset', 'require_all_or_none']


def require_all_or_none(pairs, what: str) -> None:
    """Labels must be present for every sample or for none (a pure test
    split): a partial set would mix (x, y) tuples with bare arrays in one
    batch and fail deep inside default_collate mid-epoch."""
    import os
    missing = [img for img, lab in pairs if lab is None]
    if missing and len(missing) != len(pairs):
        preview = ', '.join(os.path.basename(m) for m in missing[:5])
        raise FileNotFoundError(
            f'{len(missing)}/{len(pairs)} samples are missing their {what} '
            f'file (e.g. {preview}); provide labels for all samples or '
            'none (test split)')


class CroppedSceneDataset(ERDataset):
    def set_default_config(self):
        self._config.update(dict(
            root='',
            split='train',
            crop_size=512,
            random_crop=None,      # default: split == 'train'
            eval_crop=False,       # True: center-crop non-train splits too
            hflip=True,
            seed=0,
            transforms=None,
        ))

    def __init__(self, config=None):
        super().__init__(config)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:    # called by the iterator
        self._epoch = int(epoch)

    def _crop_here(self):
        """(cropping_applies, is_random, k)."""
        cfg = self.config
        do_crop = cfg.random_crop
        if do_crop is None:
            do_crop = str(cfg.split).lower() == 'train'
        k = int(cfg.crop_size or 0)
        return (bool(do_crop) or bool(cfg.get('eval_crop', False))), bool(do_crop), k

    def _crop_params(self, idx: int, h: int, w: int):
        """(y0, x0, k, flip) or None when no crop applies.

        ``h``/``w`` are the scene dims AFTER :meth:`_pad_min` — callers pad
        first, so ``h >= k and w >= k`` whenever cropping applies.
        """
        crop_here, do_crop, k = self._crop_here()
        if not (crop_here and k and h >= k and w >= k):
            return None
        if do_crop:
            rng = np.random.default_rng(
                (int(self.config.seed) * 1_000_003 + self._epoch) * 1_000_003
                + idx)
            y0 = int(rng.integers(0, h - k + 1))
            x0 = int(rng.integers(0, w - k + 1))
            flip = bool(self.config.hflip) and bool(rng.integers(0, 2))
        else:
            y0, x0, flip = (h - k) // 2, (w - k) // 2, False
        return y0, x0, k, flip

    def _pad_min(self, arr, fill):
        """Pad bottom/right to at least ``crop_size`` when cropping applies
        (images fill 0, labels fill ``ignore_index`` so metrics/losses mask
        the pad exactly)."""
        if arr is None:
            return None
        crop_here, _, k = self._crop_here()
        if not (crop_here and k):
            return arr
        ph, pw = max(0, k - arr.shape[0]), max(0, k - arr.shape[1])
        if not ph and not pw:
            return arr
        widths = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
        return np.pad(arr, widths, constant_values=fill)

    @staticmethod
    def _apply(arr, p):
        if arr is None or p is None:
            return arr
        y0, x0, k, flip = p
        arr = arr[y0:y0 + k, x0:x0 + k]
        if flip:
            arr = arr[:, ::-1]
        return np.ascontiguousarray(arr)
