"""Deterministic synthetic LoveDA-shaped dataset (VERDICT r1 #3).

No LoveDA checkout is reachable in this environment (zero egress), so this
generates a procedurally-labeled stand-in with the official directory layout
and mask encoding (``ever_tpu/data/loveda.py``):

    {root}/{Train|Val}/{Urban|Rural}/images_png/NNNN.png
                                     masks_png/NNNN.png

Scenes are 1024² with Voronoi class regions; each class renders with a
distinct base color + noise + smooth illumination, so the segmentation task
is genuinely learnable and a few hundred training steps demonstrate real
mIoU gain.  Masks use the official encoding (0 = no-data, classes 1..7).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# 7 LoveDA classes: background, building, road, water, barren, forest, agric.
PALETTE = np.array([
    [120, 120, 110],   # background — gray
    [200, 60, 60],     # building — red
    [230, 230, 220],   # road — near-white
    [40, 80, 200],     # water — blue
    [170, 140, 90],    # barren — tan
    [30, 130, 50],     # forest — green
    [210, 200, 60],    # agricultural — yellow
], np.float32)


def make_scene(rng: np.random.Generator, size: int = 1024, classes: int = 7):
    k = int(rng.integers(8, 16))
    sites = rng.integers(0, size, size=(k, 2)).astype(np.int64)
    site_class = rng.integers(0, classes, size=k)
    yy, xx = np.mgrid[0:size, 0:size]
    d2 = ((yy[..., None] - sites[:, 0]) ** 2 +
          (xx[..., None] - sites[:, 1]) ** 2)
    label = site_class[np.argmin(d2, axis=-1)].astype(np.int32)

    img = PALETTE[label]
    img = img + rng.normal(0.0, 18.0, size=img.shape)
    # smooth illumination gradient (prevents trivial per-pixel color lookup)
    gy, gx = rng.normal(0, 25, 2)
    img = img + (yy / size - 0.5)[..., None] * gy + \
        (xx / size - 0.5)[..., None] * gx
    img = np.clip(img, 0, 255).astype(np.uint8)

    official = (label + 1).astype(np.uint8)
    # no-data blob (official value 0 → ignore_index at load time)
    cy, cx = rng.integers(0, size, 2)
    r = int(rng.integers(size // 16, size // 8))
    blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    official[blob] = 0
    return img, official


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default='/tmp/synthetic_loveda')
    ap.add_argument('--train-per-domain', type=int, default=6)
    ap.add_argument('--val-per-domain', type=int, default=2)
    ap.add_argument('--size', type=int, default=1024)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    from PIL import Image
    rng = np.random.default_rng(args.seed)
    for split, n in (('Train', args.train_per_domain),
                     ('Val', args.val_per_domain)):
        for dom in ('Urban', 'Rural'):
            img_dir = os.path.join(args.root, split, dom, 'images_png')
            msk_dir = os.path.join(args.root, split, dom, 'masks_png')
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(msk_dir, exist_ok=True)
            for i in range(n):
                img, msk = make_scene(rng, args.size)
                Image.fromarray(img).save(os.path.join(img_dir, f'{i:04d}.png'))
                Image.fromarray(msk).save(os.path.join(msk_dir, f'{i:04d}.png'))
    print(f'synthetic LoveDA written under {args.root}')


if __name__ == '__main__':
    main()
