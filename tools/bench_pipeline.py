"""End-to-end input-pipeline bench: real loader -> prefetch -> train step.

The core bench (bench.py) times the compiled step on pre-staged batches;
this one answers "does the HOST pipeline keep up?" — it builds synthetic
uint8 PNG scenes on disk, then trains FarSeg-R50 512² through the full
production path:

    GeoTileDataset(layout='s2d')  [native C++ batched s2d gather]
    -> DataLoader (thread pool)
    -> normalize_u8 -> bf16 (native fused kernel)
    -> prefetch_to_device (async H2D, 2 deep)
    -> build_train_step

and reports tiles/s alongside the staged-batch number.  Run on the TPU:
    python tools/bench_pipeline.py [--steps 60]

CAVEAT (measured 2026-08, see docs/PERFORMANCE.md "host pipeline"): on the
tunneled dev chip, ANY fresh host->device transfer interleaved with running
compute pays a ~250-500 ms serialization penalty regardless of size
(isolated transfers run at 1.4 GB/s; device-resident batches hit 31.6
ms/step).  The host stages themselves are fast — loader 6.7 ms + fused
normalize 5.3 ms per 8-tile batch ≈ 1.5 ms/tile, i.e. ~660 tiles/s of host
capacity vs the 253 tiles/s step — so on a production TPU host (PCIe DMA,
overlapped transfers) the pipeline keeps the chip fed.  This script
documents both numbers.
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=60)
    ap.add_argument('--batch', type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    import ever_tpu  # noqa: F401
    from ever_tpu.core import builder, registry
    from ever_tpu.core.prefetch import prefetch_to_device
    from ever_tpu.data.loader import DataLoader
    from ever_tpu.data.distributed import StepDistributedSampler
    from ever_tpu.native import normalize_u8
    from ever_tpu.parallel.spmd import build_train_step, create_train_state
    import ml_dtypes

    tile = 512
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix='bench_pipeline_')
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, size=(2048, 2048, 3),
                                     dtype=np.uint8)).save(f'{tmp}/{i}_img.png')
        Image.fromarray(rng.integers(0, 7, size=(2048, 2048),
                                     dtype=np.uint8)).save(f'{tmp}/{i}_mask.png')

    ds = registry.DATASET['geotile'](dict(
        image_glob=f'{tmp}/*_img.png', mask_glob=f'{tmp}/*_mask.png',
        patch_size=tile, stride=256, layout='s2d', image_dtype='uint8'))
    print(f'{len(ds)} patches across 2 scenes', flush=True)
    sampler = StepDistributedSampler(ds, num_replicas=1, rank=0, seed=0)

    mean = np.tile([123.675, 116.28, 103.53], 4).astype(np.float32)
    std = np.tile([58.395, 57.12, 57.375], 4).astype(np.float32)

    def batches():
        step = 0
        while True:
            sampler.set_step(step)
            for xb, yb in DataLoader(ds, sampler=sampler,
                                     batch_size=args.batch, num_workers=4,
                                     drop_last=True):
                # fused native uint8 -> normalized bf16, one pass
                xn = normalize_u8(xb, mean, std, dtype=ml_dtypes.bfloat16)
                yield xn, yb.astype(np.int32)
            step += 1

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet50', stem='s2d_input'),
        classes=7, dtype='bfloat16')})
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)

    it = prefetch_to_device(batches(), size=2)
    first = next(it)
    state = create_train_state(model, tx, first, rng=jax.random.key(0))
    step_fn = build_train_step(model, tx, schedule, donate=False)

    def sync(s):
        return float(jax.device_get(jnp.sum(jax.tree.leaves(s.params)[0])))

    state, _ = step_fn(state, first)
    sync(state)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, _ = step_fn(state, next(it))
    sync(state)
    dt = (time.perf_counter() - t0) / args.steps
    print(f'pipeline-fed train: {dt*1e3:.2f} ms/step, '
          f'{args.batch/dt:.1f} tiles/s (staged-batch bench: see bench.py)',
          flush=True)


if __name__ == '__main__':
    main()
