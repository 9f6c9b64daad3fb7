"""Print the TRUE FLOPs of one train step for a benchmark workload.

Runs on the CPU backend (the axon TPU plugin hangs on pre-compile
``cost_analysis``) and lowers without compiling.  Used by bench.py as the
MFU numerator — the twin model is the HONEST layout:

- FarSeg: unpacked conv layout (the pack2 layout's zero-block packed weights
  inflate the packed program's own counted flops, 2943 vs 2780 GFLOP at 512²
  batch 8);
- ViT: XLA attention, no remat (the Pallas flash kernel pads 4101 tokens to
  4608 — real work but not useful work; remat recompute likewise must not
  count toward MFU).

    python tools/ref_flops.py --batch 8 --tile 512                # FarSeg
    python tools/ref_flops.py --model vit --batch 8 --tile 512    # DinoSeg
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='farseg',
                    choices=['farseg', 'vit', 'factseg', 'changestar',
                             'changemask', 'changeos'])
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--tile', type=int, default=512)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--backbone', default='vitl16_sat493m')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_step, create_train_state

    b, t = args.batch, args.tile
    rng = np.random.default_rng(0)
    x3 = rng.normal(size=(b, t, t, 3)).astype(args.dtype)
    x6 = rng.normal(size=(b, t, t, 6)).astype(args.dtype)
    yseg = rng.integers(0, 7, size=(b, t, t)).astype(np.int32)
    ybin = rng.integers(0, 2, size=(b, t, t)).astype(np.int32)

    common = dict(
        encoder=dict(resnet_type='resnet50'),
        fpn=dict(in_channels_list=(256, 512, 1024, 2048), out_channels=256),
        decoder=dict(in_channels=256, out_channels=256,
                     in_feat_output_strides=(4, 8, 16, 32),
                     out_feat_output_stride=4),
        dtype=args.dtype,
    )

    if args.model == 'farseg':
        x = rng.normal(size=(b, t // 2, t // 2, 12)).astype(args.dtype)
        data = (x, yseg)
        model_cfg = {'type': 'FarSeg', 'params': dict(
            encoder=dict(resnet_type='resnet50', stem='s2d_input'),
            classes=7, dtype=args.dtype)}
        opt_cfg = {'type': 'sgd', 'params': dict(momentum=0.9)}
    elif args.model == 'vit':
        data = (x3, yseg)
        # same geometry as the bench workload, XLA attention, no remat
        model_cfg = {'type': 'DinoSeg', 'params': dict(
            backbone=dict(name=args.backbone, attn_impl='xla', remat=None),
            classes=7, dtype=args.dtype)}
        opt_cfg = {'type': 'adamw', 'params': dict(weight_decay=0.05)}
    elif args.model == 'factseg':
        data = (x3, yseg)
        model_cfg = {'type': 'FactSeg', 'params': dict(common, classes=7)}
        opt_cfg = {'type': 'sgd', 'params': dict(momentum=0.9)}
    elif args.model == 'changestar':
        data = (x6, dict(masks=ybin, change=ybin))
        model_cfg = {'type': 'ChangeStar', 'params': dict(
            common, changemixin=dict(in_channels=512, inner_channels=16,
                                     num_convs=4, scale_factor=4.0),
            classes=1)}
        opt_cfg = {'type': 'sgd', 'params': dict(momentum=0.9)}
    elif args.model == 'changemask':
        data = (x6, dict(masks=np.stack([ybin, ybin], axis=-1), change=ybin))
        model_cfg = {'type': 'ChangeMask', 'params': dict(common, classes=2)}
        opt_cfg = {'type': 'sgd', 'params': dict(momentum=0.9)}
    else:  # changeos
        dam = rng.integers(0, 5, size=(b, t, t)).astype(np.int32)
        data = (x6, dict(loc=ybin, damage=np.where(ybin == 0, 0, dam)))
        model_cfg = {'type': 'ChangeOS', 'params': dict(
            common, damage_classes=5)}
        opt_cfg = {'type': 'sgd', 'params': dict(momentum=0.9)}

    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=1000)})
    factory, _ = builder.make_optimizer(opt_cfg)
    tx = factory.build(schedule)
    model = builder.make_model(model_cfg)
    # ABSTRACT state/batch: .lower() needs only avals, and a concrete
    # model.init at dense geometries (ViT-L 1024²) costs >15 min of real
    # CPU forward this tool exists to avoid
    state = jax.eval_shape(
        lambda: create_train_state(model, tx, data, rng=jax.random.key(0)))
    step = build_train_step(model, tx, schedule, forward_times=1, donate=False)
    abstract_data = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), data)
    cost = jax.jit(step).lower(state, abstract_data).cost_analysis()
    print(float(cost.get('flops', 0.0)))


if __name__ == '__main__':
    main()
