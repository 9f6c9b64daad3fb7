"""Print the TRUE FLOPs of one FarSeg-R50 train step (unpacked layout).

Runs on the CPU backend (the axon TPU plugin hangs on pre-compile
``cost_analysis``) and lowers without compiling.  Used by bench.py as the
MFU numerator: the pack2 layout's zero-block packed weights inflate the
packed program's own counted flops (2943 vs 2780 GFLOP at 512² batch 8).

    python tools/ref_flops.py --batch 8 --tile 512   # prints one float
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--tile', type=int, default=512)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_step, create_train_state

    b, t = args.batch, args.tile
    rng = np.random.default_rng(0)
    x = rng.normal(size=(b, t // 2, t // 2, 12)).astype(args.dtype)
    y = rng.integers(0, 7, size=(b, t, t)).astype(np.int32)
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)
    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet50', stem='s2d_input'),
        classes=7, dtype=args.dtype)})
    state = create_train_state(model, tx, (x, y), rng=jax.random.key(0))
    step = build_train_step(model, tx, schedule, forward_times=1, donate=False)
    cost = jax.jit(step).lower(state, (jnp.asarray(x), jnp.asarray(y))).cost_analysis()
    print(float(cost.get('flops', 0.0)))


if __name__ == '__main__':
    main()
