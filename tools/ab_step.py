"""A/B time several FarSeg-R50 train-step kernel variants in ONE TPU process.

Usage:
    python tools/ab_step.py                 # all registered variants
    python tools/ab_step.py s2d s2dw        # subset
    python tools/ab_step.py --trace /tmp/pr s2dw   # also trace each variant

One process = one TPU tunnel client (the tunnel serializes clients and a
killed client can wedge the chip); compile+measure every variant here.
Timing is steps-per-loop K=10 wall-clock with a device fetch as the sync
point (block_until_ready returns early on the axon backend).
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('variants', nargs='*')
    ap.add_argument('--trace', default=None)
    ap.add_argument('--steps', type=int, default=4, help='timing loops of K')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--k', type=int, default=10, help='steps per dispatch')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ever_tpu  # noqa: F401
    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_loop, create_train_state

    VARIANTS = {
        # name -> encoder param overrides (maxpool_impl is config-plumbed)
        's2d_legacymp': dict(stem='s2d'),
        's2dw_legacymp': dict(stem='s2dw'),
        's2d3_legacymp': dict(stem='s2d3'),
        's2d': dict(stem='s2d', maxpool_impl='planes'),
        's2dw': dict(stem='s2dw', maxpool_impl='planes'),
        's2d3': dict(stem='s2d3', maxpool_impl='planes'),
        's2d_pallasmp': dict(stem='s2d', maxpool_impl='pallas'),
        's2d_input': dict(stem='s2d_input'),
        's2d_input_sep': dict(stem='s2d_input', maxpool_impl='separable'),
        's2d_sep': dict(stem='s2d', maxpool_impl='separable'),
        's2d_input_pack2': dict(stem='s2d_input', pack2_layer1=True),
        's2d_pack2': dict(stem='s2d', pack2_layer1=True),
        'allpack2': dict(stem='s2d_input_pack2', pack2_layer1=True),
        'stem_pack2': dict(stem='s2d_input_pack2'),
    }
    names = args.variants or list(VARIANTS)

    batch, tile, K = args.batch, 512, args.k
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, tile, tile, 3)).astype(jnp.bfloat16)
    y = rng.integers(0, 7, size=(batch, tile, tile)).astype(np.int32)
    # pre-s2d staging for stem='s2d_input' (what a production loader emits)
    xs = np.asarray(x, np.float32).reshape(batch, tile // 2, 2, tile // 2, 2, 3)
    xs = np.ascontiguousarray(xs.transpose(0, 1, 3, 2, 4, 5)).reshape(
        batch, tile // 2, tile // 2, 12).astype(jnp.bfloat16)

    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)

    results = {}
    for name in names:
        over = VARIANTS[name]
        model = builder.make_model({'type': 'FarSeg', 'params': dict(
            encoder=dict(resnet_type='resnet50', **over),
            classes=7, dtype='bfloat16')})
        xin = xs if str(over.get('stem', '')).startswith('s2d_input') else x
        state = create_train_state(model, tx, (xin, y), rng=jax.random.key(0))
        data = jax.device_put((jnp.asarray(xin), jnp.asarray(y)))
        loop_data = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (K,) + a.shape), data)
        loop = build_train_loop(model, tx, schedule, steps_per_loop=K,
                                donate=False)

        def sync(s):
            return float(jax.device_get(jnp.sum(jax.tree.leaves(s.params)[0])))

        t0 = time.perf_counter()
        state, _ = loop(state, loop_data)
        sync(state)
        print(f'{name}: compiled+1st loop in {time.perf_counter()-t0:.1f}s',
              flush=True)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, _ = loop(state, loop_data)
        sync(state)
        dt = (time.perf_counter() - t0) / (args.steps * K) * 1e3
        results[name] = dt
        print(f'{name}: {dt:.3f} ms/step', flush=True)

        if args.trace:
            jax.profiler.start_trace(f'{args.trace}_{name}')
            state, _ = loop(state, loop_data)
            sync(state)
            jax.profiler.stop_trace()
        del state, loop, loop_data, data, model

    print('\n== summary ==')
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f'{v:8.3f} ms/step  {k}')


if __name__ == '__main__':
    main()
