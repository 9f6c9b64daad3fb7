"""Grid XLA TPU compiler options for the FarSeg-R50 train step.

compiler_options pass through ``.lower().compile(...)`` on this backend
(XLA_FLAGS env TPU flags do NOT — the plugin rejects them, see CLAUDE.md).
One TPU process compiles the same lowered step under each option set and
times K=10 steps-per-loop dispatches.

Usage: python tools/flag_grid.py [--steps 4]
"""

from __future__ import annotations

import argparse
import time


GRIDS = {
    'base': {},
    'vmem32m': {'xla_tpu_scoped_vmem_limit_kib': '32768'},
    'vmem64m': {'xla_tpu_scoped_vmem_limit_kib': '65536'},
    'vmem128m': {'xla_tpu_scoped_vmem_limit_kib': '131072'},
    'flash_vmem': {'xla_tpu_scoped_vmem_limit_kib': '98304'},
    'no_multi_level': {'xla_tpu_use_repeated_instance_for_preferred_prefetch_time': 'false'},
    'aggressive_fusion': {'xla_tpu_enable_aggressive_instruction_fusion': 'true'},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=4)
    ap.add_argument('grids', nargs='*')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ever_tpu  # noqa: F401
    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_loop, create_train_state

    batch, tile, K = 8, 512, 10
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, tile, tile, 3)).astype(jnp.bfloat16)
    y = rng.integers(0, 7, size=(batch, tile, tile)).astype(np.int32)

    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet50', stem='s2d'),
        classes=7, dtype='bfloat16')})
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)

    state = create_train_state(model, tx, (x, y), rng=jax.random.key(0))
    data = jax.device_put((jnp.asarray(x), jnp.asarray(y)))
    loop_data = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (K,) + a.shape), data)
    loop = build_train_loop(model, tx, schedule, steps_per_loop=K, donate=False)
    lowered = jax.jit(lambda s, b: loop(s, b)).lower(state, loop_data)

    def sync(s):
        return float(jax.device_get(jnp.sum(jax.tree.leaves(s.params)[0])))

    names = args.grids or list(GRIDS)
    results = {}
    for name in names:
        opts = GRIDS[name]
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            print(f'{name}: compiled in {time.perf_counter()-t0:.1f}s', flush=True)
            s, _ = compiled(state, loop_data)
            sync(s)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                s, _ = compiled(s, loop_data)
            sync(s)
            dt = (time.perf_counter() - t0) / (args.steps * K) * 1e3
            results[name] = dt
            print(f'{name} {opts}: {dt:.3f} ms/step', flush=True)
        except Exception as e:  # unknown flag names raise at compile
            results[name] = float('nan')
            print(f'{name} {opts}: FAILED {type(e).__name__}: {e}', flush=True)

    print('\n== summary ==')
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f'{v:8.3f} ms/step  {k}')


if __name__ == '__main__':
    main()
