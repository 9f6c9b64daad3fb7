"""Grid tiled-inference knobs (tile_batch, scene dtype) + train donate on TPU.

Usage: python tools/infer_grid.py
One TPU process; FarSeg-R50 512² geometry as in bench.py.
"""

from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ever_tpu  # noqa: F401
    from ever_tpu.core import builder
    from ever_tpu.magic.tiled import tiled_inference
    from ever_tpu.parallel.spmd import build_train_loop, create_train_state

    rng = np.random.default_rng(0)
    model = builder.make_model({'type': 'FarSeg', 'params': dict(
        encoder=dict(resnet_type='resnet50', stem='s2d'),
        classes=7, dtype='bfloat16')})
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)

    x = rng.normal(size=(8, 512, 512, 3)).astype(jnp.bfloat16)
    y = rng.integers(0, 7, size=(8, 512, 512)).astype(np.int32)
    state = create_train_state(model, tx, (x, y), rng=jax.random.key(0))
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    def predict(tiles):
        return model.apply(variables, tiles, train=False)

    scene_f32 = jnp.asarray(rng.normal(size=(4096, 4096, 3)).astype(np.float32))
    scene_bf16 = scene_f32.astype(jnp.bfloat16)
    n_tiles = 64

    for name, scene in (('f32', scene_f32), ('bf16', scene_bf16)):
        for tb in (8, 16, 32, 64):
            out = tiled_inference(predict, scene, 512, 512, 7, tile_batch=tb)
            _ = float(jax.device_get(jnp.sum(out[0, 0])))
            t0 = time.perf_counter()
            for _ in range(3):
                out = tiled_inference(predict, scene, 512, 512, 7, tile_batch=tb)
            _ = float(jax.device_get(jnp.sum(out[0, 0])))
            dt = (time.perf_counter() - t0) / 3
            print(f'infer scene={name} tile_batch={tb}: '
                  f'{n_tiles/dt:.1f} tiles/s', flush=True)

    # train loop donate=True vs False
    K = 20
    data = jax.device_put((jnp.asarray(x), jnp.asarray(y)))
    loop_data = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (K,) + a.shape), data)

    def sync(s):
        return float(jax.device_get(jnp.sum(jax.tree.leaves(s.params)[0])))

    for donate in (False, True):
        loop = build_train_loop(model, tx, schedule, steps_per_loop=K,
                                donate=donate)
        s = jax.device_put(state)
        s, _ = loop(s, loop_data)
        sync(s)
        t0 = time.perf_counter()
        for _ in range(4):
            s, _ = loop(s, loop_data)
        sync(s)
        dt = (time.perf_counter() - t0) / (4 * K) * 1e3
        print(f'train donate={donate}: {dt:.3f} ms/step', flush=True)


if __name__ == '__main__':
    main()
