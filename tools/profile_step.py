"""Capture a device trace of the FarSeg-R50 train step (bench.py config).

Usage (real TPU, run as the ONLY TPU process):
    python tools/profile_step.py /tmp/prof_base
    python tools/profile_step.py /tmp/prof_x --set encoder.stem=conv
    python tools/trace_ops.py /tmp/prof_base --group

``--set k=v`` applies dotted overrides onto the FarSeg params dict
(literal_eval'd), so kernel experiments are one flag away.  Prints the
measured step time so wall-clock and trace can be cross-checked.
"""

from __future__ import annotations

import argparse
import ast
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('outdir')
    ap.add_argument('--set', action='append', default=[], dest='sets')
    ap.add_argument('--steps', type=int, default=6)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--tile', type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_step, create_train_state

    params = dict(encoder=dict(resnet_type='resnet50', stem='s2d'),
                  classes=7, dtype='bfloat16')
    for kv in args.sets:
        k, v = kv.split('=', 1)
        node = params
        parts = k.split('.')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        try:
            node[parts[-1]] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            node[parts[-1]] = v

    model = builder.make_model({'type': 'FarSeg', 'params': params})
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.batch, args.tile, args.tile, 3)).astype(jnp.bfloat16)
    y = rng.integers(0, 7, size=(args.batch, args.tile, args.tile)).astype(np.int32)
    if str(params['encoder'].get('stem', '')).startswith('s2d_input'):
        # the loader emits the folded 2x2 space-to-depth layout for this stem
        b, t = args.batch, args.tile
        xs = np.asarray(x, np.float32).reshape(b, t // 2, 2, t // 2, 2, 3)
        x = np.ascontiguousarray(xs.transpose(0, 1, 3, 2, 4, 5)).reshape(
            b, t // 2, t // 2, 12).astype(jnp.bfloat16)
    state = create_train_state(model, tx, (x, y), rng=jax.random.key(0))
    data = jax.device_put((jnp.asarray(x), jnp.asarray(y)))

    step = build_train_step(model, tx, schedule, forward_times=1, donate=False)

    def sync(s):
        leaf = jax.tree.leaves(s.params)[0]
        return float(jax.device_get(jnp.sum(leaf)))

    state, _ = step(state, data)    # compile
    sync(state)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, _ = step(state, data)
    sync(state)
    dt = (time.perf_counter() - t0) / args.steps
    print(f'warm step: {dt*1e3:.2f} ms/step (dispatch-bound upper bound)')

    jax.profiler.start_trace(args.outdir)
    for i in range(args.steps):
        with jax.profiler.StepTraceAnnotation('train', step_num=i):
            state, _ = step(state, data)
    sync(state)
    jax.profiler.stop_trace()
    print(f'trace written to {args.outdir}; parse with tools/trace_ops.py')


if __name__ == '__main__':
    main()
