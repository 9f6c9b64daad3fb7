"""Trace + time any BASELINE config's train step (VERDICT r3 #4 instrument).

Like ``tools/profile_step.py`` but for the non-flagship configs
(factseg/changestar/changemask/changeos) at production geometry, with
``--set`` dotted model-param overrides for kernel experiments:

    python tools/profile_config.py changestar /tmp/prof_cs
    python tools/profile_config.py changestar /tmp/prof_cs2 \
        --set changemixin.order_stacked=True
    python tools/trace_ops.py /tmp/prof_cs --group --json > /tmp/a.json
    python tools/diff_prof.py /tmp/a.json /tmp/b.json
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('outdir', nargs='?', default=None,
                    help='trace directory (omit to time only)')
    ap.add_argument('--set', action='append', default=[], dest='sets')
    ap.add_argument('--steps', type=int, default=6)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--tile', type=int, default=512)
    ap.add_argument('--windows', type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ever_tpu  # noqa: F401  (persistent compile cache)
    import bench
    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_step, create_train_state

    on_tpu = 'cpu' not in jax.devices()[0].device_kind.lower()
    overrides = dict(kv.split('=', 1) for kv in args.sets)
    model_cfg, data = bench.config_model_and_data(
        args.config, args.tile, args.batch, on_tpu, overrides)
    model = builder.make_model(model_cfg)
    schedule = builder.make_learningrate(
        {'type': 'poly', 'params': dict(base_lr=0.01, power=0.9,
                                        max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'sgd', 'params': dict(momentum=0.9)})
    tx = factory.build(schedule)

    state = create_train_state(model, tx, data, rng=jax.random.key(0))
    dev_data = jax.device_put(jax.tree.map(jnp.asarray, data))
    step = build_train_step(model, tx, schedule, donate=False)
    box = [state]

    def sync():
        leaf = jax.tree.leaves(box[0].params)[0]
        return float(jax.device_get(jnp.sum(leaf)))

    t0 = time.perf_counter()
    box[0], metrics = step(box[0], dev_data)
    sync()
    print(f'compile+first step: {time.perf_counter() - t0:.1f}s; '
          f'loss={float(metrics["total_loss"]):.4f}', flush=True)

    meds = []
    for _ in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            box[0], _ = step(box[0], dev_data)
        sync()
        meds.append((time.perf_counter() - t0) / args.steps)
    med = statistics.median(meds)
    print(f'{args.config}: {med * 1000:.2f} ms/step '
          f'(spread {(max(meds) - min(meds)) / med:.3f})', flush=True)

    if args.outdir:
        jax.profiler.start_trace(args.outdir)
        for _ in range(args.steps):
            box[0], _ = step(box[0], dev_data)
        sync()
        jax.profiler.stop_trace()
        print(f'trace written to {args.outdir}', flush=True)


if __name__ == '__main__':
    main()
