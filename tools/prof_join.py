"""Join a device trace with the compiled HLO: per-op time + root expression.

The grouped table (``tools/trace_ops.py``) says WHICH fusion families cost
what; this says WHAT each hot op computes, by rebuilding the exact program
(vit_ab/bench geometry — cache-hit compile), dumping ``as_text()`` and
printing each hot op's HLO root line next to its measured time.  This is
the committed form of the r4 /tmp/prof_one.py pattern (CLAUDE.md).

    python tools/prof_join.py /tmp/vit512_r5_512_none_auto --top 30
    python tools/prof_join.py <trace_dir> --model farseg ...

Run as the only TPU process (it compiles the step to get HLO text).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def load_trace(trace_dir: str):
    """{op_name: total_us} from the newest trace in the directory."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins', 'profile', '*', '*.trace.json.gz')))
    if not paths:
        raise SystemExit(f'no trace under {trace_dir}')
    with gzip.open(paths[-1], 'rt') as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    # TensorCore lanes: pid whose name mentions TensorCore; fall back to all
    pids = {e['pid'] for e in events
            if e.get('ph') == 'M' and e.get('name') == 'process_name'
            and 'TensorCore' in str(e.get('args', {}).get('name', ''))}
    out = collections.Counter()
    count = collections.Counter()
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        if pids and e.get('pid') not in pids:
            continue
        name = e.get('name', '')
        out[name] += e['dur']
        count[name] += 1
    return out, count


def vit_hlo(tile: int, batch: int, backbone: str = 'vitl16_sat493m') -> str:
    """Compile the exact vit_ab/bench train-loop program (warm cache) and
    return its optimized HLO text."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ever_tpu  # noqa: F401  (compile cache)
    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_loop, create_train_state

    model = builder.make_model({'type': 'DinoSeg', 'params': dict(
        backbone=dict(name=backbone), classes=7, dtype='bfloat16')})
    schedule = builder.make_learningrate(
        {'type': 'cosine', 'params': dict(base_lr=1e-4, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'adamw', 'params': dict(weight_decay=0.05)})
    tx = factory.build(schedule)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, tile, tile, 3)).astype(jnp.bfloat16)
    y = rng.integers(0, 7, size=(batch, tile, tile)).astype(np.int32)
    state = create_train_state(model, tx, (x, y), rng=jax.random.key(0))
    K = 10 if tile <= 512 else 4
    loop = build_train_loop(model, tx, schedule, steps_per_loop=K, mesh=None,
                            donate=True)
    data = jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a)[None], (K,) + a.shape),
        (x, y))
    lowered = loop.lower(state, data)
    return lowered.compile().as_text()


def index_hlo(text: str):
    """{op_name: root line} for every computation/instruction definition."""
    roots = {}
    # fused computations appear as: %name.123 (...) -> ... { ... ROOT ... }
    # instruction defs appear as: %opname.N = type op(...)
    for m in re.finditer(r'^\s*(?:ROOT )?%?([\w.\-]+) = (.+)$', text, re.M):
        name, rhs = m.group(1), m.group(2)
        roots.setdefault(name, rhs[:220])
    return roots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('trace_dir')
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--tile', type=int, default=512)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--steps', type=int, default=10,
                    help='optimizer steps the trace spans (divide to /step)')
    ap.add_argument('--no-hlo', action='store_true',
                    help='skip the compile; times only')
    args = ap.parse_args()

    times, counts = load_trace(args.trace_dir)
    roots = {}
    if not args.no_hlo:
        roots = index_hlo(vit_hlo(args.tile, args.batch))

    # drop the outer containers
    skip = re.compile(r'^(jit_|while$|copy-start|copy-done|slice-done)')
    rows = [(us, n) for n, us in times.items() if not skip.match(n)]
    rows.sort(reverse=True)
    total = sum(us for us, _ in rows)
    print(f'# total leaf device time: {total / 1000:.1f} ms '
          f'({total / 1000 / args.steps:.2f} ms/step over {args.steps} steps)')
    print(f'{"us/step":>10} {"count":>6}  name :: hlo-root')
    for us, name in rows[:args.top]:
        root = roots.get(name, '')
        print(f'{us / args.steps:10.1f} {counts[name]:6d}  {name} :: {root}')


if __name__ == '__main__':
    main()
