"""Mosaic compile-cost profile for the fused attention kernels (VERDICT r4 #2).

The r4 VMEM-scratch backward tripled the ViT-L 1024² cold compile (5 → 17
min).  This tool isolates WHERE the time goes: it compiles the fused
attention forward+backward STANDALONE (one pallas_call pair, no ViT around
it) for a grid of ``EVER_ATTN_BQ_CAP`` values and both bench geometries,
each in a fresh subprocess with the persistent cache disabled, and reports
lower-vs-compile wall seconds.  Mosaic instruction count scales with the
per-program score footprint (bq x S), so smaller q-blocks should compile
proportionally faster at (measured, r4) equal step time — this quantifies
the trade to pick the compile-lean default.

    python tools/compile_cost.py                    # both geometries, caps 128/256/384
    python tools/compile_cost.py --s 4224 --caps 128 384
    python tools/compile_cost.py --child ...        # (internal) one measurement
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def child(s: int, cap: int, what: str) -> None:
    os.environ['EVER_COMPILE_CACHE'] = '0'
    os.environ['EVER_ATTN_BQ_CAP'] = str(cap)
    import jax
    import jax.numpy as jnp

    from ever_tpu.ops.attention import _fused

    b, h, d = 2, 16, 64
    q = jnp.zeros((b, h, s, d), jnp.bfloat16)

    if what == 'fwd':
        def fn(q, k, v):
            return jnp.sum(_fused(q, k, v, layout='bhnd').astype(jnp.float32))
    else:
        def fn(q, k, v):
            out, vjp = jax.vjp(
                lambda *a: _fused(*a, layout='bhnd'), q, k, v)
            dq, dk, dv = vjp(jnp.ones_like(out))
            return (jnp.sum(out.astype(jnp.float32))
                    + sum(jnp.sum(g.astype(jnp.float32))
                          for g in (dq, dk, dv)))

    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(q, q, q)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    # one execution to confirm the kernel actually runs
    val = float(jax.device_get(compiled(q, q, q)))
    t3 = time.perf_counter()
    print(json.dumps(dict(s=s, cap=cap, what=what,
                          lower_s=round(t1 - t0, 2),
                          compile_s=round(t2 - t1, 2),
                          first_run_s=round(t3 - t2, 2),
                          value=val)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--s', type=int, nargs='*', default=[1152, 4224])
    ap.add_argument('--caps', type=int, nargs='*', default=[128, 256, 384])
    ap.add_argument('--what', nargs='*', default=['fwd', 'fwdbwd'])
    ap.add_argument('--child', nargs=3, default=None,
                    help='(internal) S CAP WHAT')
    ap.add_argument('--timeout', type=int, default=3600)
    args = ap.parse_args()

    if args.child:
        child(int(args.child[0]), int(args.child[1]), args.child[2])
        return

    rows = []
    for s in args.s:
        for cap in args.caps:
            for what in args.what:
                t0 = time.time()
                try:
                    proc = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         '--child', str(s), str(cap), what],
                        capture_output=True, text=True, timeout=args.timeout)
                    line = proc.stdout.strip().splitlines()[-1] \
                        if proc.stdout.strip() else ''
                    row = json.loads(line) if line.startswith('{') else dict(
                        s=s, cap=cap, what=what,
                        error=proc.stderr.strip()[-200:])
                except subprocess.TimeoutExpired:
                    row = dict(s=s, cap=cap, what=what, error='timeout')
                row['wall_s'] = round(time.time() - t0, 1)
                rows.append(row)
                print(row, flush=True)
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
