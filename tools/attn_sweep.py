"""Sweep fused vs XLA vs flash attention over token counts (VERDICT r3 #7).

The auto-dispatch thresholds in ``ops/attention.py``
(``FUSED_TOKEN_THRESHOLD`` / ``FLASH_TOKEN_THRESHOLD``) were set from two
data points (N=1029, N=4101); this sweep measures forward AND
forward+backward step time for each impl over
N ∈ {256, 512, 1k, 2k, 3k, 4k, 5k, 8k, 16k} at the ViT-L head geometry
(H=16, D=64), so the crossovers are data, not extrapolation.

Batch is chosen so B*N ≈ 8k tokens (clamped to [1, 8]) — the regime real
tile batches occupy (512² B8 → 8232 tok·batch, 1024² B2 → 8202).

    python tools/attn_sweep.py                 # full grid (long: Mosaic
                                               # compiles; cache-warm reruns
                                               # are minutes)
    python tools/attn_sweep.py --ns 1024 3072  # subset
    python tools/attn_sweep.py --impls xla fused

Results land in docs/PERFORMANCE.md ("attention dispatch thresholds").
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

DEFAULT_NS = [256, 512, 1024, 2048, 3072, 4096, 5120, 8192, 16384]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ns', type=int, nargs='*', default=DEFAULT_NS)
    ap.add_argument('--impls', nargs='*', default=['xla', 'fused', 'flash'])
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--windows', type=int, default=3)
    ap.add_argument('--heads', type=int, default=16)
    ap.add_argument('--dim', type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    import ever_tpu  # noqa: F401  (persistent compile cache)
    from ever_tpu.ops.attention import attention

    dev = jax.devices()[0]
    print(f'device: {dev.device_kind} (platform={dev.platform})', flush=True)
    rng = np.random.default_rng(0)

    def timed(fn, *xs):
        out = fn(*xs)
        jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out)
                       .astype(jnp.float32))  # host-fetch sync
        meds = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*xs)
            jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out)
                           .astype(jnp.float32))
            meds.append((time.perf_counter() - t0) / args.iters)
        return statistics.median(meds) * 1000  # ms

    header = (f'{"N":>6} {"B":>3} ' +
              ''.join(f'{im + "-fwd":>12} {im + "-f+b":>12} '
                      for im in args.impls) + f'{"maxdiff":>10}')
    print(header, flush=True)
    rows = []
    for n in args.ns:
        b = max(1, min(8, round(8192 / n)))
        q, k, v = (jnp.asarray(rng.normal(size=(b, n, args.heads, args.dim)),
                               jnp.bfloat16) for _ in range(3))
        row = {'n': n, 'b': b}
        ref_out = None
        cells = ''
        for im in args.impls:
            fwd = jax.jit(partial(attention, impl=im))

            def loss(q, k, v, _fwd=fwd):
                return jnp.sum(_fwd(q, k, v).astype(jnp.float32) ** 2)

            fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                t_compile0 = time.perf_counter()
                t_fwd = timed(fwd, q, k, v)
                t_fb = timed(fb, q, k, v)
                compile_s = time.perf_counter() - t_compile0
                out = fwd(q, k, v)
                if ref_out is None:
                    ref_out = out
                    diff = 0.0
                else:
                    diff = float(jnp.max(jnp.abs(
                        out.astype(jnp.float32) -
                        ref_out.astype(jnp.float32))))
                row[im] = dict(fwd_ms=round(t_fwd, 3), fb_ms=round(t_fb, 3),
                               compile_s=round(compile_s, 1),
                               maxdiff=round(diff, 5))
                cells += f'{t_fwd:>12.3f} {t_fb:>12.3f} '
            except Exception as e:
                row[im] = dict(error=str(e)[:120])
                cells += f'{"ERR":>12} {"ERR":>12} '
        last_diff = max((row[im].get('maxdiff', 0.0) for im in args.impls
                         if isinstance(row.get(im), dict)), default=0.0)
        print(f'{n:>6} {b:>3} ' + cells + f'{last_diff:>10.5f}', flush=True)
        rows.append(row)

    import json
    print(json.dumps(rows), flush=True)


if __name__ == '__main__':
    main()
