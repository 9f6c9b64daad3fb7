"""A/B time DINOv3 ViT-L/16 (DinoSeg) train-step variants in ONE TPU process.

VERDICT r2 #1: prove + optimize the transformer training path.  Variants
cover the knobs that matter on TPU: per-block remat policy (None | 'dots' |
'full'), attention impl (auto → the fused VMEM kernel at both 512² [1029
tokens] and 1024² [4101 tokens] — anything in the 512–16384 token window
after the r4 sweep; flash only above 16384; force 'xla' to measure the
kernel win under value_and_grad).

Usage:
    python tools/vit_ab.py                       # default grid
    python tools/vit_ab.py 512/none/auto 1024/dots/auto
    python tools/vit_ab.py --trace /tmp/vit 1024/none/auto

One process = one TPU tunnel client; every variant compiles+times here.
Timing: K-step scan loops, median of --steps loops, host-fetch sync
(block_until_ready returns early on the axon backend).  MFU uses the honest
unpacked-FLOPs twin (tools/ref_flops.py --model vit: XLA attention, no
remat — flash's token padding and remat recompute are real work but not
useful work).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# captured at startup: a user-exported cap applies to variants without
# an explicit bqN token (ADVICE r4 #1)
_AMBIENT_BQ_CAP = os.environ.get('EVER_ATTN_BQ_CAP')
_AMBIENT_PAD_UNIT = os.environ.get('EVER_ATTN_PAD_UNIT')
_AMBIENT_FUSED_LN = os.environ.get('EVER_FUSED_LN')
_AMBIENT_ROPE_KERNEL = os.environ.get('EVER_ROPE_KERNEL')
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# variant = tile/remat/attn  (remat: none|dots|full; attn: auto|xla|flash)
DEFAULT_GRID = [
    '512/none/auto',
    '512/dots/auto',
    '1024/none/auto',      # auto → fused (4101 tokens < the 16384 threshold)
    '1024/none/xla',       # the O(N²) baseline the fused kernel must beat
    '1024/dots/auto',
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('variants', nargs='*')
    ap.add_argument('--trace', default=None)
    ap.add_argument('--steps', type=int, default=3, help='timing loops of K')
    ap.add_argument('--batch512', type=int, default=8)
    ap.add_argument('--batch1024', type=int, default=2)
    ap.add_argument('--backbone', default='vitl16_sat493m')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ever_tpu  # noqa: F401  (enables the persistent compile cache)
    from ever_tpu.core import builder
    from ever_tpu.parallel.spmd import build_train_loop, create_train_state

    dev = jax.devices()[0]
    peak = {'v5': 197e12, 'v4': 275e12, 'v6': 918e12}.get(
        dev.device_kind.lower()[:2], 197e12)
    print(f'device: {dev.device_kind}', flush=True)

    schedule = builder.make_learningrate(
        {'type': 'cosine', 'params': dict(base_lr=1e-4, max_iters=1000)})
    factory, _ = builder.make_optimizer(
        {'type': 'adamw', 'params': dict(weight_decay=0.05)})
    tx = factory.build(schedule)

    import subprocess
    flops_cache = {}

    def ref_flops(tile, batch):
        if (tile, batch) not in flops_cache:
            try:
                out = subprocess.run(
                    [sys.executable,
                     os.path.join(_REPO, 'tools', 'ref_flops.py'),
                     '--model', 'vit', '--tile', str(tile),
                     '--batch', str(batch), '--backbone', args.backbone],
                    capture_output=True, text=True, timeout=900)
                flops_cache[(tile, batch)] = float(
                    out.stdout.strip().splitlines()[-1])
            except Exception as e:   # a FLOPs miss must never lose the timing
                print(f'ref_flops failed ({e})', flush=True)
                flops_cache[(tile, batch)] = 0.0
        return flops_cache[(tile, batch)]

    results = {}
    for spec in (args.variants or DEFAULT_GRID):
        parts = spec.split('/')
        tile_s, remat_s, attn = parts[:3]
        tile = int(tile_s)
        remat = None if remat_s == 'none' else remat_s
        batch = args.batch512 if tile <= 512 else args.batch1024
        # optional extra fields: kN overrides steps-per-dispatch (k1
        # isolates the scan-carry cost: 4.9 GB of ViT-L fp32 state rides
        # the K-scan); 'bhnd' selects the native-kernel-layout qkv path;
        # 'pad'/'nopad' force stack-level token padding on/off (default
        # auto — module/vit.py pad_tokens); 'bqN' sets EVER_ATTN_BQ_CAP
        # for this variant (0 = whole-S blocks; Mosaic compile-time knob)
        K = 10 if tile <= 512 else 4
        layout = 'bnhd'
        pad_tokens = None
        # bqN is per-variant, but an ambient user-exported cap must
        # survive variants WITHOUT a bqN token (ADVICE r4 #1)
        if _AMBIENT_BQ_CAP is None:
            os.environ.pop('EVER_ATTN_BQ_CAP', None)
        else:
            os.environ['EVER_ATTN_BQ_CAP'] = _AMBIENT_BQ_CAP
        if _AMBIENT_PAD_UNIT is None:
            os.environ.pop('EVER_ATTN_PAD_UNIT', None)
        else:
            os.environ['EVER_ATTN_PAD_UNIT'] = _AMBIENT_PAD_UNIT
        if _AMBIENT_FUSED_LN is None:
            os.environ.pop('EVER_FUSED_LN', None)
        else:
            os.environ['EVER_FUSED_LN'] = _AMBIENT_FUSED_LN
        if _AMBIENT_ROPE_KERNEL is None:
            os.environ.pop('EVER_ROPE_KERNEL', None)
        else:
            os.environ['EVER_ROPE_KERNEL'] = _AMBIENT_ROPE_KERNEL
        for extra in parts[3:]:
            if extra in ('bhnd', 'bnhd'):
                layout = extra
            elif extra == 'pad':
                pad_tokens = True
            elif extra == 'nopad':
                pad_tokens = False
            elif extra.startswith('bq'):
                os.environ['EVER_ATTN_BQ_CAP'] = extra[2:]
            elif extra in ('rk0', 'rk1'):
                # in-kernel RoPE on/off (ops/attention.py; default on)
                os.environ['EVER_ROPE_KERNEL'] = extra[-1]
            elif extra in ('fln0', 'fln1'):
                # fused Pallas LayerNorm on/off (ops/norm.py; default on)
                os.environ['EVER_FUSED_LN'] = extra[-1]
            elif extra.startswith('pu'):
                # 'puauto' / 'pu8' / 'pu128': EVER_ATTN_PAD_UNIT for this
                # variant (adaptive kernel pad target, ops/attention.py)
                os.environ['EVER_ATTN_PAD_UNIT'] = extra[2:]
            elif extra.startswith('k'):
                K = int(extra[1:])

        model = builder.make_model({'type': 'DinoSeg', 'params': dict(
            backbone=dict(name=args.backbone, remat=remat,
                          attn_impl=None if attn == 'auto' else attn,
                          attn_layout=layout, pad_tokens=pad_tokens),
            classes=7, dtype='bfloat16')})
        rng = np.random.default_rng(0)
        x = rng.normal(size=(batch, tile, tile, 3)).astype(jnp.bfloat16)
        y = rng.integers(0, 7, size=(batch, tile, tile)).astype(np.int32)

        t0 = time.perf_counter()
        bufs = {}   # every device reference lives here → finally can free it
        try:
            bufs['state'] = create_train_state(model, tx, (x, y),
                                               rng=jax.random.key(0))
            bufs['data'] = jax.device_put((jnp.asarray(x), jnp.asarray(y)))
            bufs['loop_data'] = jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (K,) + a.shape),
                bufs['data'])
            # donate=True matches bench._bench_vit EXACTLY (same HLO → the
            # persistent compile cache is shared) and caps the HBM
            # high-water at one 3.6 GB optimizer state — the tunnel frees
            # buffers lazily, and back-to-back loop dispatches with
            # donate=False transiently held 2-3 copies (OOM on v5e-16GB).
            loop = build_train_loop(model, tx, schedule, steps_per_loop=K,
                                    donate=True)

            def sync():
                return float(jax.device_get(jnp.sum(
                    bufs['state'].params['head_classifier']['bias'])))

            bufs['state'], _ = loop(bufs['state'], bufs['loop_data'])
            sync()
            print(f'{spec}: compiled+1st loop in '
                  f'{time.perf_counter() - t0:.1f}s', flush=True)
            times = []
            for _ in range(args.steps):
                t0 = time.perf_counter()
                bufs['state'], _ = loop(bufs['state'], bufs['loop_data'])
                sync()
                times.append((time.perf_counter() - t0) / K)
            dt = statistics.median(times)
            f = ref_flops(tile, batch)
            mfu = f / dt / peak if f else 0.0
            results[spec] = (dt * 1e3, mfu, batch / dt)
            print(f'{spec}: {dt * 1e3:.2f} ms/step  mfu={mfu:.4f}  '
                  f'{batch / dt:.1f} tiles/s', flush=True)

            if args.trace:
                jax.profiler.start_trace(f'{args.trace}_{spec.replace("/", "_")}')
                bufs['state'], _ = loop(bufs['state'], bufs['loop_data'])
                sync()
                jax.profiler.stop_trace()
        except Exception as e:
            results[spec] = None
            print(f'{spec}: FAILED {str(e)[:300]}', flush=True)
        finally:
            # free device buffers even on failure — a leaked state from a
            # failed variant OOMs every later one
            bufs.clear()
            import gc
            gc.collect()
        del model

    print('\n== summary (ms/step, mfu, tiles/s) ==')
    for k, v in sorted(results.items(),
                       key=lambda kv: kv[1][0] if kv[1] else 1e9):
        print(f'{k:>18}: ' + (f'{v[0]:8.2f}  {v[1]:.4f}  {v[2]:7.1f}'
                              if v else '  FAILED'))


if __name__ == '__main__':
    main()
