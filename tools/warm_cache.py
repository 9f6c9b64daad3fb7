"""Warm the persistent XLA compile cache for every benchmark geometry.

VERDICT r3 #6: a cold Mosaic compile of the fused-attention ViT-L train
step at the 512² geometry (B8 N1029 H16) once took **42 minutes**; the
persistent cache (``~/.cache/ever_tpu/xla``, enabled by ``import
ever_tpu``) absorbs it on every later run.  This tool pays all compile
costs OFF the timing path: run it once after pulling the repo (or after
changing model code), then ``bench.py`` / training runs start hot.

Each section runs in its own process (one TPU tunnel client at a time);
wall-clock per section is reported, so this doubles as the cold-vs-warm
compile cost record.

    python tools/warm_cache.py                    # all bench sections
    python tools/warm_cache.py --sections vit512  # just the landmine
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every distinct program geometry bench.py compiles, most expensive first
SECTIONS = ['vit512', 'vit1024', 'vitinfer', 'farseg', 'infer']
TIMEOUT = {'vit512': 3600, 'vit1024': 3600, 'vitinfer': 2400,
           'farseg': 2400, 'infer': 2400}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sections', nargs='*', default=SECTIONS)
    args = ap.parse_args()

    results = {}
    for name in args.sections:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, 'bench.py'),
                 '--section', name],
                env=dict(os.environ, EVER_BENCH_WAIT=os.environ.get(
                    'EVER_BENCH_WAIT', '1800')),
                capture_output=True, text=True, timeout=TIMEOUT.get(name, 2400))
            ok = proc.returncode == 0
            err = '' if ok else proc.stderr.strip()[-200:]
        except subprocess.TimeoutExpired:
            ok, err = False, 'timeout'
        dt = time.time() - t0
        results[name] = dict(ok=ok, wall_s=round(dt, 1), **(
            {} if not err else dict(error=err)))
        print(f'{name}: {"OK" if ok else "FAIL"} in {dt:.0f}s', flush=True)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
