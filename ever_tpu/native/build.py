"""Build the tilekit native library: ``python -m ever_tpu.native.build``.

Compiles ``tilekit.cpp`` to ``_tilekit.so`` next to this file with g++.
Also invoked lazily (once) on first import of :mod:`ever_tpu.native` when
the .so is missing or older than the source; failures degrade to the numpy
fallbacks, never break import.
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, 'tilekit.cpp')
LIB = os.path.join(_DIR, '_tilekit.so')


def needs_build() -> bool:
    return (not os.path.exists(LIB)
            or os.path.getmtime(LIB) < os.path.getmtime(SRC))


def build(verbose: bool = False) -> str:
    # per-process tmp name: concurrent first-use builders (e.g. the
    # 2-process trainer validation) must not interleave writes into one tmp
    # file; each compiles privately, then the os.replace is atomic
    tmp = f'{LIB}.tmp.{os.getpid()}'
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread',
           '-o', tmp, SRC]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if proc.returncode != 0:
            raise RuntimeError(f'tilekit build failed:\n{proc.stderr}')
        os.replace(tmp, LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if verbose:
        print(f'built {LIB}')
    return LIB


if __name__ == '__main__':
    build(verbose=True)
    sys.exit(0)
