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
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, 'tilekit.cpp')
LIB = os.path.join(_DIR, '_tilekit.so')
_BUILD_LOCK = threading.Lock()


def needs_build() -> bool:
    if not os.path.exists(LIB):
        return True
    if not os.path.exists(SRC):
        # sources pruned (e.g. a binary deployment): the prebuilt .so is
        # authoritative — getmtime(SRC) would raise and disable it
        return False
    return os.path.getmtime(LIB) < os.path.getmtime(SRC)


def build(verbose: bool = False) -> str:
    # per-process AND per-thread tmp name: concurrent first-use builders
    # (2-process trainer validation, thread-pool loader workers) must not
    # interleave writes into one tmp file; each compiles privately, then
    # the os.replace is atomic
    tmp = f'{LIB}.tmp.{os.getpid()}.{threading.get_ident()}'
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
