"""Path-parity module: ``ever.module.dinov3.utils.utils`` (reference
``dinov3/utils/utils.py:19-129``), re-expressed over param pytrees — flax has
no mutable module tree, so ``named_replace``/``named_apply`` walk the
``{'params': ...}`` dict with torch-style dotted names.
"""

from __future__ import annotations

import os
import random
import subprocess
from typing import Callable, Optional, Tuple

import numpy as np

from ever_tpu.module.vit import cat_keep_shapes, uncat_with_shapes

__all__ = ['cat_keep_shapes', 'uncat_with_shapes', 'named_replace',
           'named_apply', 'fix_random_seeds', 'get_sha', 'get_conda_env',
           'count_parameters', 'has_batchnorms']


def named_replace(fn: Callable, tree, name: str = '', depth_first: bool = True,
                  include_root: bool = False):
    """Rebuild a pytree, calling ``fn(module=subtree, name=dotted)`` on every
    dict node (parity: ``utils.py:33-55``; "module" = param subtree here)."""
    if not depth_first and include_root:
        tree = fn(module=tree, name=name)
    if isinstance(tree, dict):
        tree = {k: named_replace(fn, v, f'{name}.{k}' if name else str(k),
                                 depth_first, True)
                for k, v in tree.items()}
    if depth_first and include_root:
        tree = fn(module=tree, name=name)
    return tree


def named_apply(fn: Callable, tree, name: str = '', depth_first: bool = True,
                include_root: bool = False):
    """Visit-only variant (parity: ``utils.py:58-78``)."""
    if not depth_first and include_root:
        fn(module=tree, name=name)
    if isinstance(tree, dict):
        for k, v in tree.items():
            named_apply(fn, v, f'{name}.{k}' if name else str(k),
                        depth_first, True)
    if depth_first and include_root:
        fn(module=tree, name=name)
    return tree


def fix_random_seeds(seed: int = 31):
    """Parity: ``utils.py:81-88``.  JAX randomness is keyed explicitly; this
    seeds the HOST-side generators (numpy/random) used by loaders and
    returns a ``jax.random.PRNGKey(seed)`` for device-side use."""
    np.random.seed(seed)
    random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)


def get_sha() -> str:
    """Parity: ``utils.py:91-109``."""
    cwd = os.path.dirname(os.path.abspath(__file__))

    def _run(cmd):
        return subprocess.check_output(cmd, cwd=cwd).decode('ascii').strip()

    sha, diff, branch = 'N/A', 'clean', 'N/A'
    try:
        sha = _run(['git', 'rev-parse', 'HEAD'])
        subprocess.check_output(['git', 'diff'], cwd=cwd)
        diff = _run(['git', 'diff-index', 'HEAD'])
        diff = 'has uncommitted changes' if diff else 'clean'
        branch = _run(['git', 'rev-parse', '--abbrev-ref', 'HEAD'])
    except Exception:
        pass
    return f'sha: {sha}, status: {diff}, branch: {branch}'


def get_conda_env() -> Tuple[Optional[str], Optional[str]]:
    """Parity: ``utils.py:112-115``."""
    return (os.environ.get('CONDA_DEFAULT_ENV'),
            os.environ.get('CONDA_PREFIX'))


def count_parameters(params) -> int:
    """Parity: ``utils.py:118-122`` over a param pytree (or an ERModule —
    pass its initialized ``variables['params']``)."""
    import jax
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def has_batchnorms(variables) -> bool:
    """Parity: ``utils.py:125-129``: True if the variables carry BN running
    stats (flax keeps them in the ``batch_stats`` collection)."""
    if isinstance(variables, dict) and 'batch_stats' in variables:
        import jax
        return bool(jax.tree_util.tree_leaves(variables['batch_stats']))
    return False
