"""Tensor-parallel parameter shardings (for the big ViT backbones).

The reference has no TP (SURVEY.md §2.9 — DDP only); this is the additive
capability that makes ``vit_7b16_sat493m`` (4096-dim, 40 layers) trainable:
attention/MLP weight matrices are sharded along a ``'model'`` mesh axis and
XLA GSPMD inserts the all-gathers/reduce-scatters over ICI — the standard
Megatron layout expressed purely as ``NamedSharding`` placement rules, no
model-code changes.

Rules (path-suffix matched):

- qkv / MLP up-projection (``w12``, ``fc1``) kernels → ``P(None, 'model')``
  (column parallel);
- attention out-proj / MLP down-projection (``w3``, ``fc2``) kernels →
  ``P('model', None)`` (row parallel);
- everything else (norms, biases, patch embed, tokens) replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['vit_tp_shardings', 'apply_tp']

_COLUMN_SUFFIXES = ('attn/qkv/kernel', 'mlp/w12/kernel', 'mlp/fc1/kernel')
_ROW_SUFFIXES = ('attn/proj/kernel', 'mlp/w3/kernel', 'mlp/fc2/kernel')


def _spec_for(path: str, axis: str) -> P:
    if any(path.endswith(s) for s in _COLUMN_SUFFIXES):
        return P(None, axis)
    if any(path.endswith(s) for s in _ROW_SUFFIXES):
        return P(axis, None)
    return P()


def vit_tp_shardings(params: Any, mesh: Mesh, axis: str = 'model') -> Any:
    """Build a params-shaped pytree of NamedShardings (Megatron layout)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for path, leaf in flat:
        path_str = '/'.join(str(getattr(k, 'key', k)) for k in path)
        spec = _spec_for(path_str, axis)
        # divisibility guard: replicate anything that doesn't split evenly
        k = mesh.shape[axis]
        for dim, name in zip(range(leaf.ndim), spec):
            if name == axis and leaf.shape[dim] % k != 0:
                spec = P()
                break
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def apply_tp(params: Any, mesh: Mesh, axis: str = 'model') -> Any:
    """Place params according to the TP layout (data movement only)."""
    return jax.device_put(params, vit_tp_shardings(params, mesh, axis))
