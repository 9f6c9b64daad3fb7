"""ZeRO-style sharded training state over the ``data`` mesh axis.

The reference replicates optimizer state on every rank
(``ever/core/checkpoint.py:52-59`` — one full ``opt.state_dict()`` per GPU);
FSDP/ZeRO is explicitly absent (SURVEY.md §2.9).  On TPU this capability is
a *sharding annotation*, not an engine: give each optimizer-state (ZeRO-1)
or parameter (ZeRO-3) leaf a ``NamedSharding`` partitioned over the ``data``
axis and XLA/GSPMD inserts the reduce-scatter/all-gather collectives over
ICI inside the one compiled step.

Levels
------
- ``level=1``: optimizer state sharded, params replicated.  Memory: one
  momentum/adam-moment copy split across the data axis; the update math is
  computed shardwise and the parameter delta all-gathered.
- ``level=3``: params AND optimizer state sharded.  XLA all-gathers each
  weight just-in-time inside forward/backward (GSPMD's default lowering)
  and reduce-scatters gradients — the standard JAX "fully sharded" recipe
  from the scaling playbook.

Leaves are sharded along their largest dimension divisible by the mesh axis
size; indivisible leaves stay replicated (scalars like Adam's ``count``,
tiny biases).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['shard_leaf_sharding', 'zero_shardings', 'zero_init']


def shard_leaf_sharding(leaf, mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Sharding for one array: partition the largest divisible dim on ``axis``."""
    n = mesh.shape[axis]
    shape = np.shape(leaf)
    if n <= 1 or not shape:
        return NamedSharding(mesh, P())
    dims = [d for d in range(len(shape)) if shape[d] % n == 0 and shape[d] >= n]
    if not dims:
        return NamedSharding(mesh, P())
    best = max(dims, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[best] = axis
    return NamedSharding(mesh, P(*spec))


def zero_shardings(state, mesh: Mesh, level: int = 1, axis: str = 'data'):
    """Per-leaf sharding pytree for a :class:`TrainState` (same treedef).

    ``level=1`` shards ``opt_state`` leaves; ``level=3`` also shards
    ``params``.  ``batch_stats`` and ``step`` stay replicated (they are tiny
    and consumed by every shard of the forward pass).
    """
    if level not in (1, 3):
        raise ValueError('ZeRO level must be 1 or 3')
    rep = NamedSharding(mesh, P())

    def leaf_sh(x):
        return shard_leaf_sharding(x, mesh, axis)

    return state.replace(
        step=rep,
        params=(jax.tree.map(leaf_sh, state.params) if level == 3
                else jax.tree.map(lambda _: rep, state.params)),
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        opt_state=jax.tree.map(leaf_sh, state.opt_state),
    )


def zero_init(state, mesh: Mesh, level: int = 1, axis: str = 'data'):
    """Place an existing (host/replicated) TrainState with ZeRO shardings.

    Returns ``(sharded_state, shardings)``; pass ``shardings`` as
    ``state_shardings=`` to :func:`ever_tpu.parallel.spmd.build_train_step`
    or ``build_train_loop``.
    """
    shardings = zero_shardings(state, mesh, level, axis)
    placed = jax.tree.map(jax.device_put, state, shardings)
    return placed, shardings
