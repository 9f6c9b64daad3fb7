"""Sharded/abstract TrainState creation — states too big for one chip.

The reference ships the 6.7 B-parameter ``vit7b16_sat493m`` configuration
(``ever/module/dinov3/models/vision_transformer.py:430-476``; size ladder to
``vit_7b`` at ``:418-427``) but trains it with externally-managed FSDP — the
library itself only ever materializes full replicated states
(``ever/core/checkpoint.py:52-59``).  On TPU a 6.7 B AdamW TrainState is
~27 GB fp32 params + ~54 GB moments: it must NEVER exist replicated on a
16 GB v5e chip, not even transiently at init or restore time.

The TPU-native recipe (standard JAX scaling-playbook shape):

1. :func:`abstract_train_state` — ``jax.eval_shape`` of the full init
   (zero FLOPs, zero memory) → a TrainState of ``jax.ShapeDtypeStruct``.
2. :func:`sharded_state_shardings` — a per-leaf ``NamedSharding`` tree over
   the abstract state: Megatron TP specs for attention/FFN weight matrices
   (suffix rules shared with :mod:`ever_tpu.parallel.tp` — they match the
   mirrored leaves inside optimizer moments too), composed with ZeRO-style
   partitioning of the largest remaining divisible dim over the data axis
   (level=3: params + optimizer state; level=1: optimizer state only).
3. :func:`create_train_state_sharded` — ``jax.jit(init,
   out_shardings=...)``: XLA materializes every leaf DIRECTLY into its
   shards; no host-side or replicated copy ever exists.
4. Restore without gathering: ``CheckPoint.restore_sharded`` (orbax reads
   each leaf straight into its ``NamedSharding`` placement).

Unlike :func:`ever_tpu.parallel.zero.zero_init` (which places an EXISTING
host/replicated state — fine for CNN-sized models), this path never asks
for the unsharded state at all.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ever_tpu.parallel.spmd import TrainState, _model_args
from ever_tpu.parallel.tp import _COLUMN_SUFFIXES, _ROW_SUFFIXES

__all__ = ['abstract_train_state', 'sharded_state_shardings',
           'create_train_state_sharded', 'assert_sharded_below']

# leaves smaller than this stay replicated: sharding a 16 KB LayerScale
# vector buys nothing and costs collective latency
_MIN_SHARD_BYTES = 1 << 20


def _as_spec(sample_batch):
    """Sample batch → ShapeDtypeStruct pytree (drops any concrete data)."""
    return jax.tree.map(
        lambda x: x if isinstance(x, jax.ShapeDtypeStruct)
        else jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        sample_batch)


def _init_fn(model, tx, sample_spec) -> Callable:
    """Init closure over an abstract sample: the zeros stand-in batch is
    created INSIDE the traced function, so under jit it is constant-folded
    and under eval_shape it is free — no sample data ever hits a device."""
    def init(rng):
        batch = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             sample_spec)
        variables = model.init(
            {'params': rng, 'dropout': jax.random.fold_in(rng, 1)},
            *_model_args(batch), train=True)
        params = variables['params']
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=variables.get('batch_stats', {}),
                          opt_state=tx.init(params))
    return init


def abstract_train_state(model, tx, sample_batch, rng=None) -> TrainState:
    """The full TrainState as ``jax.ShapeDtypeStruct`` leaves (eval_shape —
    no memory, no FLOPs).  ``sample_batch`` leaves may themselves be
    ShapeDtypeStructs."""
    if rng is None:
        rng = jax.random.key(0)
    return jax.eval_shape(_init_fn(model, tx, _as_spec(sample_batch)), rng)


def _leaf_spec(path_str: str, shape, mesh: Mesh, level: int,
               data_axis: str, tp_axis: Optional[str],
               min_shard_bytes: int, nbytes: int) -> P:
    """Sharding spec for one leaf: TP suffix rule, then ZeRO data-axis fill.

    The TP suffix tables match both ``params/...`` paths and their mirrors
    inside optimizer moments (``opt_state/.../mu/...`` ends with the same
    ``attn/qkv/kernel`` suffix), so moments shard exactly like their
    parameter.
    """
    in_params = 'params/' in path_str or path_str.startswith('params')
    in_opt = 'opt_state' in path_str
    if 'batch_stats' in path_str or path_str == 'step':
        return P()
    if nbytes < min_shard_bytes or not shape:
        return P()

    spec = [None] * len(shape)
    if tp_axis is not None and tp_axis in mesh.shape:
        k = mesh.shape[tp_axis]
        if any(path_str.endswith(s) for s in _COLUMN_SUFFIXES) \
                and len(shape) >= 2 and shape[-1] % k == 0:
            spec[-1] = tp_axis
        elif any(path_str.endswith(s) for s in _ROW_SUFFIXES) \
                and len(shape) >= 2 and shape[0] % k == 0:
            spec[0] = tp_axis

    # ZeRO fill over the data axis: params only at level 3, optimizer
    # moments always (level >= 1).  Pick the largest divisible dim not
    # already taken by TP.
    zero_applies = (in_opt and level >= 1) or (in_params and level >= 3)
    if zero_applies:
        n = mesh.shape[data_axis]
        if n > 1:
            free = [d for d in range(len(shape))
                    if spec[d] is None and shape[d] % n == 0 and shape[d] >= n]
            if free:
                best = max(free, key=lambda d: shape[d])
                spec[best] = data_axis
    return P(*spec)


def sharded_state_shardings(abstract_state: TrainState, mesh: Mesh, *,
                            level: int = 3, data_axis: str = 'data',
                            tp_axis: Optional[str] = None,
                            min_shard_bytes: int = _MIN_SHARD_BYTES):
    """Per-leaf ``NamedSharding`` tree (same treedef as the state)."""
    if level not in (1, 3):
        raise ValueError('ZeRO level must be 1 or 3')
    if data_axis not in mesh.shape:
        raise ValueError(f'mesh has no axis {data_axis!r}: {dict(mesh.shape)}')
    flat, treedef = jax.tree_util.tree_flatten_with_path(abstract_state)
    out = []
    for path, leaf in flat:
        path_str = '/'.join(str(getattr(k, 'key', getattr(k, 'name', k)))
                            for k in path)
        shape = tuple(getattr(leaf, 'shape', ()))
        nbytes = getattr(leaf, 'size', 0) * jnp.dtype(
            getattr(leaf, 'dtype', jnp.float32)).itemsize
        out.append(NamedSharding(mesh, _leaf_spec(
            path_str, shape, mesh, level, data_axis, tp_axis,
            min_shard_bytes, nbytes)))
    return jax.tree_util.tree_unflatten(treedef, out)


def create_train_state_sharded(model, tx, sample_batch, mesh: Mesh, *,
                               level: int = 3, data_axis: str = 'data',
                               tp_axis: Optional[str] = None, rng=None,
                               min_shard_bytes: int = _MIN_SHARD_BYTES,
                               ) -> Tuple[TrainState, Any]:
    """Materialize a TrainState DIRECTLY sharded over ``mesh``.

    Returns ``(state, shardings)``; pass ``shardings`` as
    ``state_shardings=`` to :func:`ever_tpu.parallel.spmd.build_train_step`
    / ``build_train_loop``, and to ``CheckPoint.restore_sharded``.

    No leaf above ``min_shard_bytes`` with a divisible dim ever exists
    replicated: the init runs as ONE jitted program whose out_shardings
    place each shard on its device as it is produced.  Same RNG stream as
    :func:`ever_tpu.parallel.spmd.create_train_state`, so small-model
    parity is testable (``tests/test_sharded_init.py``).
    """
    if rng is None:
        rng = jax.random.key(0)
    abstract = abstract_train_state(model, tx, sample_batch, rng)
    shardings = sharded_state_shardings(
        abstract, mesh, level=level, data_axis=data_axis, tp_axis=tp_axis,
        min_shard_bytes=min_shard_bytes)
    init = jax.jit(_init_fn(model, tx, _as_spec(sample_batch)),
                   out_shardings=shardings)
    return init(rng), shardings


def assert_sharded_below(state, max_replicated_bytes: int) -> None:
    """Assert no leaf larger than ``max_replicated_bytes`` is fully
    replicated (the 7B-usability invariant)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    offenders = []
    for path, leaf in flat:
        if not hasattr(leaf, 'sharding'):
            continue
        if leaf.nbytes > max_replicated_bytes and \
                leaf.sharding.is_fully_replicated:
            offenders.append((jax.tree_util.keystr(path), leaf.shape,
                              leaf.nbytes))
    if offenders:
        raise AssertionError(
            f'{len(offenders)} leaves above {max_replicated_bytes} bytes are '
            f'fully replicated: {offenders[:5]}')
