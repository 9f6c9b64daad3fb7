"""Device mesh + sharding helpers (the TPU replacement for DDP/NCCL wiring).

The reference's distributed substrate is per-GPU processes + NCCL
(``ever/trainer/th_ddp_trainer.py:13-17``, ``ever/core/dist.py:34-39``).  On
TPU the whole pod is one SPMD program: a single :class:`jax.sharding.Mesh`
over all chips, params replicated (or sharded) via ``NamedSharding``, and XLA
inserting collectives over ICI (SURVEY.md §5.8, §7 step 5).

Axis conventions:
- ``'data'``  — batch (data parallelism; replaces DDP)
- ``'model'`` — optional model axis (tensor-parallel dense layers in ViT
  heads, spatial sharding for very large tiles)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'make_hybrid_mesh', 'replicated', 'batch_sharding',
           'host_to_global', 'Mesh', 'NamedSharding', 'P']


def make_mesh(axes: Sequence[str] = ('data',),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over all (or the given) devices.

    ``shape`` defaults to all devices on the first axis; for 2-D meshes pass
    e.g. ``axes=('data', 'model'), shape=(4, 2)``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f'mesh shape {shape} does not cover {n} devices')
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def make_hybrid_mesh(ici_axes: Sequence[str] = ('data',),
                     ici_shape: Optional[Sequence[int]] = None,
                     dcn_axis: str = 'replica') -> Mesh:
    """Mesh for multi-slice pods: ``dcn_axis`` spans slices (DCN), the
    remaining axes live within a slice (ICI).

    Lay out shardings so the heavy collectives (gradient psum within a
    replica group, tp/pp hops) ride ICI and only the cross-replica gradient
    reduction crosses DCN.  Uses ``mesh_utils.create_hybrid_device_mesh``
    when more than one slice is attached; degrades to :func:`make_mesh`
    (dcn axis of size 1) on a single slice or CPU so code is portable from
    dev boxes to pods.
    """
    devices = jax.devices()
    num_slices = len({getattr(d, 'slice_index', 0) for d in devices})
    if ici_shape is None:
        per_slice = len(devices) // num_slices
        ici_shape = [per_slice] + [1] * (len(ici_axes) - 1)
    if num_slices == 1:
        return make_mesh((dcn_axis, *ici_axes), shape=(1, *ici_shape))
    from jax.experimental import mesh_utils
    dev_array = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=tuple(ici_shape), dcn_mesh_shape=(num_slices,) + (1,) * (len(ici_shape) - 1),
        devices=devices)
    # hybrid mesh comes back [dcn * ici_0, ici_1, ...]; lead with the dcn axis
    dev_array = dev_array.reshape((num_slices, *ici_shape))
    return Mesh(dev_array, (dcn_axis, *ici_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, *, accum_leading=False,
                   axis: str = 'data') -> NamedSharding:
    """Sharding for a batch pytree: batch dim on the ``data`` axis.

    ``accum_leading`` counts leading REPLICATED dims before the batch dim
    (``True`` == 1): the microbatch index under gradient accumulation, the
    steps-per-loop index under :func:`build_train_loop`, or both (``2``)
    when they compose (leaves are ``[K, forward_times, batch, ...]``).
    """
    spec = P(*([None] * int(accum_leading)), axis)
    return NamedSharding(mesh, spec)


def host_to_global(batch: Any, sharding: NamedSharding) -> Any:
    """Turn per-process host batches into global sharded ``jax.Array``s.

    Single-process: an async ``device_put`` with the target sharding.
    Multi-process: each process contributes its local shard
    (``total_batch_size // process_count`` rows, parity with
    ``ever/interface/dataloader.py:61-67``).
    """
    # find the first sharded dim (accum-leading specs are P(None, 'data'):
    # dim 0 is the microbatch index, dim 1 the batch)
    shard_dim, n_shards = None, None
    for d, names in enumerate(sharding.spec):
        if names is not None:
            names = names if isinstance(names, tuple) else (names,)
            shard_dim = d
            n_shards = int(np.prod([sharding.mesh.shape[a] for a in names]))
            break
    if n_shards:
        for x in jax.tree.leaves(batch):
            dim = (np.shape(x)[shard_dim]
                   if np.ndim(x) > shard_dim else None)
            if dim is not None and dim * jax.process_count() % n_shards:
                raise ValueError(
                    f'global batch {dim * jax.process_count()} is not '
                    f'divisible by the {n_shards}-way batch sharding '
                    f'({sharding.spec}); raise total_batch_size to a '
                    f'multiple of the device count (reference semantics: '
                    f'ever/interface/dataloader.py:61-67)')
    def _already_global(x):
        return isinstance(x, jax.Array) and x.sharding == sharding

    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)   # no-op for matching arrays
    return jax.tree.map(
        # a prefetched batch is already a global array: np.asarray on it
        # would be a blocking device->host fetch per step
        lambda x: x if _already_global(x)
        else jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch)
