"""Spatial sharding with halo exchange — scale ONE giant tile across chips.

The reference handles big scenes only by sequential sliding-window crops
(``ever/magic/bigimage/sliding_window.py``; SURVEY.md §5.7 notes spatial
sharding as the genuinely new TPU capability).  Here a single oversized tile
is sharded along H across the mesh; each chip computes its strip plus a halo
margin wide enough to cover the network's receptive-field overlap, exchanged
with neighbors over ICI via ``lax.ppermute`` inside ``shard_map``.

This is the convolutional analog of sequence/context parallelism: exact for
any local (conv/pool) network when ``halo >= receptive_field // 2``, except
within ``receptive_field // 2`` rows of the TRUE image border — there the
explicit zero halo differs from nested conv SAME padding once bias/ReLU make
padding rows nonzero.  Remote-sensing pipelines handle scene borders with
tile overlap anyway (inward-shifted sliding windows); for bit-exact borders,
crop ``receptive_field // 2`` rows or overlap strips.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['halo_exchange', 'spatial_partition_apply']


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad a [N, H_local, W, C] strip with ``halo`` rows from each neighbor.

    Boundary strips get zero padding (same semantics as conv SAME padding at
    the true image border).  Must run inside ``shard_map`` over ``axis_name``.
    """
    k = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:, :halo]
    bottom = x[:, -halo:]
    # bottom of strip i → top halo of strip i+1; top of i → bottom halo of i-1
    from_prev = jax.lax.ppermute(bottom, axis_name,
                                 [(i, (i + 1) % k) for i in range(k)])
    from_next = jax.lax.ppermute(top, axis_name,
                                 [(i, (i - 1) % k) for i in range(k)])
    zeros = jnp.zeros_like(top)
    from_prev = jnp.where(idx == 0, zeros, from_prev)
    from_next = jnp.where(idx == k - 1, zeros, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def spatial_partition_apply(fn: Callable, x: jnp.ndarray, mesh: Mesh,
                            axis: str = 'data', halo: int = 64) -> jnp.ndarray:
    """Run ``fn`` (a resolution-preserving NHWC network forward) on one big
    tile sharded along H across ``axis``.

    ``fn`` must map [N, h, W, C] → [N, h, W, C'] (e.g. a jit-able seg model
    forward at output stride 1 after upsampling).  ``halo`` must cover half
    the receptive field and be a multiple of the network's size divisor.
    Returns the full-resolution output, sharded along H.
    """
    k = mesh.shape[axis]
    n, h, w, c = x.shape
    if h % k != 0:
        raise ValueError(f'H={h} must divide the {axis!r} axis size {k}')

    def local(x_local):
        padded = halo_exchange(x_local, halo, axis)
        y = fn(padded)
        return y[:, halo:-halo]

    sharded = shard_map(local, mesh=mesh,
                        in_specs=P(None, axis, None, None),
                        out_specs=P(None, axis, None, None))
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
    return sharded(x)
