"""Spatial sharding with halo exchange — scale ONE giant tile across chips.

The reference handles big scenes only by sequential sliding-window crops
(``ever/magic/bigimage/sliding_window.py``; SURVEY.md §5.7 notes spatial
sharding as the genuinely new TPU capability).  Here a single oversized tile
is sharded along H across the mesh; each chip computes its strip plus a halo
margin wide enough to cover the network's receptive-field overlap, exchanged
with neighbors over ICI via ``lax.ppermute`` inside ``shard_map``.

This is the convolutional analog of sequence/context parallelism: exact for
any local (conv/pool) network when ``halo >= receptive_field // 2``.  Two
boundary modes:

- ``boundary='exact'`` (default): border strips extend INWARD — strip 0
  reads ``2*halo`` real rows from its successor instead of zero-padding
  upward, so ``fn``'s own nested SAME padding applies at the true image
  border and the result equals the unsharded forward EVERYWHERE.
- ``boundary='zeros'``: classic zero halo at the true border — half the
  neighbor traffic, but within ``receptive_field // 2`` rows of the image
  border the zero halo differs from nested conv SAME padding once bias/ReLU
  make padding rows nonzero.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['halo_exchange', 'halo_exchange_exact', 'spatial_partition_apply']


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad a [N, H_local, W, C] strip with ``halo`` rows from each neighbor.

    Boundary strips get zero padding (same semantics as conv SAME padding at
    the true image border).  Must run inside ``shard_map`` over ``axis_name``.
    """
    if halo == 0:
        # `x[:, -0:]` below would slice the WHOLE strip, not zero rows
        return x
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


def halo_exchange_exact(x: jnp.ndarray, halo: int, axis_name: str):
    """Overlap-strip halo: border strips extend inward with REAL rows so the
    true image border stays ``fn``'s own input edge.

    Returns ``(padded, crop_start)``: every strip is ``h_local + 2*halo``
    rows; ``crop_start`` is where its exact ``h_local``-row output window
    begins (0 for the first strip, ``2*halo`` for the last, ``halo``
    otherwise).  Requires ``2 * halo <= h_local``.
    """
    k = jax.lax.axis_size(axis_name)
    if k == 1 or halo == 0:
        # single strip IS the whole image (no halo, no wrap — the ring
        # ppermute below would feed the strip its own rows as a halo); and
        # halo == 0 would make `x[:, -0:]` slice the whole strip
        return x, 0
    idx = jax.lax.axis_index(axis_name)
    top2 = x[:, :2 * halo]
    bot2 = x[:, -2 * halo:]
    from_prev = jax.lax.ppermute(bot2, axis_name,
                                 [(i, (i + 1) % k) for i in range(k)])
    from_next = jax.lax.ppermute(top2, axis_name,
                                 [(i, (i - 1) % k) for i in range(k)])
    first = jnp.concatenate([x, from_next], axis=1)
    last = jnp.concatenate([from_prev, x], axis=1)
    mid = jnp.concatenate([from_prev[:, -halo:], x, from_next[:, :halo]],
                          axis=1)
    padded = jnp.where(idx == 0, first, jnp.where(idx == k - 1, last, mid))
    crop_start = jnp.where(idx == 0, 0, jnp.where(idx == k - 1, 2 * halo, halo))
    return padded, crop_start


def spatial_partition_apply(fn: Callable, x: jnp.ndarray, mesh: Mesh,
                            axis: str = 'data', halo: int = 64,
                            boundary: str = 'exact') -> jnp.ndarray:
    """Run ``fn`` (a resolution-preserving NHWC network forward) on one big
    tile sharded along H across ``axis``.

    ``fn`` must map [N, h, W, C] → [N, h, W, C'] (e.g. a jit-able seg model
    forward at output stride 1 after upsampling).  ``halo`` must cover half
    the receptive field and be a multiple of the network's size divisor.
    ``boundary``: 'exact' (default — bit-equal to the unsharded forward
    everywhere, needs ``2*halo <= H/k``) or 'zeros' (cheaper halo, border
    rows approximate; see module docstring).  Returns the full-resolution
    output, sharded along H.
    """
    k = mesh.shape[axis]
    n, h, w, c = x.shape
    if h % k != 0:
        raise ValueError(f'the {axis!r} axis size {k} must divide H={h}; '
                         f'pad the tile height to a multiple of {k}')
    if boundary not in ('exact', 'zeros'):
        raise ValueError(f"boundary must be 'exact' or 'zeros', got {boundary!r}")
    if halo < 0:
        raise ValueError(f'halo must be >= 0, got {halo}')
    if boundary == 'exact' and 2 * halo > h // k:
        raise ValueError(f"boundary='exact' needs 2*halo <= H/k "
                         f'({2 * halo} > {h // k}); lower halo or use '
                         f"boundary='zeros'")
    if boundary == 'zeros' and halo > h // k:
        raise ValueError(f"halo={halo} exceeds the per-device strip height "
                         f'H/k = {h // k}; lower halo or use fewer devices')

    def local_zeros(x_local):
        if halo == 0:
            return fn(x_local)
        padded = halo_exchange(x_local, halo, axis)
        y = fn(padded)
        return y[:, halo:y.shape[1] - halo]

    def local_exact(x_local):
        if halo == 0:
            return fn(x_local)
        padded, crop_start = halo_exchange_exact(x_local, halo, axis)
        y = fn(padded)
        return jax.lax.dynamic_slice_in_dim(y, crop_start, h // k, axis=1)

    sharded = shard_map(local_exact if boundary == 'exact' else local_zeros,
                        mesh=mesh,
                        in_specs=P(None, axis, None, None),
                        out_specs=P(None, axis, None, None))
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
    return sharded(x)
