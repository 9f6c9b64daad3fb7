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

__all__ = ['halo_exchange', 'halo_exchange_exact', 'spatial_partition_apply',
           'spatial_batch_sharding', 'build_spatial_train_step',
           'build_halo_train_step']


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
    if not isinstance(x, jax.core.Tracer):
        # concrete input: lay it out H-sharded up front; under jit/grad the
        # tracer already carries (or will be given) a sharding and a
        # device_put here would be invalid
        x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
    return sharded(x)


# ---------------------------------------------------------------------------
# Spatially-sharded TRAINING — gradients through the halo exchange.
#
# Transcends the reference's only big-image training mechanism (activation
# checkpointing + sequential crops, ``ever/module/resnet.py:189-208`` with_cp
# + ``ever/magic/bigimage/sliding_window.py:8-33``): here one tile too large
# for a single chip's HBM trains as ONE optimizer step sharded over the mesh.
#
# Two complementary paths:
#
# - :func:`build_spatial_train_step` (default, exact): the standard train
#   step jitted with the batch H-sharded (``P(None, axis, ...)``).  GSPMD
#   partitions the convs spatially (windowed-dim halo exchanges are inserted
#   by the SPMD partitioner) and every cross-strip reduction — BatchNorm
#   statistics over (N, H, W), the loss mean, the gradient psum — is
#   compiler-inserted and GLOBAL, so the step is semantically identical to
#   the unsharded program: same BN stat updates, same loss, same grads.
# - :func:`build_halo_train_step`: the explicit ``shard_map`` halo-exchange
#   variant for frozen-BN / eval-mode forwards (the usual giant-tile
#   fine-tune), where comm is exactly two ``ppermute`` hops per step and the
#   backward reuses them in reverse (``ppermute`` is its own transpose with
#   the permutation inverted; the crop's transpose scatters the cotangent
#   back into the strip window, so boundary bookkeeping reverses for free).
# ---------------------------------------------------------------------------


def spatial_batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Sharding for an (image, label, ...) batch pytree with the HEIGHT dim
    (dim 1) on ``axis``.  The ``P(None, axis)`` spec is a prefix — trailing
    dims of any rank>=2 leaf stay unsharded, so one sharding broadcasts over
    [N,H,W,C] images and [N,H,...] labels alike."""
    return NamedSharding(mesh, P(None, axis))


def build_spatial_train_step(model, tx, lr_schedule=None, mesh: Mesh = None,
                             axis: str = 'data', rng_seed: int = 0,
                             donate: bool = True) -> Callable:
    """Jitted ``(state, batch) -> (state, metrics)`` training on tiles
    H-sharded over ``axis`` (batch may be a single giant tile).

    Exactness: this is the SAME step program as
    :func:`ever_tpu.parallel.spmd.build_train_step` under a different input
    sharding, so GSPMD inserts the spatial conv halos and globalizes BN
    stats / loss / grad reductions — results match the unsharded step to
    float-reassociation tolerance (tested, ``tests/test_spatial_train.py``).

    The batch pytree must be shaped like a normal training batch
    ``(x [N,H,W,C], y [N,H,...])``; H must be divisible by
    ``mesh.shape[axis]``.
    """
    from ever_tpu.parallel.mesh import replicated
    from ever_tpu.parallel.spmd import _make_step_fn

    if mesh is None:
        raise ValueError('build_spatial_train_step requires mesh=')
    step_fn = _make_step_fn(model, tx, lr_schedule, 1, rng_seed)
    k = mesh.shape[axis]

    jitted = jax.jit(step_fn,
                     in_shardings=(replicated(mesh), spatial_batch_sharding(mesh, axis)),
                     out_shardings=(replicated(mesh), replicated(mesh)),
                     donate_argnums=(0,) if donate else ())

    def step(state, batch):
        # spatial_batch_sharding's P(None, axis) shards dim 1 of EVERY
        # rank>=2 leaf (and cannot place rank<2 leaves at all) — guard all
        # of them, not just images, so the friendly error fires instead of
        # a GSPMD placement error deep inside jit
        for leaf in jax.tree.leaves(batch):
            if not hasattr(leaf, 'ndim'):
                continue
            if leaf.ndim < 2:
                raise ValueError(
                    f'spatial train batch leaves must be rank>=2 '
                    f'([N, H, ...]); got a rank-{leaf.ndim} leaf — reshape '
                    f'or replicate it outside the batch pytree')
            if leaf.shape[1] % k:
                raise ValueError(
                    f'tile height {leaf.shape[1]} is not divisible by the '
                    f'{axis!r} axis size {k}; pad the tile')
        return jitted(state, batch)

    return step


def build_halo_train_step(forward: Callable, loss_fn: Callable, tx,
                          mesh: Mesh, axis: str = 'data', halo: int = 64,
                          boundary: str = 'exact',
                          lr_schedule=None) -> Callable:
    """Explicit halo-exchange training step for frozen-BN dense forwards.

    ``forward(params, x) -> logits`` must be a resolution-preserving
    eval-mode NHWC forward (frozen BN, no dropout — the standard giant-tile
    fine-tune regime); ``loss_fn(logits, y) -> scalar`` a mean over local
    pixels.  Each step: halo-exchange the input strips (two ``ppermute``
    hops), run ``forward`` per strip, crop back to the owned window, take
    ``pmean`` of per-strip losses (equal strips → the global pixel mean),
    and differentiate — the cotangents ride the same ``ppermute`` pair in
    reverse and the replicated-params cotangent is psum'd by ``shard_map``'s
    transpose, so parameter gradients equal the unsharded step's.

    Returns jitted ``(opt_pack, batch) -> (opt_pack, metrics)`` where
    ``opt_pack = (step, params, opt_state)``.
    """
    if boundary not in ('exact', 'zeros'):
        raise ValueError(f"boundary must be 'exact' or 'zeros', got {boundary!r}")
    from ever_tpu.parallel.mesh import replicated
    import optax

    k = mesh.shape[axis]

    def local_loss(params, x_local, y_local):
        h_local = x_local.shape[1]
        if boundary == 'exact' and halo > 0 and 2 * halo > h_local:
            raise ValueError(
                f"boundary='exact' needs 2*halo <= H/k ({2 * halo} > "
                f'{h_local}); lower halo or use boundary=\'zeros\'')
        if halo == 0 or k == 1:
            out = forward(params, x_local)
        elif boundary == 'exact':
            padded, crop_start = halo_exchange_exact(x_local, halo, axis)
            y_full = forward(params, padded)
            out = jax.lax.dynamic_slice_in_dim(y_full, crop_start, h_local,
                                               axis=1)
        else:
            padded = halo_exchange(x_local, halo, axis)
            y_full = forward(params, padded)
            out = y_full[:, halo:y_full.shape[1] - halo]
        return jax.lax.pmean(loss_fn(out, y_local), axis)

    def global_loss(params, x, y):
        return shard_map(local_loss,
                         mesh=mesh,
                         in_specs=(P(), P(None, axis, None, None),
                                   P(None, axis, None)),
                         out_specs=P())(params, x, y)

    def step(opt_pack, batch):
        it, params, opt_state = opt_pack
        x, y = batch
        loss, grads = jax.value_and_grad(global_loss)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {'total_loss': jnp.asarray(loss, jnp.float32)}
        if lr_schedule is not None:
            metrics['learning_rate'] = jnp.asarray(lr_schedule(it), jnp.float32)
        return (it + 1, params, opt_state), metrics

    batch_sh = spatial_batch_sharding(mesh, axis)
    return jax.jit(step,
                   in_shardings=(replicated(mesh), batch_sh),
                   out_shardings=(replicated(mesh), replicated(mesh)))
