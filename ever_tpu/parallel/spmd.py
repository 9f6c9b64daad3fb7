"""SPMD train/eval step builders — the jitted heart of the framework.

This replaces the reference hot loop's device work
(``ever/core/launcher.py:300-362``: autocast forward → backward → DDP
all-reduce → unscale → clip → step → zero_grad → loss reduce) with ONE
compiled XLA program per step:

- forward+backward fused under ``jax.value_and_grad``;
- gradient accumulation (``forward_times``) as a ``lax.scan`` over
  microbatches carrying (batch_stats, grad-sum, metric-sum) — parity with
  ``launcher.py:316-322`` / ``iterator.py:64-73`` without storing per-micro
  gradients;
- the cross-device gradient mean is *implicit*: with the batch sharded on the
  ``data`` mesh axis and params replicated, XLA inserts the psum over ICI
  (no DDP bucketing);
- loss "reduce_loss_dict" (``core/dist.py:118-140``) is free: metrics are
  scalars of globally-reduced sums already;
- grad-clip + optimizer update are the optax chain (built in
  ``ever_tpu/opt/optimizer.py``); ``grad_norm`` is reported like the
  reference's ``clip_grad`` return (``interface/module.py:96-108``);
- bf16: model computes in bf16 (module dtype), params/optimizer fp32,
  losses fp32 — no GradScaler (SURVEY.md §5.9).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ever_tpu.interface.module import sum_losses
from ever_tpu.parallel.mesh import batch_sharding, replicated

__all__ = ['TrainState', 'create_train_state', 'build_train_step',
           'build_train_loop', 'build_eval_step']


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def _model_args(batch):
    if isinstance(batch, (tuple, list)):
        return tuple(batch)
    return (batch,)


def create_train_state(model, tx, sample_batch, rng=None,
                       init_params=None, init_batch_stats=None) -> TrainState:
    """Initialise params/batch_stats from a sample batch and wrap with the
    optimizer state.  ``init_params``/``init_batch_stats`` override the random
    init (pretrained weights)."""
    if rng is None:
        rng = jax.random.key(0)
    variables = model.init({'params': rng, 'dropout': jax.random.key(1)},
                           *_model_args(sample_batch), train=True)
    params = init_params if init_params is not None else variables['params']
    batch_stats = (init_batch_stats if init_batch_stats is not None
                   else variables.get('batch_stats', {}))
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


def _forward_loss(model, params, batch_stats, batch, rng):
    variables = {'params': params}
    # 'losses' collects layer-sown auxiliary losses (e.g. MoEMlp's
    # load-balancing loss) that a bare return-tensor layer cannot put into
    # the model's loss dict itself
    mutable = ['losses']
    if batch_stats:
        variables['batch_stats'] = batch_stats
        mutable = ['batch_stats', 'losses']
    loss_dict, mut = model.apply(variables, *_model_args(batch), train=True,
                                 mutable=mutable, rngs={'dropout': rng})
    new_bs = mut.get('batch_stats', batch_stats)
    if not isinstance(loss_dict, dict):
        raise TypeError('training forward must return a dict of losses/metrics '
                        '(keys ending in "loss" are summed)')
    sown = mut.get('losses', None)
    if sown:
        loss_dict = dict(loss_dict)
        loss_dict['sown_aux_loss'] = sum(
            jnp.sum(v) for v in jax.tree.leaves(sown))
    total = sum_losses(loss_dict)
    metrics = {k: jnp.asarray(v, jnp.float32) for k, v in loss_dict.items()}
    metrics['total_loss'] = total
    return total, (metrics, new_bs)


def _make_step_fn(model, tx, lr_schedule: Optional[Callable],
                  forward_times: int, rng_seed: int) -> Callable:
    base_rng = jax.random.key(rng_seed)

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(base_rng, state.step)
        grad_fn = jax.value_and_grad(
            partial(_forward_loss, model), has_aux=True)

        if forward_times == 1:
            (_, (metrics, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng)
        else:
            # peel microbatch 0 to establish the metric/grad pytree structure,
            # then scan the rest carrying (batch_stats, grad-sum, metric-sum)
            mb0 = jax.tree.map(lambda x: x[0], batch)
            (_, (msum, bs)), gsum = grad_fn(
                state.params, state.batch_stats, mb0, jax.random.fold_in(rng, 0))

            def micro(carry, xs):
                bs, gsum, msum = carry
                i, mb = xs
                (_, (m, nbs)), g = grad_fn(
                    state.params, bs, mb, jax.random.fold_in(rng, i))
                gsum = jax.tree.map(jnp.add, gsum, g)
                msum = jax.tree.map(jnp.add, msum, m)
                return (nbs, gsum, msum), None

            rest = jax.tree.map(lambda x: x[1:], batch)
            idxs = jnp.arange(1, forward_times)
            (new_bs, gsum, msum), _ = jax.lax.scan(
                micro, (bs, gsum, msum), (idxs, rest))
            grads = jax.tree.map(lambda g: g / forward_times, gsum)
            metrics = jax.tree.map(lambda v: v / forward_times, msum)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        metrics = dict(metrics)
        # grad_norm comes from the recording clip transform — computing a
        # SECOND optax.global_norm over the grads doubles the step time on
        # TPU (XLA re-materialises the backward instead of reusing clip's)
        from ever_tpu.opt.optimizer import find_recorded_grad_norm
        grad_norm = find_recorded_grad_norm(new_opt)
        if grad_norm is not None:
            metrics['grad_norm'] = grad_norm
        if lr_schedule is not None:
            metrics['learning_rate'] = jnp.asarray(lr_schedule(state.step), jnp.float32)
        return new_state, metrics

    return step_fn


def _jit_with_shardings(fn, mesh, forward_times: int, donate: bool,
                        extra_leading: bool = False, state_shardings=None,
                        batch_axis='data'):
    if state_shardings is not None and mesh is None:
        # silently dropping explicit shardings replicates the state — the
        # exact memory blow-up ZeRO was configured to avoid, surfacing only
        # as an HBM OOM much later
        raise ValueError('state_shardings requires mesh= (they are '
                         'NamedShardings over a mesh)')
    if mesh is not None:
        state_sh = state_shardings if state_shardings is not None \
            else replicated(mesh)
        batch_sh = batch_sharding(
            mesh,
            accum_leading=int(extra_leading) + int(forward_times > 1),
            axis=batch_axis)
        # metrics out: replicated scalars
        metrics_sh = replicated(mesh)
        return jax.jit(fn, in_shardings=(state_sh, batch_sh),
                       out_shardings=(state_sh, metrics_sh),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def build_train_step(model, tx, lr_schedule: Optional[Callable] = None,
                     forward_times: int = 1, mesh=None,
                     rng_seed: int = 0, donate: bool = True,
                     state_shardings=None, batch_axis='data') -> Callable:
    """Build the jitted ``(state, batch) -> (state, metrics)`` function.

    ``batch`` is a pytree whose leaves have leading dim ``forward_times``
    (microbatch axis) when ``forward_times > 1``, else plain batch leaves.
    With ``mesh``, state is replicated and the batch dim sharded on 'data';
    pass ``state_shardings`` (e.g. from
    :func:`ever_tpu.parallel.zero.zero_init`) to shard optimizer state /
    params ZeRO-style instead.  ``batch_axis`` may be a mesh-axis tuple
    (e.g. ``('data', 'model')``) to split the batch over several axes
    jointly — the fsdp-style layout on hybrid ICI×DCN meshes.
    """
    step_fn = _make_step_fn(model, tx, lr_schedule, forward_times, rng_seed)
    return _jit_with_shardings(step_fn, mesh, forward_times, donate,
                               state_shardings=state_shardings,
                               batch_axis=batch_axis)


def build_train_loop(model, tx, lr_schedule: Optional[Callable] = None,
                     steps_per_loop: int = 1, forward_times: int = 1,
                     mesh=None, rng_seed: int = 0,
                     donate: bool = True, state_shardings=None,
                     unroll: int = 1) -> Callable:
    """K optimizer steps per dispatch: ``(state, batches) -> (state, metrics)``.

    ``batches`` is a pytree whose leaves carry a leading ``steps_per_loop``
    axis of per-step batches (host stages K batches, the device scans K full
    train steps).  With ``forward_times > 1`` each per-step batch itself
    carries a microbatch axis, so leaves are
    ``[steps_per_loop, forward_times, batch, ...]`` and the compiled program
    is a scan (over K optimizer steps) of scans (over microbatch
    forward/backwards) — the grad-accum trajectory is bit-identical to K
    separate :func:`build_train_step` dispatches (tested in
    ``tests/test_train_e2e.py``).  Metrics are averaged over the K steps,
    except ``learning_rate``/``grad_norm`` which report the last step.

    Amortizes per-dispatch host latency — the standard TPU "steps per loop"
    pattern (the reference dispatches one CUDA graph per step,
    ``launcher.py:300-362``; on TPU pods one XLA program per K steps keeps
    the device saturated when host→device dispatch is slow).
    """
    step_fn = _make_step_fn(model, tx, lr_schedule, forward_times, rng_seed)

    def loop_fn(state: TrainState, batches):
        state, ms = jax.lax.scan(step_fn, state, batches, unroll=unroll)
        metrics = {k: (v[-1] if k in ('learning_rate', 'grad_norm')
                       else jnp.mean(v)) for k, v in ms.items()}
        return state, metrics

    # extra_leading honors the documented contract even at steps_per_loop=1
    # (leaves carry a leading K axis) — the bare step sharding would try to
    # shard the size-1 axis over 'data'
    return _jit_with_shardings(loop_fn, mesh, forward_times, donate,
                               extra_leading=True,
                               state_shardings=state_shardings)


def build_eval_step(model, mesh=None) -> Callable:
    """Jitted inference step: ``(state, batch) -> model output`` (eval mode)."""

    def eval_fn(state: TrainState, batch):
        variables = {'params': state.params}
        if state.batch_stats:
            variables['batch_stats'] = state.batch_stats
        return model.apply(variables, *_model_args(batch), train=False)

    if mesh is not None:
        state_sh = replicated(mesh)
        batch_sh = batch_sharding(mesh)
        return jax.jit(eval_fn, in_shardings=(state_sh, batch_sh),
                       out_shardings=batch_sh)
    return jax.jit(eval_fn)
