"""GAN training: dual-optimizer SPMD steps.

Parity target: ``ever/trainer/th_ddp_trainer.py:43-90`` (``THDDPGANTrainer`` +
``GANLauncher``) and the dict-of-optimizers plumbing threaded through the
reference (``trainer/trainer.py:97-117``, ``core/launcher.py:76,155-158``).

Contract: a GAN ``ERModule`` defines two param subtrees named ``G`` and ``D``
(submodules) and two methods:

- ``d_loss(batch, train)`` → loss dict (grads flow to ``params['D']``)
- ``g_loss(batch, train)`` → loss dict (grads flow to ``params['G']``)

The jitted step runs D-update then G-update (the reference's
``forward_backward`` per-optimizer loop, ``th_ddp_trainer.py:44-47``) in ONE
compiled program.  Config surface: ``learning_rate`` / ``optimizer`` may be
dicts keyed ``{'G': ..., 'D': ...}`` or a single shared config.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ever_tpu.core import builder
from ever_tpu.core.config import AttrDict
from ever_tpu.core.launcher import Launcher
from ever_tpu.interface.module import sum_losses
from ever_tpu.parallel.mesh import batch_sharding, replicated
from ever_tpu.trainer.trainer import SPMDTrainer

__all__ = ['GANState', 'create_gan_state', 'build_gan_train_step',
           'GANLauncher', 'GANSPMDTrainer']


class GANState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any               # {'G': ..., 'D': ..., (shared...)}
    batch_stats: Any
    opt_state: Dict[str, Any]  # {'G': ..., 'D': ...}


def create_gan_state(model, txs: Dict[str, optax.GradientTransformation],
                     sample_batch, rng=None) -> GANState:
    """Initialise a dual-optimizer state from one sample batch (the batch is
    passed WHOLE per the GAN contract; init traces ``d_loss``, which touches
    both G and D)."""
    if rng is None:
        rng = jax.random.key(0)
    variables = model.init({'params': rng, 'dropout': jax.random.key(1)},
                           sample_batch, train=True,
                           method=getattr(model, 'd_loss'))
    params = variables['params']
    return GANState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state={role: tx.init(params[role]) for role, tx in txs.items()})


def build_gan_train_step(model, txs: Dict[str, optax.GradientTransformation],
                         lr_schedules=None, mesh=None, rng_seed: int = 0,
                         donate: bool = True) -> Callable:
    base_rng = jax.random.key(rng_seed)

    def apply_loss(params, batch_stats, batch, rng, method_name):
        variables = {'params': params}
        mutable = []
        if batch_stats:
            variables['batch_stats'] = batch_stats
            mutable = ['batch_stats']
        # GAN contract: d_loss/g_loss take the batch whole (parity with the
        # reference's model.forward_backward(data, ...), th_ddp_trainer.py:44-47)
        if mutable:
            loss_dict, mut = model.apply(variables, batch, train=True,
                                         method=getattr(model, method_name),
                                         mutable=mutable, rngs={'dropout': rng})
            new_bs = mut.get('batch_stats', batch_stats)
        else:
            loss_dict = model.apply(variables, batch, train=True,
                                    method=getattr(model, method_name),
                                    rngs={'dropout': rng})
            new_bs = batch_stats
        return sum_losses(loss_dict), (loss_dict, new_bs)

    def step_fn(state: GANState, batch) -> Tuple[GANState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(base_rng, state.step)
        metrics = {}
        params = dict(state.params)
        batch_stats = state.batch_stats
        opt_state = dict(state.opt_state)

        for role, method in (('D', 'd_loss'), ('G', 'g_loss')):
            def loss_wrt_role(role_params, params=params, role=role, method=method):
                merged = dict(params)
                merged[role] = role_params
                return apply_loss(merged, batch_stats, batch,
                                  jax.random.fold_in(rng, ord(role)), method)

            (_, (loss_dict, batch_stats)), grads = jax.value_and_grad(
                loss_wrt_role, has_aux=True)(params[role])
            metrics.update({f'{role}_{k}': jnp.asarray(v, jnp.float32)
                            for k, v in loss_dict.items()})
            updates, opt_state[role] = txs[role].update(
                grads, opt_state[role], params[role])
            params[role] = optax.apply_updates(params[role], updates)
            from ever_tpu.opt.optimizer import find_recorded_grad_norm
            gn = find_recorded_grad_norm(opt_state[role])
            if gn is not None:
                metrics[f'{role.lower()}_grad_norm'] = gn

        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats, opt_state=opt_state)
        if lr_schedules:
            for role, sched in lr_schedules.items():
                metrics[f'{role.lower()}_lr'] = jnp.asarray(
                    sched(state.step), jnp.float32)
        return new_state, metrics

    if mesh is not None:
        state_sh = replicated(mesh)
        return jax.jit(step_fn,
                       in_shardings=(state_sh, batch_sharding(mesh)),
                       out_shardings=(state_sh, state_sh),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


class GANLauncher(Launcher):
    """Launcher with dict-of-optimizers state (parity: ``GANLauncher``,
    ``th_ddp_trainer.py:43-47``)."""

    def __init__(self, *args, optimizers: Dict[str, Any] = None,
                 lr_schedules: Dict[str, Any] = None, **kwargs):
        super().__init__(*args, optimizer=None, lr_schedule=None, **kwargs)
        self._txs = optimizers
        self._schedules = lr_schedules or {}

    @property
    def optimizer(self):
        return self._txs

    @property
    def lr(self) -> float:
        if 'G' in self._schedules:
            return float(self._schedules['G'](self.global_step))
        return 0.0

    def init_state(self, sample_batch) -> None:
        if self._state is not None:
            return
        # the GAN contract passes the batch WHOLE to d_loss/g_loss; unwrap
        # the 1-tuple the generic Trainer.evaluate wraps non-tuple batches
        # in for the base create_train_state's *args contract
        if isinstance(sample_batch, (tuple, list)) and len(sample_batch) == 1:
            sample_batch = sample_batch[0]
        rng = jax.random.key(self._seed)
        variables = self._model.init({'params': rng, 'dropout': jax.random.key(1)},
                                     sample_batch, train=True,
                                     method=getattr(self._model, 'd_loss'))
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        if self._init_params is not None:
            params = self._init_params
        if self._init_batch_stats is not None:
            batch_stats = self._init_batch_stats
        opt_state = {role: tx.init(params[role]) for role, tx in self._txs.items()}
        state = GANState(step=jnp.zeros((), jnp.int32), params=params,
                         batch_stats=batch_stats, opt_state=opt_state)
        if self._mesh is not None:
            state = jax.device_put(state, replicated(self._mesh))
        self._state = state

    def _ensure_train_step(self, forward_times: int) -> None:
        if forward_times != 1:
            raise NotImplementedError('GAN training does not support '
                                      'gradient accumulation yet')
        if self._train_step is None:
            self._train_step = build_gan_train_step(
                self._model, self._txs, self._schedules, mesh=self._mesh,
                rng_seed=self._seed)

    def _train_loop_k(self, *args, **kwargs):
        raise NotImplementedError(
            'GAN training does not support train.steps_per_loop > 1 yet — '
            'the K-step loop would build a non-GAN step over the dict-of-'
            'optimizers state; set steps_per_loop=1')


class GANSPMDTrainer(SPMDTrainer):
    """Builds the dual-optimizer launcher from ``{'G':…, 'D':…}`` configs
    (parity: ``trainer/trainer.py:97-117`` dict-of-(lr, opt))."""

    def _per_role_cfg(self, cfg) -> Dict[str, AttrDict]:
        if 'G' in cfg and 'D' in cfg:
            return {r: cfg[r] for r in ('G', 'D')}
        return {'G': cfg, 'D': cfg}

    def build_launcher(self):
        model = self.make_model()
        lr_cfgs = self._per_role_cfg(self._config.learning_rate)
        opt_cfgs = self._per_role_cfg(self._config.optimizer)
        schedules, txs = {}, {}
        for role in ('G', 'D'):
            schedules[role] = builder.make_learningrate(lr_cfgs[role])
            factory, opt_cfg = builder.make_optimizer(opt_cfgs[role])
            txs[role] = factory.build(schedules[role],
                                      grad_clip=opt_cfg.get('grad_clip'))
        from ever_tpu.core.logger import Logger
        logger = Logger(
            'ever_tpu', tensorboard_logdir=self._model_dir,
            use_tensorboard=getattr(self.args, 'use_tensorboard', False),
            use_wandb=getattr(self.args, 'use_wandb', False),
            wandb_config=dict(project=getattr(self.args, 'project', None),
                              entity=getattr(self.args, 'entity', None),
                              config=self._config.to_dict())
            if getattr(self.args, 'use_wandb', False) else None)
        self._launcher = GANLauncher(
            model_dir=self._model_dir,
            model=model,
            optimizers=txs,
            lr_schedules=schedules,
            mixed_precision=getattr(self.args, 'mixed_precision', 'fp32'),
            mesh=self.make_mesh(),
            logger=logger,
            seed=int(self._config.get('seed', 42)),
            checkpoint_backend=self._config.get('checkpoint_backend',
                                                'msgpack'),
        )
        return self._launcher
